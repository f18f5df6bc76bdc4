"""MySQL DDL text → schema-registry operations.

Reference: the physical DDL stream drives table metadata through
``TableMetaTSDB.apply(position, ddl)`` (polardbx-cdc-canal/.../ddl/tsdb/
TableMetaTSDB.java:28-58, in-memory impl MemoryTableMeta.java) after
QueryEventReformator rewrites physical DDL to logical form
(polardbx-cdc-task/.../reformat/QueryEventReformator.java) and DDLConverter
normalizes it (.../rebuild/DDLConverter.java — notably dropping the
implicit primary key ``_drds_implicit_id_``).

The reference embeds a full SQL parser (druid); here a small recognizer
covers the DDL grammar the CDC pipeline actually routes through the
registry: CREATE TABLE, ALTER TABLE ADD/DROP/MODIFY/CHANGE/RENAME COLUMN,
RENAME TABLE, TRUNCATE, DROP TABLE. Identifiers are unquoted + lowercased
(MemoryTableMeta lowercases); everything runs on the driver (DDL is a
serialized stream barrier — LogFileGenerator.writeMetaDdl:411), so parse
cost is irrelevant at any data scale.
"""

from __future__ import annotations

import re

#: the auto-generated implicit PK PolarDB-X adds to tables without one —
#: dropped from logical images (DDLConverter hidden-PK handling)
IMPLICIT_PK = "_drds_implicit_id_"

_IDENT = r"`?([A-Za-z0-9_$]+)`?"
_QUALIFIED = rf"(?:{_IDENT}\s*\.\s*)?{_IDENT}"


def _ident(s: str) -> str:
    return s.strip().strip("`").lower()


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses (column def list)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


_COL_DEF = re.compile(rf"^{_IDENT}\s+([A-Za-z]+(?:\s*\([^)]*\))?(?:\s+UNSIGNED)?(?:\s+ZEROFILL)?)", re.I)
_PK_INLINE = re.compile(r"\bPRIMARY\s+KEY\b", re.I)
_PK_CONSTRAINT = re.compile(r"^(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)", re.I)
_KEY_DEF = re.compile(r"^(?:UNIQUE\s+)?(?:KEY|INDEX|CONSTRAINT|FULLTEXT|FOREIGN)\b", re.I)

#: ALTER actions that change indexes/constraints, not the visible column
#: set — the reference models these as CINDEX/DINDEX actions
#: (polardbx-cdc-canal/.../dbms/DBMSAction.java:23-27) and its druid-backed
#: MemoryTableMeta digests them without touching column metadata. They MUST
#: be recognized before the ADD/DROP-COLUMN regexes, which would otherwise
#: misread ``ADD INDEX idx (c)`` as adding a column named ``index``.
#: PolarDB-X variants (GLOBAL/CLUSTERED/LOCAL secondary indexes) included.
_INDEX_ACTION = re.compile(
    r"^(?:"
    r"ADD\s+(?:CONSTRAINT(?:\s+`?[A-Za-z0-9_$]+`?)?\s+)?"
    r"(?:UNIQUE(?:\s+(?:GLOBAL|CLUSTERED|LOCAL))?(?:\s+(?:INDEX|KEY))?\s*[(`A-Za-z0-9_$]"
    r"|PRIMARY\s+KEY|FOREIGN\s+KEY|CHECK\s*\("
    r"|(?:FULLTEXT|SPATIAL|GLOBAL|CLUSTERED|LOCAL)(?:\s+(?:INDEX|KEY))?\s"
    r"|(?:INDEX|KEY)\s)"
    r"|DROP\s+(?:PRIMARY\s+KEY|FOREIGN\s+KEY\s+\S+|(?:INDEX|KEY)\s+\S+"
    r"|CONSTRAINT\s+\S+|CHECK\s+\S+)"
    r"|RENAME\s+(?:INDEX|KEY)\s+\S+\s+TO\s+\S+"
    r"|ALTER\s+INDEX\s+\S+\s+(?:VISIBLE|INVISIBLE)"
    r")",
    re.I,
)

#: metadata-only ALTER actions (storage/table options, charset conversion,
#: per-column DEFAULT tweaks) — no effect on the visible column set either
_TABLE_OPTION_ACTION = re.compile(
    r"^(?:"
    r"(?:ALGORITHM|LOCK)\s*=?\s*\S+"
    r"|(?:DEFAULT\s+)?(?:CHARACTER\s+SET|CHARSET|COLLATE)\b"
    r"|CONVERT\s+TO\s+CHARACTER\s+SET\b"
    r"|(?:ENGINE|AUTO_INCREMENT|COMMENT|ROW_FORMAT|KEY_BLOCK_SIZE)\s*=?"
    r"|ALTER\s+(?:COLUMN\s+)?`?[A-Za-z0-9_$]+`?\s+(?:SET\s+DEFAULT|DROP\s+DEFAULT)"
    r"|(?:ENABLE|DISABLE)\s+KEYS"
    r"|FORCE$"
    r")",
    re.I,
)


def parse_ddl(sql: str, default_db: str | None = None) -> list[dict]:
    """Parse one DDL statement into registry ops:
    ``[{db, tbl, op, ...}, ...]`` (RENAME TABLE yields two ops). Raises
    ``ValueError`` for DDL outside the supported grammar — callers decide
    whether unknown DDL is skippable (the reference logs-and-continues for
    DDL that doesn't affect row decoding)."""
    s = sql.strip().rstrip(";").strip()

    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s*\((.*)\)\s*[^)]*$",
        s, re.I | re.S,
    )
    if m:
        db, tbl, body = m.group(1), _ident(m.group(2)), m.group(3)
        cols: list[str] = []
        types: list[str] = []
        pks: list[str] = []
        hidden: list[str] = []
        for element in _split_top_level(body):
            pk_c = _PK_CONSTRAINT.match(element)
            if pk_c:
                pks.extend(_ident(c) for c in pk_c.group(1).split(","))
                continue
            if _KEY_DEF.match(element):
                continue
            cd = _COL_DEF.match(element)
            if not cd:
                raise ValueError(f"unparsable column def: {element!r}")
            name, mysql_type = _ident(cd.group(1)), cd.group(2).strip()
            cols.append(name)
            types.append(mysql_type)
            if _PK_INLINE.search(element[cd.end():]):
                pks.append(name)
            if name == IMPLICIT_PK:
                hidden.append(name)
        return [{
            "db": _ident(db) if db else default_db,
            "tbl": tbl,
            "op": "create",
            "columns": cols,
            "types": types,
            "pks": list(dict.fromkeys(pks)),
            "hidden_pks": hidden,
        }]

    m = re.match(rf"ALTER\s+TABLE\s+{_QUALIFIED}\s+(.*)$", s, re.I | re.S)
    if m:
        db = _ident(m.group(1)) if m.group(1) else default_db
        tbl, actions = _ident(m.group(2)), m.group(3)
        ops = []
        for action in _split_top_level(actions):
            if _INDEX_ACTION.match(action) or _TABLE_OPTION_ACTION.match(action):
                # index/constraint/table-option DDL: registry no-op — the
                # visible column set is unchanged (CINDEX/DINDEX in the
                # reference; MemoryTableMeta keeps column metadata intact)
                ops.append({"db": db, "tbl": tbl, "op": "index", "action": action})
                continue
            a = re.match(rf"ADD\s+(?:COLUMN\s+)?{_IDENT}\s+(.+)$", action, re.I | re.S)
            if a:
                ops.append({
                    "db": db, "tbl": tbl, "op": "add_column",
                    "column": _ident(a.group(1)),
                    "mysql_type": re.sub(r"\s+(FIRST|AFTER\s+\S+)\s*$", "", a.group(2), flags=re.I).strip(),
                })
                continue
            a = re.match(rf"DROP\s+(?:COLUMN\s+)?{_IDENT}\s*$", action, re.I)
            if a:
                ops.append({"db": db, "tbl": tbl, "op": "drop_column", "column": _ident(a.group(1))})
                continue
            a = re.match(rf"CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.+)$", action, re.I | re.S)
            if a:
                ops.append({
                    "db": db, "tbl": tbl, "op": "rename_column",
                    "from": _ident(a.group(1)), "to": _ident(a.group(2)),
                    "mysql_type": a.group(3).strip(),
                })
                continue
            a = re.match(rf"RENAME\s+COLUMN\s+{_IDENT}\s+TO\s+{_IDENT}\s*$", action, re.I)
            if a:
                ops.append({
                    "db": db, "tbl": tbl, "op": "rename_column",
                    "from": _ident(a.group(1)), "to": _ident(a.group(2)),
                })
                continue
            a = re.match(rf"MODIFY\s+(?:COLUMN\s+)?{_IDENT}\s+(.+)$", action, re.I | re.S)
            if a:
                ops.append({
                    "db": db, "tbl": tbl, "op": "modify_column",
                    "column": _ident(a.group(1)), "mysql_type": a.group(2).strip(),
                })
                continue
            a = re.match(rf"RENAME\s+(?:TO\s+|AS\s+)?{_QUALIFIED}\s*$", action, re.I)
            if a:
                ops.append({
                    "db": db, "tbl": tbl, "op": "rename_table",
                    "to_db": _ident(a.group(1)) if a.group(1) else db,
                    "to_tbl": _ident(a.group(2)),
                })
                continue
            raise ValueError(f"unsupported ALTER action: {action!r}")
        return ops

    m = re.match(rf"RENAME\s+TABLE\s+{_QUALIFIED}\s+TO\s+{_QUALIFIED}\s*$", s, re.I)
    if m:
        from_db = _ident(m.group(1)) if m.group(1) else default_db
        to_db = _ident(m.group(3)) if m.group(3) else default_db
        return [{
            "db": from_db, "tbl": _ident(m.group(2)), "op": "rename_table",
            "to_db": to_db, "to_tbl": _ident(m.group(4)),
        }]

    m = re.match(rf"TRUNCATE\s+(?:TABLE\s+)?{_QUALIFIED}\s*$", s, re.I)
    if m:
        db = _ident(m.group(1)) if m.group(1) else default_db
        return [{"db": db, "tbl": _ident(m.group(2)), "op": "truncate"}]

    m = re.match(rf"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_QUALIFIED}\s*$", s, re.I)
    if m:
        db = _ident(m.group(1)) if m.group(1) else default_db
        return [{"db": db, "tbl": _ident(m.group(2)), "op": "drop"}]

    raise ValueError(f"unsupported DDL: {sql!r}")
