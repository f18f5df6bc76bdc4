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
registry: CREATE TABLE (incl. ``LIKE``), ALTER TABLE ADD/DROP/MODIFY/
CHANGE/RENAME COLUMN (with ``FIRST``/``AFTER`` reorder and generated
columns), RENAME TABLE, TRUNCATE, DROP TABLE, CREATE/DROP INDEX, plus the
clause families a real stream carries that MUST be registry no-ops and
must not misparse: partition maintenance (ADD/DROP/REORGANIZE/SPLIT/MERGE
PARTITION …), ``CONVERT TO CHARACTER SET``, ``ALGORITHM=…`` variants, and
table options. Multi-statement scripts split on top-level ``;``
(``parse_ddl_script``). Identifiers are unquoted + lowercased
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


# -- quoting sanitizer ------------------------------------------------------
# The grammar below is regex-shaped, which druid-class parsers beat on
# exotic-but-legal SQL: backticked identifiers containing keywords, commas,
# parens or quotes, and COMMENT/DEFAULT strings containing commas/parens
# (MemoryTableMeta.java digests those via a real parser). Rather than grow
# every regex, a single left-to-right pre-pass replaces each backticked
# identifier and each string literal's CONTENT with a collision-proof word
# token, runs the grammar on the sanitized text, and restores the original
# spellings in the emitted ops. Identifiers restore lowercased — the
# registry's existing normalization for plain identifiers.

def _sanitize(sql: str) -> tuple[str, dict[str, str]]:
    """Returns (sanitized_sql, placeholder → original-spelling map).
    The placeholder prefix is bumped until no placeholder-shaped token
    pre-exists in the input, so a literal ``zzqid0zz`` in the SQL can
    never be captured (or rewritten) by :func:`_restore`."""
    prefix = "zzq"
    while re.search(rf"{prefix}(?:id|str)\d+zz", sql):
        prefix += "q"
    out: list[str] = []
    subs: dict[str, str] = {}
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "`":
            j, buf = i + 1, []
            while j < n:
                if sql[j] == "`":
                    if j + 1 < n and sql[j + 1] == "`":  # `` escape
                        buf.append("`")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            if j >= n:  # unterminated — pass through, grammar will reject
                out.append(sql[i:])
                break
            key = f"{prefix}id{len(subs)}zz"
            subs[key] = "".join(buf).lower()
            out.append(key)
            i = j + 1
        elif ch == "'":
            j, buf = i + 1, []
            while j < n:
                c = sql[j]
                if c == "\\" and j + 1 < n:  # backslash escape
                    buf.append(sql[j : j + 2])
                    j += 2
                    continue
                if c == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        buf.append("''")
                        j += 2
                        continue
                    break
                buf.append(c)
                j += 1
            if j >= n:
                out.append(sql[i:])
                break
            key = f"{prefix}str{len(subs)}zz"
            subs[key] = "".join(buf)
            out.append("'" + key + "'")  # keep the quotes: still a literal
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), subs


def _restore(obj, subs: dict[str, str]):
    """Substitute placeholders back into every string of an op tree —
    matching EXACTLY the keys _sanitize generated for this call, never a
    generic placeholder shape (collision-proofing's second half)."""
    if not subs:
        return obj
    if isinstance(obj, str):
        pat = re.compile("|".join(re.escape(k) for k in subs))
        return pat.sub(lambda m: subs[m.group(0)], obj)
    if isinstance(obj, list):
        return [_restore(v, subs) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_restore(v, subs) for v in obj)
    if isinstance(obj, dict):
        # KEYS can be identifiers too (pk_prefixes maps column → length)
        return {
            _restore(k, subs): _restore(v, subs) for k, v in obj.items()
        }
    return obj


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
#: key-part list may nest one paren level per part — prefix lengths
#: (``name(10)``), which a ``[^)]*`` capture would truncate mid-name
_PK_CONSTRAINT = re.compile(
    r"^(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*"
    r"\(((?:[^()]|\([^()]*\))*)\)", re.I,
)
#: one key part → bare column: strip the prefix length and ASC/DESC
_KEY_PART_TAIL = re.compile(
    r"(?:\(\s*\d+\s*\))?\s*(?:\b(?:ASC|DESC))?\s*$", re.I)
_KEY_PART_PREFIX = re.compile(r"\(\s*(\d+)\s*\)")


def _parse_key_parts(raw: str) -> tuple[list[str], dict[str, int]]:
    """A key-part list (``id, name(10) DESC``) → (bare column names in
    key order, {column: prefix length} for prefix-indexed parts) — the
    registry keeps prefixes so a rendered CREATE round-trips and the
    wire's PRIMARY_KEY_WITH_PREFIX TLV can be sourced from schema."""
    names: list[str] = []
    prefixes: dict[str, int] = {}
    for part in raw.split(","):
        part = part.strip()
        name = _ident(_KEY_PART_TAIL.sub("", part))
        names.append(name)
        m = _KEY_PART_PREFIX.search(part)
        if m:
            prefixes[name] = int(m.group(1))
    return names, prefixes


_KEY_DEF = re.compile(
    r"^(?:UNIQUE\s+)?(?:KEY|INDEX|CONSTRAINT|FULLTEXT|SPATIAL|FOREIGN|CHECK)\b", re.I
)
#: UNIQUE KEY table element / ALTER ADD clause — registry tracks unique
#: keys because the reference's applier identity-key selection needs
#: them (TableInfo.getIdentifyKeyList: pks + uks; DbMetaManager reads
#: them from information_schema)
_UNIQUE_DEF = re.compile(
    r"^(?:CONSTRAINT\s+(?P<cname>[^\s(]+)\s+)?UNIQUE(?:\s+(?:KEY|INDEX))?"
    r"(?:\s+(?!\()(?P<name>[^\s(]+))?\s*"
    r"\((?P<parts>(?:[^()]|\([^()]*\))*)\)", re.I,
)


def _parse_unique_def(element: str):
    """One UNIQUE element/clause → (key name, column tuple) or None.
    The name is the index name, else the CONSTRAINT symbol, else
    MySQL's convention seed (the first column name)."""
    m = _UNIQUE_DEF.match(element.strip())
    if not m:
        return None
    names, _ = _parse_key_parts(m.group("parts"))
    # FUNCTIONAL key parts (UNIQUE KEY fuk ((LOWER(b)))) are expressions,
    # not columns — the registry cannot attribute them; leave those keys
    # as plain index no-ops
    if any(not n or "(" in n or ")" in n for n in names):
        return None
    raw = m.group("name") or m.group("cname")
    name = _ident(raw) if raw else names[0]
    return name, tuple(names)


# -- balanced-paren expression consumer --------------------------------------
# MySQL 8 grammar embeds arbitrarily nested expressions in column clauses:
# expression DEFAULT ``DEFAULT (expr)``, ``CHECK (expr)``, generated columns
# ``[GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED]``, functional index parts
# ``((col + 1))``. A regex can't match balanced parens; this consumer walks
# them (the reference's druid parser digests all of these —
# MemoryTableMeta.java).

def _consume_balanced(s: str, i: int) -> int:
    """``s[i] == '('`` → index just past its matching ``)``; unbalanced
    input returns ``len(s)`` (the grammar rejects downstream)."""
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return len(s)


_EXPR_CLAUSE = re.compile(
    r"\b(?:(?P<gen>(?:GENERATED\s+ALWAYS\s+)?AS)|DEFAULT|CHECK)\s*(?=\()",
    re.I,
)


def _strip_expr_clauses(element: str) -> tuple[str, bool]:
    """Remove paren-nested expression clauses from one column declaration
    — ``DEFAULT (expr)``, ``CHECK (expr)``, ``[GENERATED ALWAYS] AS
    (expr) [VIRTUAL|STORED]`` — consuming balanced parens at ANY nesting
    depth. Returns (stripped declaration, is_generated)."""
    out: list[str] = []
    i, generated = 0, False
    while True:
        m = _EXPR_CLAUSE.search(element, i)
        if not m:
            out.append(element[i:])
            break
        out.append(element[i : m.start()])
        end = _consume_balanced(element, m.end())
        if m.group("gen"):
            generated = True
            tail = re.match(r"\s+(?:VIRTUAL|STORED)\b", element[end:], re.I)
            if tail:
                end += tail.end()
        i = end
    return " ".join("".join(out).split()), generated

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
    r"|(?:FULLTEXT|SPATIAL|GLOBAL|CLUSTERED|LOCAL)(?:\s+(?:INDEX|KEY))?[\s(]"
    r"|(?:INDEX|KEY)[\s(])"
    r"|DROP\s+(?:PRIMARY\s+KEY|FOREIGN\s+KEY\s+\S+|(?:INDEX|KEY)\s+\S+"
    r"|CONSTRAINT\s+\S+|CHECK\s+\S+)"
    r"|RENAME\s+(?:INDEX|KEY)\s+\S+\s+TO\s+\S+"
    r"|ALTER\s+INDEX\s+\S+\s+(?:VISIBLE|INVISIBLE)"
    r"|ALTER\s+(?:CHECK|CONSTRAINT)\s+\S+\s+(?:NOT\s+)?ENFORCED"
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
    r"|(?:ENGINE|AUTO_INCREMENT|COMMENT|ROW_FORMAT|KEY_BLOCK_SIZE"
    r"|STATS_PERSISTENT|STATS_AUTO_RECALC|STATS_SAMPLE_PAGES|MAX_ROWS|MIN_ROWS"
    r"|PACK_KEYS|DELAY_KEY_WRITE|CHECKSUM|AVG_ROW_LENGTH)\s*=?"
    r"|(?:SET\s+)?(?:TABLEGROUP|LOCALITY)\s*=?"
    r"|ALTER\s+(?:COLUMN\s+)?`?[A-Za-z0-9_$]+`?\s+(?:SET\s+DEFAULT|DROP\s+DEFAULT"
    r"|SET\s+(?:VISIBLE|INVISIBLE))"
    r"|(?:ENABLE|DISABLE)\s+KEYS"
    r"|(?:DISCARD|IMPORT)\s+TABLESPACE\b"
    r"|WITH(?:OUT)?\s+VALIDATION\b"
    r"|READ\s+(?:ONLY|WRITE)\b"
    r"|SECONDARY_ENGINE\s*=?"
    r"|ORDER\s+BY\b"
    r"|FORCE$"
    r")",
    re.I,
)

#: partition-maintenance ALTER actions — MySQL + PolarDB-X forms
#: (ALTER TABLE … ADD/DROP/TRUNCATE/REORGANIZE/SPLIT/MERGE/MOVE
#: [SUB]PARTITION, MODIFY/RENAME [SUB]PARTITION (PolarDB-X list-value and
#: rename maintenance), re-PARTITION BY, REMOVE PARTITIONING; reference
#: normalizes these in DDLConverter and MemoryTableMeta digests them
#: without touching column metadata). They change data placement only — a
#: registry no-op — but MUST be recognized before the ADD/DROP/MODIFY-
#: COLUMN regexes, which would otherwise misread ``ADD PARTITION (…)`` as
#: adding a column named ``partition`` (and ``MODIFY PARTITION p0 ADD
#: VALUES (…)`` as a column retype — the round-10 fuzz find).
#:
#: PARTITION is a reserved word (an unquoted column can never be named
#: it), so the column-verb × PARTITION forms match freely. SUBPARTITION
#: is NOT reserved: for the ambiguous column verbs (ADD/DROP/MODIFY/
#: RENAME) the SUBPARTITION alternative additionally requires the
#: maintenance form's tail — a definition list / named VALUES clause,
#: a following name, ADD|DROP VALUES, or TO — so ``DROP subpartition``
#: (a column genuinely named subpartition) still parses as a column op.
#: Non-column verbs (TRUNCATE/REORGANIZE/SPLIT/…) carry no ambiguity.
_PARTITION_ACTION = re.compile(
    r"^(?:"
    r"(?:TRUNCATE|COALESCE|REORGANIZE|REBUILD|OPTIMIZE|ANALYZE"
    r"|CHECK|REPAIR|EXCHANGE|IMPORT|DISCARD|SPLIT|EXTRACT)"
    r"\s+(?:SUB)?PARTITION\b"
    r"|(?:ADD|DROP|MODIFY|RENAME)\s+PARTITION\b"
    r"|ADD\s+SUBPARTITION\s*(?:\(|\S+\s+VALUES\b)"
    r"|DROP\s+SUBPARTITION\s+\S"
    r"|MODIFY\s+SUBPARTITION\s+\S+\s+(?:ADD|DROP)\s+VALUES\b"
    r"|RENAME\s+SUBPARTITION\s+\S+\s+TO\b"
    r"|(?:MERGE|MOVE)\s+(?:SUB)?PARTITIONS?\b"
    r"|REMOVE\s+PARTITIONING\b"
    r"|PARTITION\s+BY\b"
    r")",
    re.I,
)

#: leading verbs that can START an ALTER action — used to re-join comma
#: continuations (``DROP PARTITION p0, p1`` splits at the top-level comma;
#: ``p1`` is a continuation of the partition name list, not a new action)
_ACTION_START = re.compile(
    r"^(?:ADD|DROP|MODIFY|CHANGE|RENAME|ALTER|CONVERT|TRUNCATE|COALESCE"
    r"|REORGANIZE|REBUILD|OPTIMIZE|ANALYZE|CHECK|REPAIR|EXCHANGE|IMPORT"
    r"|DISCARD|SPLIT|MERGE|MOVE|EXTRACT|REMOVE|PARTITION|ENGINE|ALGORITHM"
    r"|SET|LOCALITY"
    r"|LOCK|DEFAULT|CHARACTER|CHARSET|COLLATE|AUTO_INCREMENT|COMMENT"
    r"|ROW_FORMAT|KEY_BLOCK_SIZE|STATS_PERSISTENT|STATS_AUTO_RECALC"
    r"|STATS_SAMPLE_PAGES|MAX_ROWS|MIN_ROWS|PACK_KEYS|DELAY_KEY_WRITE"
    r"|CHECKSUM|AVG_ROW_LENGTH|TABLEGROUP|ENABLE|DISABLE|ORDER|FORCE"
    r"|WITH|WITHOUT|READ|SECONDARY_ENGINE)\b",
    re.I,
)

#: trailing column-position clause on ADD/MODIFY/CHANGE — captured
#: separately and applied as a registry reorder
_POSITION_TAIL = re.compile(rf"\s+(?:(FIRST)|AFTER\s+{_IDENT})\s*$", re.I)

def _merge_continuations(parts: list[str]) -> list[str]:
    """Re-join top-level-comma fragments that continue the previous action
    (partition/column name lists: ``DROP PARTITION p0, p1``,
    ``REORGANIZE PARTITION p0, p1 INTO (…)``)."""
    out: list[str] = []
    for p in parts:
        if out and not _ACTION_START.match(p):
            out[-1] = out[-1] + ", " + p
        else:
            out.append(p)
    return out


def _strip_position(decl: str) -> tuple[str, tuple | None]:
    """Split a column declaration's trailing FIRST / AFTER col clause.
    Returns (decl_without_position, None | ("first",) | ("after", col))."""
    m = _POSITION_TAIL.search(decl)
    if not m:
        return decl.strip(), None
    rest = decl[: m.start()].strip()
    if m.group(1):
        return rest, ("first",)
    return rest, ("after", _ident(m.group(2)))


def parse_ddl_script(sql: str, default_db: str | None = None) -> list[dict]:
    """Parse a multi-statement DDL script (statements separated by
    top-level ``;``) into one flat op list, left-to-right — the form a
    captured QUERY event or a migration tool emits."""
    sql, subs = _sanitize(sql)
    return _restore(_parse_script_sanitized(sql, default_db), subs)


def _parse_script_sanitized(sql: str, default_db: str | None) -> list[dict]:
    ops: list[dict] = []
    depth, in_str, cur = 0, False, []
    stmts: list[str] = []
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_str:
            if ch == "'":
                # '' escape stays inside the string
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            stmts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    if "".join(cur).strip():
        stmts.append("".join(cur))
    for stmt in stmts:
        if stmt.strip():
            ops.extend(_parse_ddl_sanitized(stmt, default_db))
    return ops


def _parse_column_element(element: str) -> dict:
    """One CREATE-TABLE/ADD-COLUMN column definition → {name, mysql_type,
    generated, inline_pk}. The generated clause (``[GENERATED ALWAYS] AS
    (expr) [VIRTUAL|STORED]``) is recorded as a flag and stripped from the
    type declaration so ``typed_images`` sees a clean type."""
    element, generated = _strip_expr_clauses(element)
    cd = _COL_DEF.match(element)
    if not cd:
        raise ValueError(f"unparsable column def: {element!r}")
    name = _ident(cd.group(1))
    mysql_type = cd.group(2).strip()
    return {
        "name": name,
        "mysql_type": mysql_type,
        "generated": generated,
        "inline_pk": bool(_PK_INLINE.search(element[cd.end():])),
    }


def parse_ddl(sql: str, default_db: str | None = None) -> list[dict]:
    """Parse one DDL statement into registry ops:
    ``[{db, tbl, op, ...}, ...]`` (RENAME TABLE yields two ops). Raises
    ``ValueError`` for DDL outside the supported grammar — callers decide
    whether unknown DDL is skippable (the reference logs-and-continues for
    DDL that doesn't affect row decoding)."""
    sql, subs = _sanitize(sql)
    return _restore(_parse_ddl_sanitized(sql, default_db), subs)


def _parse_ddl_sanitized(sql: str, default_db: str | None = None) -> list[dict]:
    s = sql.strip().rstrip(";").strip()

    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s*(?=\()",
        s, re.I | re.S,
    )
    if m:
        # balanced scan for the COLUMN-LIST body: a greedy regex would
        # swallow table-tail clauses that themselves end in ')' — e.g.
        # PARTITION BY RANGE (f(c)) (PARTITION p0 VALUES LESS THAN (...))
        # — and surface a phantom 'partition' column (round-8 fuzz find).
        # Track closure explicitly: _consume_balanced returns len(s) both
        # for "matched at the last char" and "never matched", so a
        # truncated CREATE (torn QUERY event) must be rejected here, not
        # parsed with a corrupted last column.
        open_i = m.end()
        depth, close_i = 0, -1
        for j in range(open_i, len(s)):
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    close_i = j + 1
                    break
        if close_i < 0:
            return []  # unbalanced: not a digestible CREATE
        # CREATE TABLE t (…) [IGNORE|REPLACE] [AS] SELECT …: the final
        # column set also contains the SELECT's output columns, which a
        # registry cannot resolve without executing the query — REJECT
        # loudly rather than record a wrong (partial) column set. The
        # sanitizer has already hidden string literals, so a bare SELECT
        # keyword in the tail is unambiguous. (MySQL 8.0 with GTIDs
        # forbids CREATE TABLE … SELECT on the wire for the same
        # atomicity reason; the reference never digests one either.)
        if re.search(r"\bSELECT\b", s[close_i:], re.I):
            raise ValueError(f"CREATE TABLE ... SELECT is not digestible: {sql!r}")
        db, tbl, body = m.group(1), _ident(m.group(2)), s[open_i + 1 : close_i - 1]
        # the parenthesized no-AS CTAS form — CREATE TABLE t (SELECT …) —
        # puts the query INSIDE the parens; digesting it as a column list
        # would record garbage columns ('select', …)
        if re.match(r"\s*SELECT\b", body, re.I):
            raise ValueError(f"CREATE TABLE ... SELECT is not digestible: {sql!r}")
        # table tail (engine/charset/partitioning/dbpartition) carries no
        # column info — intentionally ignored, like MemoryTableMeta's
        # schema projection
        cols: list[str] = []
        types: list[str] = []
        pks: list[str] = []
        hidden: list[str] = []
        generated: list[str] = []
        pk_prefixes: dict[str, int] = {}
        uniques: list[list] = []
        for element in _split_top_level(body):
            pk_c = _PK_CONSTRAINT.match(element)
            if pk_c:
                names, prefixes = _parse_key_parts(pk_c.group(1))
                pks.extend(names)
                pk_prefixes.update(prefixes)
                continue
            uq = _parse_unique_def(element)
            if uq:
                uniques.append([uq[0], list(uq[1])])
                continue
            if _KEY_DEF.match(element):
                continue
            c = _parse_column_element(element)
            cols.append(c["name"])
            types.append(c["mysql_type"])
            if c["inline_pk"]:
                pks.append(c["name"])
            elif re.search(r"\bUNIQUE\b", element, re.I):
                # inline column attribute: `v INT UNIQUE` = a single-
                # column unique key named after the column
                uniques.append([c["name"], [c["name"]]])
            if c["generated"]:
                generated.append(c["name"])
            if c["name"] == IMPLICIT_PK:
                hidden.append(c["name"])
        return [{
            "db": _ident(db) if db else default_db,
            "tbl": tbl,
            "op": "create",
            "columns": cols,
            "types": types,
            "pks": list(dict.fromkeys(pks)),
            "pk_prefixes": pk_prefixes,
            "uniques": uniques,
            "hidden_pks": hidden,
            "generated": generated,
        }]

    # CREATE TABLE t LIKE s — clone the source table's schema
    # (MemoryTableMeta resolves LIKE against its own snapshot)
    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s+LIKE\s+{_QUALIFIED}\s*$",
        s, re.I,
    )
    if m:
        return [{
            "db": _ident(m.group(1)) if m.group(1) else default_db,
            "tbl": _ident(m.group(2)),
            "op": "create_like",
            "src_db": _ident(m.group(3)) if m.group(3) else default_db,
            "src_tbl": _ident(m.group(4)),
        }]

    m = re.match(rf"ALTER\s+TABLE\s+{_QUALIFIED}\s+(.*)$", s, re.I | re.S)
    if m:
        db = _ident(m.group(1)) if m.group(1) else default_db
        tbl, actions = _ident(m.group(2)), m.group(3)
        ops = []
        for action in _merge_continuations(_split_top_level(actions)):
            # MariaDB / PolarDB-X conditional column forms: the guard
            # changes nothing about the applied schema when the condition
            # holds (and the binlogged statement only exists because it
            # DID apply), so digest with the guard stripped. A genuine
            # column named ``if`` must be backquoted (reserved word) and
            # arrives as a sanitizer placeholder — never matches here.
            action = re.sub(
                r"^(ADD|DROP|MODIFY|CHANGE)\s+(COLUMN\s+)?IF\s+(?:NOT\s+)?EXISTS\s+",
                lambda m: m.group(1) + " " + (m.group(2) or ""),
                action, flags=re.I,
            )
            if _PARTITION_ACTION.match(action):
                # partition maintenance changes data placement, never the
                # visible column set — record a no-op version (the
                # reference's DDLConverter normalizes these away for the
                # logical stream; MemoryTableMeta digests them intact)
                ops.append({"db": db, "tbl": tbl, "op": "partition", "action": action})
                continue
            # ADD/DROP PRIMARY KEY change the registry's key metadata
            # (MemoryTableMeta digests them; the column set is untouched)
            mpk = re.match(
                r"ADD\s+(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*"
                r"(?:USING\s+\w+\s*)?\(((?:[^()]|\([^()]*\))*)\)",
                action, re.I,
            )
            if mpk:
                names, prefixes = _parse_key_parts(mpk.group(1))
                ops.append({
                    "db": db, "tbl": tbl, "op": "add_pk",
                    "columns": names, "pk_prefixes": prefixes,
                })
                continue
            if re.match(r"DROP\s+PRIMARY\s+KEY\s*$", action, re.I):
                ops.append({"db": db, "tbl": tbl, "op": "drop_pk"})
                continue
            # ADD UNIQUE / DROP INDEX / RENAME INDEX maintain the
            # registry's unique-key metadata (TableInfo.getIdentifyKeyList
            # consumes it); GLOBAL/CLUSTERED GSI forms stay no-ops
            madd = re.match(r"ADD\s+(.*)$", action, re.I | re.S)
            if madd and re.match(
                r"(?:CONSTRAINT\s+\S+\s+)?UNIQUE\b", madd.group(1), re.I
            ):
                uq = _parse_unique_def(madd.group(1))
                if uq:
                    ops.append({
                        "db": db, "tbl": tbl, "op": "add_uk",
                        "name": uq[0], "columns": list(uq[1]),
                    })
                    continue
            mdrop = re.match(
                r"DROP\s+(?:INDEX|KEY)\s+([^\s(]+)\s*$", action, re.I)
            if mdrop:
                ops.append({
                    "db": db, "tbl": tbl, "op": "drop_index",
                    "name": _ident(mdrop.group(1)),
                })
                continue
            mren = re.match(
                r"RENAME\s+(?:INDEX|KEY)\s+([^\s(]+)\s+TO\s+([^\s(]+)\s*$",
                action, re.I)
            if mren:
                ops.append({
                    "db": db, "tbl": tbl, "op": "rename_index",
                    "from": _ident(mren.group(1)),
                    "to": _ident(mren.group(2)),
                })
                continue
            if _INDEX_ACTION.match(action) or _TABLE_OPTION_ACTION.match(action):
                # index/constraint/table-option DDL: registry no-op — the
                # visible column set is unchanged (CINDEX/DINDEX in the
                # reference; MemoryTableMeta keeps column metadata intact)
                ops.append({"db": db, "tbl": tbl, "op": "index", "action": action})
                continue
            # ADD [COLUMN] (c1 t1, c2 t2, …) — parenthesized multi-add
            a = re.match(r"ADD\s+(?:COLUMN\s+)?\((.*)\)\s*$", action, re.I | re.S)
            if a:
                for element in _split_top_level(a.group(1)):
                    c = _parse_column_element(element)
                    ops.append({
                        "db": db, "tbl": tbl, "op": "add_column",
                        "column": c["name"], "mysql_type": c["mysql_type"],
                        "generated": c["generated"],
                    })
                continue
            a = re.match(rf"ADD\s+(?:COLUMN\s+)?{_IDENT}\s+(.+)$", action, re.I | re.S)
            if a:
                decl, position = _strip_position(a.group(2))
                c = _parse_column_element(f"{a.group(1)} {decl}")
                ops.append({
                    "db": db, "tbl": tbl, "op": "add_column",
                    "column": _ident(a.group(1)),
                    "mysql_type": c["mysql_type"],
                    "generated": c["generated"],
                    **({"position": position} if position else {}),
                })
                continue
            a = re.match(rf"DROP\s+(?:COLUMN\s+)?{_IDENT}\s*$", action, re.I)
            if a:
                ops.append({"db": db, "tbl": tbl, "op": "drop_column", "column": _ident(a.group(1))})
                continue
            a = re.match(rf"CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.+)$", action, re.I | re.S)
            if a:
                decl, position = _strip_position(a.group(3))
                c = _parse_column_element(f"{a.group(2)} {decl}")
                ops.append({
                    "db": db, "tbl": tbl, "op": "rename_column",
                    "from": _ident(a.group(1)), "to": _ident(a.group(2)),
                    "mysql_type": c["mysql_type"],
                    **({"position": position} if position else {}),
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
                decl, position = _strip_position(a.group(2))
                c = _parse_column_element(f"{a.group(1)} {decl}")
                ops.append({
                    "db": db, "tbl": tbl, "op": "modify_column",
                    "column": _ident(a.group(1)), "mysql_type": c["mysql_type"],
                    **({"position": position} if position else {}),
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

    # RENAME TABLE a TO b [, c TO d, ...] — the multi-pair statement form
    # (MySQL swaps atomically; per-pair ops in statement order replay the
    # same end state for the registry's versioned model)
    m = re.match(r"RENAME\s+TABLE\s+(.+)$", s, re.I | re.S)
    if m:
        ops = []
        for pair in _split_top_level(m.group(1)):
            pm = re.match(rf"{_QUALIFIED}\s+TO\s+{_QUALIFIED}\s*$", pair, re.I)
            if not pm:
                raise ValueError(f"unsupported DDL: {sql!r}")
            from_db = _ident(pm.group(1)) if pm.group(1) else default_db
            to_db = _ident(pm.group(3)) if pm.group(3) else default_db
            ops.append({
                "db": from_db, "tbl": _ident(pm.group(2)), "op": "rename_table",
                "to_db": to_db, "to_tbl": _ident(pm.group(4)),
            })
        return ops

    m = re.match(rf"TRUNCATE\s+(?:TABLE\s+)?{_QUALIFIED}\s*$", s, re.I)
    if m:
        db = _ident(m.group(1)) if m.group(1) else default_db
        return [{"db": db, "tbl": _ident(m.group(2)), "op": "truncate"}]

    # DROP TABLE [IF EXISTS] a [, b, ...] [RESTRICT|CASCADE]
    m = re.match(
        r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.+?)(?:\s+(?:RESTRICT|CASCADE))?\s*$",
        s, re.I | re.S,
    )
    if m:
        ops = []
        for name in _split_top_level(m.group(1)):
            nm = re.match(rf"{_QUALIFIED}\s*$", name, re.I)
            if not nm:
                raise ValueError(f"unsupported DDL: {sql!r}")
            db = _ident(nm.group(1)) if nm.group(1) else default_db
            ops.append({"db": db, "tbl": _ident(nm.group(2)), "op": "drop"})
        return ops

    # statement-level index DDL — registry no-op versions on the target
    # table (CINDEX/DINDEX actions in the reference's DBMSAction model)
    m = re.match(
        rf"CREATE\s+(?:UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?(?:GLOBAL\s+|CLUSTERED\s+|LOCAL\s+)?"
        rf"INDEX\s+{_IDENT}\s+(?:USING\s+\w+\s+)?ON\s+{_QUALIFIED}\s*\(.*\)\s*[^)]*$",
        s, re.I | re.S,
    )
    if m:
        db = _ident(m.group(2)) if m.group(2) else default_db
        return [{"db": db, "tbl": _ident(m.group(3)), "op": "index", "action": s}]

    m = re.match(
        rf"DROP\s+INDEX\s+{_IDENT}\s+ON\s+{_QUALIFIED}"
        rf"(?:\s+(?:ALGORITHM|LOCK)\s*=?\s*\w+)*\s*$",
        s, re.I,
    )
    if m:
        db = _ident(m.group(2)) if m.group(2) else default_db
        return [{"db": db, "tbl": _ident(m.group(3)), "op": "index", "action": s}]

    # database-level DDL — the reference's CREATEDB/DROPDB actions
    # (DBMSAction.java:23-27); DROPDB cascades to every table in the db
    m = re.match(
        rf"CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\b.*$",
        s, re.I | re.S,
    )
    if m:
        return [{"db": _ident(m.group(1)), "tbl": None, "op": "create_database"}]

    m = re.match(
        rf"DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s*$", s, re.I
    )
    if m:
        return [{"db": _ident(m.group(1)), "tbl": None, "op": "drop_database"}]

    m = re.match(rf"ALTER\s+(?:DATABASE|SCHEMA)\s+{_IDENT}\b.*$", s, re.I | re.S)
    if m:
        # charset/collation defaults only — no table metadata changes
        return [{"db": _ident(m.group(1)), "tbl": None, "op": "alter_database"}]

    # column-list-free CTAS (CREATE TABLE t [AS] SELECT …): same
    # rejection contract as the parenthesized form above, specific error
    if re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s+"
        r"(?:IGNORE\s+|REPLACE\s+)?(?:AS\s+)?SELECT\b",
        s, re.I | re.S,
    ):
        raise ValueError(f"CREATE TABLE ... SELECT is not digestible: {sql!r}")

    # Table-maintenance admin statements ride the binlog as QUERY events
    # but never change the column model — digest as explicit no-ops
    # (MemoryTableMeta ignores them the same way). FLUSH covers both the
    # TABLES form and the LOGS/PRIVILEGES/… administrative variants.
    if re.match(
        r"(?:ANALYZE|OPTIMIZE|REPAIR|CHECK|CHECKSUM)\s+"
        r"(?:NO_WRITE_TO_BINLOG\s+|LOCAL\s+)?TABLES?\b",
        s, re.I,
    ) or re.match(r"FLUSH\b", s, re.I) or re.match(
        r"(?:CACHE\s+INDEX|LOAD\s+INDEX\s+INTO\s+CACHE)\b", s, re.I
    ):
        return []

    # TEMPORARY tables are session-scoped and produce NO row events under
    # row-based replication — their DDL is a registry no-op (the
    # reference's meta layer never materializes them either)
    if re.match(
        r"(?:CREATE|DROP)\s+TEMPORARY\s+TABLE\b", s, re.I,
    ):
        return []

    # PolarDB-X tablegroup administration (CREATE/DROP/ALTER TABLEGROUP …
    # SPLIT/MERGE/MOVE PARTITION, SET LOCALITY): pure data-placement DDL —
    # no table's column model changes, so the registry digests a no-op
    # (the reference's DDLConverter drops these from the logical stream)
    if re.match(r"(?:CREATE|DROP|ALTER)\s+TABLEGROUP\b", s, re.I):
        return []

    raise ValueError(f"unsupported DDL: {sql!r}")


# ---------------------------------------------------------------------------
# Physical → logical DDL emission (DDLConverter / QueryEventReformator parity)
# ---------------------------------------------------------------------------

#: Ordered (pattern, replacement) rules rewriting PolarDB-X physical DDL
#: into the logical form a vanilla-MySQL downstream can replay —
#: DDLConverter.convertNormalDDL (polardbx-cdc-task/.../rebuild/
#: DDLConverter.java:120-260): strip sharding clauses (DBPARTITION/
#: TBPARTITION/PARTITION BY, BROADCAST/SINGLE, TABLEGROUP, LOCALITY,
#: AUTO_SPLIT), drop GSI/clustered index elements and the implicit PK
#: ``_drds_implicit_id_``, demote GLOBAL/CLUSTERED/LOCAL index DDL to
#: plain index DDL, and erase PolarDB-X sequence types on
#: AUTO_INCREMENT. Patterns are deliberately RE2-safe (no lookaround, no
#: backreferences, fixed-string replacements) so the SAME rules run as
#: Spark ``regexp_replace`` (Java regex) and in the DuckDB oracle.
LOGICAL_DDL_RULES: list[tuple[str, str]] = [
    # GSI / clustered-index table elements inside CREATE TABLE:
    # [UNIQUE] GLOBAL|CLUSTERED [UNIQUE] INDEX|KEY name (cols)
    #   [COVERING (cols)] [DBPARTITION BY f(c) [TBPARTITION BY f(c)
    #   [TBPARTITIONS n]]]
    (
        r"(?i),\s*(?:UNIQUE\s+)?(?:GLOBAL|CLUSTERED)\s+(?:UNIQUE\s+)?"
        r"(?:INDEX|KEY)\s*[^,()]*\([^()]*\)"
        r"(?:\s*COVERING\s*\([^()]*\))?"
        r"(?:\s*DBPARTITION\s+BY\s+[A-Za-z0-9_]+\s*\([^()]*\))?"
        r"(?:\s*TBPARTITION\s+BY\s+[A-Za-z0-9_]+\s*\([^()]*\))?"
        r"(?:\s*TBPARTITIONS\s+[0-9]+)?",
        "",
    ),
    # ALTER ... ADD GLOBAL/CLUSTERED/LOCAL index → plain ADD (preserve
    # UNIQUE with dedicated fixed-string rules; no backreferences)
    (r"(?i)\bADD\s+GLOBAL\s+UNIQUE\s+", "ADD UNIQUE "),
    (r"(?i)\bADD\s+CLUSTERED\s+UNIQUE\s+", "ADD UNIQUE "),
    (r"(?i)\bADD\s+UNIQUE\s+GLOBAL\s+", "ADD UNIQUE "),
    (r"(?i)\bADD\s+UNIQUE\s+CLUSTERED\s+", "ADD UNIQUE "),
    (r"(?i)\bADD\s+GLOBAL\s+", "ADD "),
    (r"(?i)\bADD\s+CLUSTERED\s+", "ADD "),
    (r"(?i)\bADD\s+LOCAL\s+INDEX\b", "ADD INDEX"),
    (r"(?i)\bADD\s+LOCAL\s+KEY\b", "ADD KEY"),
    # the implicit primary key column + its PK constraint
    (r"(?i),\s*`?_drds_implicit_id_`?\s+[^,()]*(?:\([^()]*\))?[^,()]*", ""),
    (r"(?i),\s*PRIMARY\s+KEY\s*\(\s*`?_drds_implicit_id_`?\s*\)", ""),
    # PolarDB-X sequence types on auto-increment
    (r"(?i)\bAUTO_INCREMENT\s+BY\s+(?:GROUP|SIMPLE|TIME|NEW)\b", "AUTO_INCREMENT"),
    # sharding / placement clauses
    (r"(?i)\s+DBPARTITION\s+BY\s+[A-Za-z0-9_]+\s*\([^()]*\)", ""),
    (r"(?i)\s+TBPARTITION\s+BY\s+[A-Za-z0-9_]+\s*\([^()]*\)", ""),
    (r"(?i)\s+TBPARTITIONS\s+[0-9]+", ""),
    (r"(?i)\s+PARTITION\s+BY\s+[A-Za-z0-9_]+\s*\([^()]*\)(?:\s+PARTITIONS\s+[0-9]+)?", ""),
    (r"(?i)\s+BROADCAST\b", ""),
    (r"(?i)\s+SINGLE\b", ""),
    (r"(?i)\s+TABLEGROUP\s*=?\s*`?[A-Za-z0-9_$]+`?", ""),
    (r"(?i)\s+LOCALITY\s*=?\s*'[^']*'", ""),
    (r"(?i)\s+AUTO_SPLIT\s*=?\s*(?:ON|OFF|TRUE|FALSE|[0-9]+)\b", ""),
    (r"(?i)\s+PARTITION_MODE\s*=?\s*'[^']*'", ""),
    # physical shard-table suffix → logical name (hack4RepairTableName:
    # `t0_vx2b_00001` was sharded from logical `t0`)
    (r"(?i)_[a-z0-9]{4}_[0-9]{5}\b", ""),
    # cleanup: dangling comma before ')' after element removal
    (r",\s*\)", ")"),
]


def to_logical_ddl(sql: str, tso: str | None = None, origin_comment: bool = True) -> str:
    """Rewrite one physical DDL statement to logical form (driver-side
    twin of ``logical_ddl_col``; DDL is metadata-scale). With
    ``origin_comment``, prepend the reference's private-DDL markers
    (DDLConverter.java:126-131: ``# POLARX_ORIGIN_SQL`` / ``# POLARX_TSO``)
    so downstream consumers can recover the physical statement."""
    out = sql.strip().rstrip(";")
    for pat, repl in LOGICAL_DDL_RULES:
        out = re.sub(pat, repl, out)
    out = out.strip()
    if origin_comment:
        head = f"# POLARX_ORIGIN_SQL={' '.join(sql.strip().rstrip(';').split())}\n"
        if tso is not None:
            head += f"# POLARX_TSO={tso}\n"
        return head + out
    return out


def logical_ddl_col(ddl, tso=None, origin_comment: bool = True):
    """Catalyst-expression form of ``to_logical_ddl`` — a chain of
    ``regexp_replace`` (JVM, codegen'd; no Python in the path) for
    normalizing a DataFrame of captured DDL events before the sink
    (LogFileGenerator.writeMetaDdl:411 parity)."""
    from pyspark.sql import functions as F

    out = F.trim(F.regexp_replace(F.trim(ddl), r";\s*$", ""))
    for pat, repl in LOGICAL_DDL_RULES:
        out = F.regexp_replace(out, pat, repl)
    out = F.trim(out)
    if not origin_comment:
        return out
    origin = F.regexp_replace(
        F.trim(F.regexp_replace(F.trim(ddl), r";\s*$", "")), r"\s+", " "
    )
    head = F.concat(F.lit("# POLARX_ORIGIN_SQL="), origin, F.lit("\n"))
    if tso is not None:
        head = F.concat(head, F.lit("# POLARX_TSO="), tso, F.lit("\n"))
    return F.concat(head, out)


def oracle_logical_ddl(expr: str, tso_expr: str | None = None, origin_comment: bool = True) -> str:
    """DuckDB SQL expression replaying the SAME rule chain (flag 'g' =
    global, matching Java replaceAll) — the oracle for the logical-DDL
    emission queries."""
    out = f"trim(regexp_replace(trim({expr}), ';\\s*$', '', 'g'))"
    for pat, repl in LOGICAL_DDL_RULES:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    out = f"trim({out})"
    if not origin_comment:
        return out
    origin = (
        f"regexp_replace(trim(regexp_replace(trim({expr}), ';\\s*$', '', 'g')), '\\s+', ' ', 'g')"
    )
    head = f"'# POLARX_ORIGIN_SQL=' || {origin} || chr(10)"
    if tso_expr is not None:
        head = f"{head} || '# POLARX_TSO=' || {tso_expr} || chr(10)"
    return f"{head} || {out}"


#: Physical-DDL fixtures exercising every LOGICAL_DDL_RULES family —
#: shared by the registered query (Spark side) and its DuckDB oracle so
#: the two can never drift.
LOGICAL_DDL_FIXTURES: list[tuple[str, str]] = [
    (
        "100",
        "CREATE TABLE t0_vx2b_00001 (pk BIGINT AUTO_INCREMENT BY GROUP, value DOUBLE,"
        " props TEXT, _drds_implicit_id_ BIGINT AUTO_INCREMENT,"
        " PRIMARY KEY (_drds_implicit_id_),"
        " GLOBAL INDEX g_i (value) COVERING (props) DBPARTITION BY HASH(value))"
        " DBPARTITION BY HASH(pk) TBPARTITION BY HASH(pk) TBPARTITIONS 4",
    ),
    ("101", "CREATE TABLE broadcast_t (id BIGINT PRIMARY KEY, v VARCHAR(32)) BROADCAST"),
    ("102", "CREATE TABLE single_t (id BIGINT PRIMARY KEY) SINGLE TABLEGROUP = tg_1"),
    ("103", "ALTER TABLE t0 ADD GLOBAL UNIQUE INDEX gsi_v (value) DBPARTITION BY HASH(value)"),
    ("104", "ALTER TABLE t0 ADD LOCAL INDEX l_i (props(16))"),
    ("105", "CREATE DATABASE db7 PARTITION_MODE = 'auto' LOCALITY = 'dc=dc1'"),
    ("106", "CREATE TABLE part_auto (id BIGINT PRIMARY KEY, v DOUBLE) PARTITION BY KEY(id) PARTITIONS 16"),
    ("107", "ALTER TABLE t1 ADD COLUMN c2 INT, ALGORITHM=INPLACE;"),
    ("108", "CREATE TABLE t2_ab12_00007 (id BIGINT, CLUSTERED INDEX ci (id)) TBPARTITION BY HASH(id) TBPARTITIONS 2"),
    ("109", "DROP TABLE t0_vx2b_00001"),
]
