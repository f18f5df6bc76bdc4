"""Schema registry with time travel — TableMetaTSDB semantics.

Reference: polardbx-cdc-canal/.../ddl/tsdb/TableMetaTSDB.java:28-58
(``find(schema, table)``, ``apply(position, ddl)``, ``rollback(position)``,
``snapshot()``) with the in-memory implementation MemoryTableMeta.java; the
logical/physical mapping consumed by the rebuild projection is
LogicTableMeta (polardbx-cdc-meta/.../LogicTableMeta.java:25-107) and
PolarDbXTableMetaManager.compare (PolarDbXTableMetaManager.java:225-275).

Design: versions are an append-only, TSO-keyed log per (db, table) kept as
small driver-side state (broadcastable; at scale this is a Delta dim table
read once per micro-batch). DDL events arriving in-stream call ``apply`` —
serialized per epoch, the reference's DDL-as-stream-barrier
(LogFileGenerator.writeMetaDdl:411).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableSchema:
    """One schema version: ordered column list + pk set + the
    physical→logical column mapping (phyIndex → logicIndex).

    ``types`` (when present) parallels ``columns`` with the MySQL type
    declaration from the DDL — feeds ``typed_images`` directly.

    ``origins`` (when present) parallels ``columns`` with each column's
    birth identity (``name@birth_tso``) — STABLE across RENAME COLUMN,
    so cross-version column matching (the registry-typed wire decode)
    carries a renamed column's values instead of dropping them. Unique
    even when a later ADD re-uses a renamed-away name. Empty on legacy
    snapshots; consumers fall back to name identity."""

    columns: tuple[str, ...]
    pks: tuple[str, ...] = ()
    hidden_pks: tuple[str, ...] = ()  # implicit PK columns to drop on rebuild
    types: tuple[str, ...] = ()
    origins: tuple[str, ...] = ()
    #: (pk column, prefix length) pairs for prefix-indexed key parts —
    #: keeps a rendered CREATE faithful and sources the wire's
    #: PRIMARY_KEY_WITH_PREFIX TLV; empty when the key has no prefixes
    pk_prefixes: tuple[tuple[str, int], ...] = ()
    #: (key name, column tuple) per UNIQUE key — the applier's identity
    #: key selection (TableInfo.getIdentifyKeyList) falls back to these
    #: when a table has no pk-adjacent identity
    uniques: tuple[tuple[str, tuple[str, ...]], ...] = ()

    def identify_key_list(self) -> tuple[str, ...]:
        """Applier identity columns, mirroring the reference's
        TableInfo.getIdentifyKeyList (TableInfo.java:52-100): a pk-less
        table identifies by ALL columns; otherwise the pks, extended by
        every unique-key column not already present. (The reference also
        appends db/tb shard keys — topology state outside this registry;
        callers holding a LogicalTopology can append them the same
        way.)"""
        if not self.pks:
            return tuple(self.columns)
        out = list(self.pks)
        for _, cols in self.uniques:
            for c in cols:
                if c not in out:
                    out.append(c)
        return tuple(out)

    def column_types(self) -> dict[str, str]:
        return dict(zip(self.columns, self.types))

    def origin_names(self) -> tuple[str, ...]:
        """Per-column stable identity, name-fallback when unrecorded."""
        return self.origins if len(self.origins) == len(self.columns) \
            else tuple(self.columns)


@dataclass
class _TableHistory:
    tsos: list[str] = field(default_factory=list)
    schemas: list[TableSchema] = field(default_factory=list)


class SchemaRegistry:
    """TSO-versioned table metadata with apply / find / rollback / snapshot."""

    def __init__(self) -> None:
        self._tables: dict[tuple[str, str], _TableHistory] = {}
        self._databases: set[str] = set()  # CREATEDB-known schemas

    def databases(self) -> set[str]:
        """Schemas seen via CREATE DATABASE plus any with live tables."""
        live = {db for (db, _), h in self._tables.items()
                if h.schemas and h.schemas[-1].columns}
        return self._databases | live

    # -- TableMetaTSDB.apply(position, ddl) --------------------------------
    def apply(self, tso: str, db: str, tbl: str, ddl: dict) -> None:
        """Apply a DDL at a TSO. ``ddl`` is a dict op:
        {op: create, columns: [...], pks: [...], hidden_pks: [...]}
        {op: create_like, src_db, src_tbl}
        {op: add_column, column: c[, position: ("first",)|("after", x)]}
        {op: drop_column, column: c}
        {op: rename_column, from: a, to: b[, position: ...]}
        {op: modify_column, column: c[, position: ...]}
        {op: truncate}   {op: drop}   {op: index}   {op: partition}
        Out-of-order apply (tso <= last) is rejected — DDL is a serialized
        stream barrier."""
        op = ddl["op"]
        if op in ("create_database", "alter_database"):
            # db-level metadata only (charset defaults) — no table versions
            self._databases.add(db)
            return
        if op == "drop_database":
            # DROPDB cascades: every live table in the db gets a drop
            # version at this position (reference erases the whole schema —
            # DBMSAction DROPDB)
            self._databases.discard(db)
            for (d, t), hist in self._tables.items():
                if d == db and hist.schemas and hist.schemas[-1].columns:
                    hist.tsos.append(tso)
                    hist.schemas.append(TableSchema((), (), ()))
            return
        hist = self._tables.setdefault((db, tbl), _TableHistory())
        if hist.tsos and tso <= hist.tsos[-1]:
            raise ValueError(f"DDL at {tso} not after last version {hist.tsos[-1]}")
        cur = hist.schemas[-1] if hist.schemas else None
        if op == "create":
            new = TableSchema(
                tuple(ddl["columns"]),
                tuple(ddl.get("pks", ())),
                tuple(ddl.get("hidden_pks", ())),
                tuple(ddl.get("types", ())),
                tuple(f"{c}@{tso}" for c in ddl["columns"]),
                pk_prefixes=tuple(
                    dict(ddl.get("pk_prefixes", {})).items()
                ),
                uniques=tuple(
                    (n, tuple(cs)) for n, cs in ddl.get("uniques", ())
                ),
            )
        elif op == "create_like":
            src = self.find(ddl["src_db"], ddl["src_tbl"], tso)
            if src is None:
                raise KeyError(
                    f"{ddl['src_db']}.{ddl['src_tbl']} does not exist at {tso}"
                )
            new = src
        elif op == "drop":
            new = TableSchema((), (), ())
        elif op in ("add_pk", "drop_pk"):
            # ALTER … ADD/DROP PRIMARY KEY: key metadata only — columns,
            # types, origins all survive (MemoryTableMeta applies these;
            # a dropped pk falls back to name identity downstream)
            if cur is None or not cur.columns:
                raise KeyError(f"{db}.{tbl} does not exist at {tso}")
            missing = [
                c for c in ddl.get("columns", ()) if c not in cur.columns
            ] if op == "add_pk" else []
            if missing:
                raise ValueError(
                    f"ADD PRIMARY KEY references unknown columns {missing}"
                )
            new = TableSchema(
                cur.columns,
                tuple(ddl["columns"]) if op == "add_pk" else (),
                cur.hidden_pks, cur.types, cur.origins,
                pk_prefixes=tuple(
                    dict(ddl.get("pk_prefixes", {})).items()
                ) if op == "add_pk" else (),
                uniques=cur.uniques,
            )
        elif op in ("add_uk", "drop_index", "rename_index"):
            # unique-key metadata maintenance (DbMetaManager surface);
            # DROP/RENAME of a non-unique index is a plain no-op version
            if cur is None or not cur.columns:
                raise KeyError(f"{db}.{tbl} does not exist at {tso}")
            uqs = list(cur.uniques)
            if op == "add_uk":
                missing = [
                    c for c in ddl["columns"] if c not in cur.columns
                ]
                if missing:
                    raise ValueError(
                        f"ADD UNIQUE references unknown columns {missing}"
                    )
                if any(n == ddl["name"] for n, _ in uqs):
                    # ER_DUP_KEYNAME — the server refuses, so must we
                    raise ValueError(f"duplicate key name {ddl['name']!r}")
                uqs.append((ddl["name"], tuple(ddl["columns"])))
            elif op == "drop_index":
                uqs = [u for u in uqs if u[0] != ddl["name"]]
            else:  # rename_index
                if ddl["to"] != ddl["from"] and any(
                    n == ddl["to"] for n, _ in uqs
                ):
                    raise ValueError(f"duplicate key name {ddl['to']!r}")
                uqs = [
                    (ddl["to"], cols) if n == ddl["from"] else (n, cols)
                    for n, cols in uqs
                ]
            new = TableSchema(
                cur.columns, cur.pks, cur.hidden_pks, cur.types,
                cur.origins, pk_prefixes=cur.pk_prefixes,
                uniques=tuple(uqs),
            )
        elif op in ("truncate", "index", "partition"):
            # truncate clears rows, index DDL changes access paths,
            # partition maintenance changes placement — none touches the
            # visible column set (reference CINDEX/DINDEX,
            # DBMSAction.java:23-27): record a version with the same schema
            if cur is None:
                raise KeyError(f"{db}.{tbl} does not exist at {tso}")
            new = cur
        elif op == "rename_table":
            if cur is None or not cur.columns:
                raise KeyError(f"{db}.{tbl} does not exist at {tso}")
            self.apply(
                tso,
                ddl.get("to_db", db),
                ddl["to_tbl"],
                {
                    "op": "create",
                    "columns": list(cur.columns),
                    "pks": list(cur.pks),
                    "pk_prefixes": dict(cur.pk_prefixes),
                    "uniques": [[n, list(cs)] for n, cs in cur.uniques],
                    "hidden_pks": list(cur.hidden_pks),
                    "types": list(cur.types),
                },
            )
            new = TableSchema((), (), ())  # old name is gone
        else:
            if cur is None or not cur.columns:
                raise KeyError(f"{db}.{tbl} does not exist at {tso}")
            cols = list(cur.columns)
            types = list(cur.types) if cur.types else [""] * len(cols)
            origins = list(cur.origin_names())  # name-fallback on legacy

            def _insert_at(name: str, mysql_type: str, position,
                           origin: str | None = None) -> None:
                # FIRST / AFTER x reorder (MemoryTableMeta preserves MySQL
                # column order — row-image decode depends on it)
                if position == ("first",):
                    i = 0
                elif position and position[0] == "after":
                    i = cols.index(position[1]) + 1
                else:
                    i = len(cols)
                cols.insert(i, name)
                types.insert(i, mysql_type)
                origins.insert(i, origin if origin is not None
                               else f"{name}@{tso}")

            if op == "add_column":
                _insert_at(ddl["column"], ddl.get("mysql_type", ""), ddl.get("position"))
            elif op == "drop_column":
                i = cols.index(ddl["column"])
                del cols[i], types[i], origins[i]
            elif op == "rename_column":
                i = cols.index(ddl["from"])
                name, mysql_type = ddl["to"], ddl.get("mysql_type") or types[i]
                origin = origins[i]  # lineage survives the rename
                if ddl.get("position"):
                    del cols[i], types[i], origins[i]
                    _insert_at(name, mysql_type, ddl["position"], origin)
                else:
                    cols[i], types[i] = name, mysql_type
            elif op == "modify_column":
                i = cols.index(ddl["column"])
                name, mysql_type = cols[i], ddl["mysql_type"]
                origin = origins[i]
                if ddl.get("position"):
                    del cols[i], types[i], origins[i]
                    _insert_at(name, mysql_type, ddl["position"], origin)
                else:
                    types[i] = mysql_type
            else:
                raise ValueError(f"unknown ddl op {op}")
            live = set(cols)
            renames = (
                {ddl["from"]: ddl["to"]} if op == "rename_column" else {}
            )
            uqs2 = []
            for n, cs in cur.uniques:
                cs2 = tuple(
                    renames.get(c, c) for c in cs
                    if renames.get(c, c) in live
                )
                if cs2:  # a key whose every column is gone disappears
                    uqs2.append((renames.get(n, n), cs2))
            # key metadata follows column renames/drops the way the
            # server rewrites index definitions (a key loses a dropped
            # column; an all-columns-gone key disappears)
            pks2 = tuple(
                renames.get(c, c) for c in cur.pks
                if renames.get(c, c) in live
            )
            new = TableSchema(
                tuple(cols), pks2, cur.hidden_pks,
                tuple(types) if any(types) else (),
                tuple(origins),
                pk_prefixes=tuple(
                    (renames.get(c, c), n) for c, n in cur.pk_prefixes
                    if renames.get(c, c) in live
                ),
                uniques=tuple(uqs2),
            )
        hist.tsos.append(tso)
        hist.schemas.append(new)

    # -- TableMetaTSDB.apply(position, ddl-text) ----------------------------
    def apply_sql(self, tso: str, sql: str, default_db: str | None = None) -> None:
        """Apply a raw MySQL DDL statement — or a multi-statement
        ``;``-separated script — at a TSO (the QUERY-event path:
        QueryEventReformator → TableMetaTSDB.apply). Multi-action ALTERs
        and multi-statement scripts apply left-to-right at the same
        position."""
        from polardbx_cdc_spark.ddl import parse_ddl_script

        for i, op in enumerate(parse_ddl_script(sql, default_db)):
            # sub-operations of one statement version at tso, tso+1, ... so
            # intra-statement order is preserved under the strictly-
            # increasing-TSO rule (sub-suffix stays within the same second)
            sub_tso = tso if i == 0 else f"{tso}{i:02d}"
            self.apply(sub_tso, op["db"], op["tbl"], op)

    # -- TableMetaTSDB.find(schema, table) at a position --------------------
    def find(self, db: str, tbl: str, tso: str) -> TableSchema | None:
        """Schema in effect at ``tso`` (latest version with tso <= arg)."""
        hist = self._tables.get((db, tbl))
        if hist is None:
            return None
        i = bisect.bisect_right(hist.tsos, tso) - 1
        if i < 0:
            return None
        s = hist.schemas[i]
        return s if s.columns else None

    # -- TableMetaTSDB.rollback(position) -----------------------------------
    def rollback(self, tso: str) -> None:
        """Discard every version after ``tso`` (recover to a position)."""
        for hist in self._tables.values():
            i = bisect.bisect_right(hist.tsos, tso)
            del hist.tsos[i:]
            del hist.schemas[i:]
        self._tables = {k: h for k, h in self._tables.items() if h.tsos}

    def version_intervals(self) -> list[tuple[str, str, str, str | None, list[str]]]:
        """Every schema version as a half-open TSO interval:
        ``(db, tbl, from_tso, to_tso|None, visible_columns)`` — the
        broadcastable form of the registry for per-event resolution."""
        out = []
        for (db, tbl), hist in self._tables.items():
            for i, (tso, schema) in enumerate(zip(hist.tsos, hist.schemas)):
                to = hist.tsos[i + 1] if i + 1 < len(hist.tsos) else None
                keep = [c for c in schema.columns if c not in schema.hidden_pks]
                out.append((db, tbl, tso, to, keep))
        return out

    # -- TableMetaTSDB.snapshot() -------------------------------------------
    # -- durable meta store (TableMetaTSDB persists snapshots + DDL
    # history to MetaDB so a restarted task rebuilds without re-reading
    # the whole binlog; PolarDbXTableMetaManager applySnapshot/
    # applyHistory) -------------------------------------------------------
    def save(self, path: str) -> None:
        """Serialize the full version history atomically (tmp + rename).
        The artifact is the registry's complete state: a restarted task
        loads it and continues applying DDL from the saved high-water
        TSO instead of replaying history."""
        import json
        import os

        doc = {
            "databases": sorted(self._databases),
            "tables": [
                {
                    "db": db,
                    "tbl": tbl,
                    "versions": [
                        {
                            "tso": t,
                            "columns": list(s.columns),
                            "pks": list(s.pks),
                            "hidden_pks": list(s.hidden_pks),
                            "types": list(s.types),
                            "origins": list(s.origins),
                            "pk_prefixes": [list(p) for p in s.pk_prefixes],
                            "uniques": [
                                [n, list(cs)] for n, cs in s.uniques
                            ],
                        }
                        for t, s in zip(h.tsos, h.schemas)
                    ],
                }
                for (db, tbl), h in sorted(self._tables.items())
            ],
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        import json

        with open(path) as fh:
            doc = json.load(fh)
        reg = cls()
        reg._databases = set(doc.get("databases", []))
        for t in doc["tables"]:
            h = _TableHistory()
            for v in t["versions"]:
                h.tsos.append(v["tso"])
                h.schemas.append(
                    TableSchema(
                        columns=tuple(v["columns"]),
                        pks=tuple(v["pks"]),
                        hidden_pks=tuple(v["hidden_pks"]),
                        types=tuple(v["types"]),
                        # absent on pre-round-10 snapshots: name fallback
                        origins=tuple(v.get("origins", ())),
                        pk_prefixes=tuple(
                            (c, int(n)) for c, n in v.get("pk_prefixes", ())
                        ),
                        uniques=tuple(
                            (n, tuple(cs)) for n, cs in v.get("uniques", ())
                        ),
                    )
                )
            reg._tables[(t["db"], t["tbl"])] = h
        return reg

    def high_water(self) -> str:
        """Highest applied TSO — where a restarted task resumes DDL
        application from."""
        return max((h.tsos[-1] for h in self._tables.values() if h.tsos), default="")

    def snapshot(self, tso: str | None = None) -> dict[tuple[str, str], TableSchema]:
        """All live tables (optionally as of a TSO)."""
        out: dict[tuple[str, str], TableSchema] = {}
        for (db, tbl), hist in self._tables.items():
            s = (
                self.find(db, tbl, tso)
                if tso is not None
                else (hist.schemas[-1] if hist.schemas else None)
            )
            if s is not None and s.columns:
                out[(db, tbl)] = s
        return out


@dataclass
class LogicalTopology:
    """Physical→logical table mapping (the sharded-table topology that the
    rebuild projection collapses — RebuildEventLogFilter.java:87-190)."""

    #: physical "db.tbl" -> logical (db, tbl)
    phys_to_logic: dict[str, tuple[str, str]] = field(default_factory=dict)

    def add_shards(self, logic_db: str, logic_tbl: str, shards: list[str]) -> None:
        for s in shards:
            self.phys_to_logic[s] = (logic_db, logic_tbl)


def typed_images(df, column_types: dict[str, str], image_col: str = "after"):
    """Type the string-transported image map into a typed struct
    (§1.2: the reference transports MySQL-serialized values and types them
    at apply time — rpl/extractor/LogEventConvert.java:180-226).

    ``column_types``: column → MySQL type declaration. Output adds
    ``{image_col}_typed`` struct with faithful Spark types (unsigned
    widening, decimal fidelity, zone-less datetime, …)."""
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.types import mysql_cast

    fields = [
        mysql_cast(F.col(image_col).getItem(name), mysql_t).alias(name)
        for name, mysql_t in column_types.items()
    ]
    return df.withColumn(f"{image_col}_typed", F.struct(*fields))


def rebuild_events(df, topo: LogicalTopology, registry: SchemaRegistry, at_tso: str):
    """The central physical→logical projection (SURVEY §2.3 'rebuild'):
    map physical table names to logical ones, prune the after/before images
    to the logical column set at ``at_tso``, drop hidden PKs.

    Scale shape: the topology and registry ship as BROADCAST mapping
    DataFrames (one hash-lookup per row) rather than a folded per-table
    CASE chain — at 10k logical tables a CASE chain explodes the
    expression tree and codegen, while a broadcast join stays O(1) in plan
    size and O(#tables) only in broadcast payload. No shuffle either way.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    out = df.withColumn("_full", F.concat_ws(".", F.col("db"), F.col("tbl")))
    if topo.phys_to_logic:
        topo_map = spark.createDataFrame(
            [(p, d, t) for p, (d, t) in topo.phys_to_logic.items()],
            "_full string, _to_db string, _to_tbl string",
        )
        out = out.join(F.broadcast(topo_map), "_full", "left")
    else:
        out = out.withColumn("_to_db", F.lit(None).cast("string")).withColumn(
            "_to_tbl", F.lit(None).cast("string")
        )
    out = (
        out.withColumn("logical_db", F.coalesce("_to_db", "db"))
        .withColumn("logical_tbl", F.coalesce("_to_tbl", "tbl"))
        .drop("_full", "_to_db", "_to_tbl")
    )

    # column prune per logical table: keep only registry columns minus
    # hidden PKs (PolarDbXTableMetaManager.compare:246-262 hidden-PK drop).
    # Unregistered tables pass through unpruned (keep-list NULL).
    snap = registry.snapshot(at_tso)
    if snap and ("after" in df.columns or "before" in df.columns):
        keep_map = spark.createDataFrame(
            [
                (db, tbl, [c for c in s.columns if c not in s.hidden_pks])
                for (db, tbl), s in snap.items()
            ],
            "_kdb string, _ktbl string, _keep array<string>",
        )
        out = out.join(
            F.broadcast(keep_map),
            (F.col("logical_db") == F.col("_kdb"))
            & (F.col("logical_tbl") == F.col("_ktbl")),
            "left",
        )

        def prune(map_col):
            return F.when(F.col("_keep").isNull(), map_col).otherwise(
                F.map_filter(map_col, lambda k, _v: F.array_contains(F.col("_keep"), k))
            )

        if "after" in df.columns:
            out = out.withColumn("after", prune(F.col("after")))
        if "before" in df.columns:
            out = out.withColumn("before", prune(F.col("before")))
        out = out.drop("_kdb", "_ktbl", "_keep")
    return out


def rebuild_events_versioned(df, registry: SchemaRegistry):
    """Mid-stream DDL semantics: prune each event's images by the schema
    IN EFFECT AT THE EVENT'S OWN TSO (TableMetaTSDB.find(position) per
    event — the reference resolves metadata per binlog position, not per
    job). The registry's version intervals broadcast as a small mapping
    frame; each event range-joins to at most one version. Events of
    unregistered tables pass through unpruned.
    """
    from pyspark.sql import functions as F

    intervals = registry.version_intervals()
    if not intervals:
        return df
    spark = df.sparkSession
    vmap = spark.createDataFrame(
        intervals, "_vdb string, _vtbl string, _from string, _to string, _keep array<string>"
    )
    out = df.join(
        F.broadcast(vmap),
        (F.col("db") == F.col("_vdb"))
        & (F.col("tbl") == F.col("_vtbl"))
        & (F.col("tso") >= F.col("_from"))
        & (F.col("_to").isNull() | (F.col("tso") < F.col("_to"))),
        "left",
    )

    def prune(map_col):
        return F.when(F.col("_keep").isNull(), map_col).otherwise(
            F.map_filter(map_col, lambda k, _v: F.array_contains(F.col("_keep"), k))
        )

    if "after" in df.columns:
        out = out.withColumn("after", prune(F.col("after")))
    if "before" in df.columns:
        out = out.withColumn("before", prune(F.col("before")))
    return out.drop("_vdb", "_vtbl", "_from", "_to", "_keep")


def replay_wire_ddl(spark, wire_dir: str, registry: "SchemaRegistry | None" = None,
                    glob: str = "binlog.*") -> "SchemaRegistry":
    """Rebuild a :class:`SchemaRegistry` from the DDL QUERY events inside
    REAL wire binlog files — the LogDecoder ↔ MemoryTableMeta integration
    (the reference's decoder consults the meta's state per position;
    polardbx-cdc-canal MemoryTableMeta.apply on QUERY events). The scan
    and decode run distributed (``read_wire_binlog``); only the DDL rows
    come back to the driver — DDL is rare by construction, so the collect
    is bounded the way the reference's meta snapshot is.

    Positions: each DDL versions the registry at
    ``{file_seq:06d}{row_pos:012d}`` — zero-padded so registry string
    comparison equals replication order across the rotated chain. Use the
    same recipe to build an at-position key for ``find``/``typed
    decode``."""
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.binlog_wire import read_wire_binlog

    reg = registry if registry is not None else SchemaRegistry()
    rows = (
        read_wire_binlog(spark, wire_dir, glob)
        .filter(F.col("kind") == "DDL")
        .select("file_name", "pos", "db", "pk")
        .orderBy("file_name", "pos")
        .collect()
    )
    for r in rows:
        reg.apply_sql(wire_position_key(r["file_name"], r["pos"]), r["pk"],
                      default_db=r["db"] or None)
    return reg


def wire_position_key(file_name: str, pos: int) -> str:
    """(binlog file, event index) → the registry's sortable position key."""
    seq = file_name.rsplit(".", 1)[-1]
    return f"{int(seq):06d}{int(pos):012d}"
