"""Canonical CDC event model — the spine of the engine.

Mirrors the reference's transaction-token + logical-row-change shape
(TxnToken: polardbx-cdc-protocol/src/main/proto/TxnStream.proto:95-135;
DefaultRowChange: polardbx-cdc-canal/.../binlog/dbms/DefaultRowChange.java:37-47):

    cdc(tso string, ts timestamp, txn_id long, seq long, source_id string,
        action string, db string, tbl string, pk string,
        before map<string,string>, after map<string,string>,
        changed array<string>)

The driver's ``events`` table is a generic app-event stream; we derive the
CDC stream from it **deterministically** so the DuckDB oracle can derive the
identical stream in pure SQL (see ``ORACLE_CDC_CTE``). Mapping:

- ``txn_id = event_id div 5``, ``seq = event_id % 5`` — groups of 5
  consecutive events form one transaction (exercises reassembly).
- ``source_id = 'dn-' || user_id % 4`` — 4 upstream DNs (exercises k-way merge).
- ``action``: signup → INSERT, error → DELETE, else UPDATE (DBMSAction.java:23).
- ``db = 'db' || user_id % 3``, ``tbl = 't' || user_id % 5`` — a small logical
  topology (exercises replica filters and hash routing).
- ``pk = user_id`` — the row identity (RowKey semantics, rpl/applier/RowKey.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polardbx_cdc_spark import tso as tso_mod
from polardbx_cdc_spark.session import load_table

#: Column order of the canonical stream (scalar columns first; the map/array
#: envelope columns last — query outputs project scalars so the oracle can
#: hash them).
CDC_COLUMNS = [
    "tso",
    "ts",
    "txn_id",
    "seq",
    "source_id",
    "action",
    "db",
    "tbl",
    "pk",
    "value",
    "props",
    "before",
    "after",
    "changed",
]


def derive_cdc_stream(spark: SparkSession, sf_dir: str, events: DataFrame | None = None) -> DataFrame:
    """events parquet → canonical CDC stream (deterministic, oracle-matched)."""
    from polardbx_cdc_spark.session import normalize_event_ts

    ev = events if events is not None else load_table(spark, sf_dir, "events")
    ev = normalize_event_ts(ev)
    txn_id = F.expr("event_id div 5").cast("long")
    seq = (F.col("event_id") % 5).cast("long")
    micros = F.unix_micros(F.col("ts"))
    action = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    df = ev.select(
        tso_mod.make_tso(micros, txn_id, seq).alias("tso"),
        F.col("ts"),
        txn_id.alias("txn_id"),
        seq.alias("seq"),
        F.concat(F.lit("dn-"), (F.col("user_id") % 4).cast("string")).alias("source_id"),
        action.alias("action"),
        F.concat(F.lit("db"), (F.col("user_id") % 3).cast("string")).alias("db"),
        F.concat(F.lit("t"), (F.col("user_id") % 5).cast("string")).alias("tbl"),
        F.col("user_id").cast("string").alias("pk"),
        F.col("value"),
        F.col("props"),
    )
    # before/after images + changed-column list (DefaultRowChange envelope).
    df = df.select(
        *[c for c in CDC_COLUMNS if c not in ("before", "after", "changed")],
        F.when(
            F.col("action").isin("UPDATE", "DELETE"),
            F.create_map(F.lit("value"), F.col("value").cast("string")),
        ).alias("before"),
        F.when(
            F.col("action").isin("INSERT", "UPDATE"),
            F.create_map(
                F.lit("value"),
                F.col("value").cast("string"),
                F.lit("props"),
                F.col("props"),
            ),
        ).alias("after"),
        F.when(F.col("action") == "UPDATE", F.array(F.lit("value"))).alias("changed"),
    )
    return df


#: DuckDB CTE producing the identical scalar columns from the ``events`` view.
#: (map/array envelope columns excluded — oracle comparisons use scalars.)
ORACLE_CDC_CTE = """
cdc AS (
  SELECT
    lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0')
      || lpad(CAST(event_id // 5 AS VARCHAR), 19, '0')
      || lpad(CAST(event_id % 5 AS VARCHAR), 10, '0') AS tso,
    ts,
    event_id // 5 AS txn_id,
    event_id % 5 AS seq,
    'dn-' || CAST(user_id % 4 AS VARCHAR) AS source_id,
    CASE WHEN event_type = 'signup' THEN 'INSERT'
         WHEN event_type = 'error' THEN 'DELETE'
         ELSE 'UPDATE' END AS action,
    'db' || CAST(user_id % 3 AS VARCHAR) AS db,
    't' || CAST(user_id % 5 AS VARCHAR) AS tbl,
    CAST(user_id AS VARCHAR) AS pk,
    value,
    props
  FROM events
)
""".strip()


def oracle_cdc_query(body_sql: str) -> str:
    """Wrap an oracle query body with the CDC-derivation CTE."""
    return f"WITH {ORACLE_CDC_CTE}\n{body_sql}"
