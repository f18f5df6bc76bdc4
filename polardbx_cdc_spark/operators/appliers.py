"""Applier family: DML SQL rendering + foreachBatch writers.

Reference: rpl/applier/* (§2.11) — MysqlApplier (DML batch→SQL), ApplyHelper
(ApplyHelper.java:56-61,437,553-601: INSERT / REPLACE / UPDATE / DELETE /
INSERT…ON DUPLICATE KEY UPDATE rendering), TransactionApplier (txn
boundaries), Split/TableParallel (repartition), FlowLimiter/TPSLimiter.

The SQL rendering is a pure projection (testable without a database); the
execution side is a foreachBatch JDBC/MERGE writer — on a lakehouse the
same frame feeds ``MERGE INTO`` instead. Rate limiting maps to
``maxFilesPerTrigger`` / ``Trigger.ProcessingTime`` (configured at the
stream, not per-row — backpressure is the engine's job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sql_str(col: Column) -> Column:
    """SQL string literal with single-quote escaping (CommonUtils.escape)."""
    return F.concat(F.lit("'"), F.regexp_replace(col.cast("string"), "'", "''"), F.lit("'"))


def render_dml(df: DataFrame, insert_mode: str = "INSERT") -> DataFrame:
    """Render each collapsed op as executable downstream SQL
    (ApplyHelper.java:553-601). ``insert_mode``: INSERT | REPLACE |
    UPSERT (INSERT … ON DUPLICATE KEY UPDATE — the MergeApplier's
    INSERT_MODE_REPLACE family, MergeApplier.java:94)."""
    target = F.concat(F.col("db"), F.lit("."), F.col("tbl"))
    vals = F.concat(_sql_str(F.col("pk")), F.lit(", "), F.col("value").cast("string"))
    insert_head = {
        "INSERT": "INSERT INTO ",
        "REPLACE": "REPLACE INTO ",
        "UPSERT": "INSERT INTO ",
    }[insert_mode]
    insert_tail = (
        F.concat(F.lit(" ON DUPLICATE KEY UPDATE value = "), F.col("value").cast("string"))
        if insert_mode == "UPSERT"
        else F.lit("")
    )
    stmt = (
        F.when(
            F.col("op") == "DELETE",
            F.concat(F.lit("DELETE FROM "), target, F.lit(" WHERE pk = "), _sql_str(F.col("pk"))),
        )
        .when(
            F.col("op") == "INSERT",
            F.concat(
                F.lit(insert_head), target, F.lit(" (pk, value) VALUES ("), vals, F.lit(")"), insert_tail
            ),
        )
        .otherwise(
            F.concat(
                F.lit("UPDATE "), target,
                F.lit(" SET value = "), F.col("value").cast("string"),
                F.lit(" WHERE pk = "), _sql_str(F.col("pk")),
            )
        )
    )
    return df.withColumn("sql_text", stmt)


def table_parallel(df: DataFrame, num_partitions: int) -> DataFrame:
    """TableParallelApplier: one serial lane per table
    (TableParallelApplier.java) — repartition by (db, tbl)."""
    return df.repartition(num_partitions, "db", "tbl")


def txn_serial_batches(df: DataFrame) -> DataFrame:
    """TransactionApplier: preserve transaction boundaries — assign each txn
    a dense apply-order index by commit TSO; a writer executes groups in
    index order (TransactionApplier.java)."""
    from pyspark.sql import Window

    commit = df.groupBy("txn_id").agg(F.max("tso").alias("commit_tso"))
    ordered = commit.withColumn(
        "apply_order", F.dense_rank().over(Window.orderBy("commit_tso")).cast("long")
    )
    return df.join(ordered.select("txn_id", "apply_order"), "txn_id")
