"""Flashback / point-in-time recovery: inverse-operation transform.

Reference: RecoveryApplier (rpl/applier/RecoveryApplier.java:62-385) —
``reverseSQL`` (:371-385) turns each event into its inverse
(INSERT→DELETE, DELETE→INSERT, UPDATE→UPDATE with images swapped) and
emits them in reverse TSO order; ``mirrorSQL`` (:169) re-emits forward.
The recovery window filter is rpl/filter/RecoveryFilter.java.

Batch job over a TSO range: a projection + sort — no state, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polardbx_cdc_spark.operators.appliers import _sql_str

_INVERSE = {"INSERT": "DELETE", "DELETE": "INSERT", "UPDATE": "UPDATE"}


def inverse_events(df: DataFrame) -> DataFrame:
    """Invert each event (reverseSQL :371-385): swap action and before/after
    images; output ordered newest-first so applying top-down undoes history."""
    inv_action = (
        F.when(F.col("action") == "INSERT", F.lit("DELETE"))
        .when(F.col("action") == "DELETE", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    out = df.withColumn("inv_action", inv_action)
    if "before" in df.columns and "after" in df.columns:
        out = (
            out.withColumn("_b", F.col("after"))
            .withColumn("after", F.col("before"))
            .withColumn("before", F.col("_b"))
            .drop("_b")
        )
    return out.orderBy(F.desc("tso"))


def flashback_sql(df: DataFrame) -> DataFrame:
    """Render inverse events as SQL text (the reference emits executable SQL;
    RecoveryApplier.java:167-242). Images here carry the ``value`` payload.
    ``pk`` is string-typed in the CDC model, so it's rendered as an escaped
    SQL string literal (same quoting as appliers.render_dml) — unquoted
    interpolation would emit malformed/injectable SQL."""
    inv = inverse_events(df)
    pk_lit = _sql_str(F.col("pk"))
    stmt = (
        F.when(
            F.col("inv_action") == "DELETE",
            F.concat(
                F.lit("DELETE FROM "), F.col("db"), F.lit("."), F.col("tbl"),
                F.lit(" WHERE pk = "), pk_lit,
            ),
        )
        .when(
            F.col("inv_action") == "INSERT",
            F.concat(
                F.lit("INSERT INTO "), F.col("db"), F.lit("."), F.col("tbl"),
                F.lit(" (pk, value) VALUES ("), pk_lit, F.lit(", "),
                F.col("value").cast("string"), F.lit(")"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("UPDATE "), F.col("db"), F.lit("."), F.col("tbl"),
                F.lit(" SET value = "), F.col("value").cast("string"),
                F.lit(" WHERE pk = "), pk_lit,
            )
        )
    )
    return inv.select("tso", "db", "tbl", "pk", F.col("inv_action"), stmt.alias("sql_text"))
