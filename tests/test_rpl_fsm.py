"""Drive the data-import FSM end-to-end on the local harness: full copy +
incremental apply, a corrupted replica caught by validation, repaired by
reconciliation, then a clean second validation → FINISHED."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.rpl_fsm import ImportStateMachine, State


def _stages(spark, corrupt: bool, fixable: bool = True):
    """Source = 200 pks with a value; CDC delta updates half and deletes a
    tenth; the replica write path optionally corrupts some rows."""
    src = spark.range(200).select(
        F.col("id").cast("string").alias("pk"), (F.col("id") * 10.0).alias("value")
    )
    delta = (
        spark.range(200)
        .where(F.col("id") % 2 == 0)
        .select(
            F.col("id").cast("string").alias("pk"),
            F.lpad(F.col("id").cast("string"), 48, "1").alias("tso"),
            F.when(F.col("id") % 10 == 0, "DELETE").otherwise("UPDATE").alias("action"),
            (F.col("id") * 10.0 + 1.0).alias("value"),
        )
    )

    def expected_df():
        from polardbx_cdc_spark.operators import apply as apply_ops

        return apply_ops.apply_to_snapshot(src, delta, keys=("pk",)).select("pk", "value")

    state: dict = {}

    def full_copy(ctx):
        ctx["replica"] = src
        return ctx

    def inc_copy(ctx):
        from polardbx_cdc_spark.operators import apply as apply_ops

        rep = apply_ops.apply_to_snapshot(ctx["replica"], delta, keys=("pk",)).select(
            "pk", "value"
        )
        if corrupt:  # a lossy/corrupting writer: drop one row, corrupt one
            rep = rep.where(F.col("pk") != "3").withColumn(
                "value", F.when(F.col("pk") == "5", F.col("value") + 99).otherwise(F.col("value"))
            )
        ctx["replica"] = rep.persist()
        return ctx

    def validate(ctx):
        from polardbx_cdc_spark.operators import validation

        diff = validation.checksum_diff(
            expected_df(), ctx["replica"], pk="pk", cols=["pk", "value"]
        )
        return diff.count()

    def reconcile(ctx):
        from polardbx_cdc_spark.operators import validation

        if not fixable:
            return ctx  # a no-op repairer: validation must keep failing
        cols = [("pk", F.col("pk")), ("value", F.format_string("%.6f", F.col("value")))]
        plan = validation.reconcile_repair(
            expected_df(), ctx["replica"], "replica", "pk", cols
        ).collect()
        # apply the plan semantically: REPLACE upserts the src image,
        # DELETE drops the orphan — here by rebuilding from the diff
        state["repair_plan"] = plan
        ctx["replica"] = expected_df().persist()
        return ctx

    return full_copy, inc_copy, validate, reconcile, state


def test_fsm_clean_import_skips_reconciliation(spark):
    fc, ic, va, re_, _ = _stages(spark, corrupt=False)
    m = ImportStateMachine(fc, ic, va, re_)
    ctx = m.run()
    assert ctx["state"] == State.FINISHED
    assert m.history == ["FULL_COPY", "INC_COPY", "CATCH_UP_VALIDATION", "FINISHED"]


def test_fsm_repairs_corruption_then_finishes(spark):
    fc, ic, va, re_, st = _stages(spark, corrupt=True)
    m = ImportStateMachine(fc, ic, va, re_)
    ctx = m.run()
    assert ctx["state"] == State.FINISHED
    assert m.history == [
        "FULL_COPY",
        "INC_COPY",
        "CATCH_UP_VALIDATION",
        "RECONCILIATION",
        "CATCH_UP_VALIDATION",
        "FINISHED",
    ]
    # the repair plan covered exactly the injected damage: missing pk 3,
    # corrupted pk 5 (REPLACE both)
    actions = {(r["pk"], r["action"]) for r in st["repair_plan"]}
    assert ("3", "REPLACE") in actions and ("5", "REPLACE") in actions


def test_fsm_gives_up_after_bounded_repairs(spark):
    fc, ic, va, re_, _ = _stages(spark, corrupt=True, fixable=False)
    m = ImportStateMachine(fc, ic, va, re_, max_repairs=2)
    with pytest.raises(RuntimeError, match="diverged"):
        m.run()
    assert m.history[-1] == "FAILED"
    assert m.history.count("RECONCILIATION") == 2
