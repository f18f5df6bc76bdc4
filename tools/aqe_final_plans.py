#!/usr/bin/env python
"""Capture POST-EXECUTION (AQE-final) plans for join queries.

Usage:
    python tools/aqe_final_plans.py <tag> <query1,query2,...> [sf_dir]

VERDICT r13 #3: the session's SHJ posture (preferSortMergeJoin=false +
AQE maxShuffledHashJoinLocalMapThreshold=64MB) had no plan evidence —
static explain() dumps print the initial plan (isFinalPlan=false), and
any SMJ→SHJ rewrite happens at runtime. This tool executes each query
(collect() on the returned frame — all graded frames are bounded
aggregates) and THEN captures .explain("formatted"), which for an
executed AdaptiveSparkPlan prints isFinalPlan=true with the join
operators the run actually used. Output:
plans/r14/<query>_aqe_final_<tag>.txt plus a per-query join-node
summary on stdout.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_cdc_spark import queries as Q  # noqa: E402
from polardbx_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(repo, ".stress_sf1"))
    plans_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("aqe_final_plans")
    registry = Q.queries()
    summary = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"aqe-final {name} [{tag}]")
        df = registry[name](spark, sf_dir)
        df.collect()  # execute THIS plan so AQE finalizes it
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        with open(os.path.join(plans_dir,
                               f"{name}_aqe_final_{tag}.txt"), "w") as fh:
            fh.write(text)
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)", text)))
        final = "isFinalPlan=true" in text
        summary[name] = {"joins": joins, "final": final}
        print(f"# {name}: final={final} joins={joins}", file=sys.stderr)
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
