#!/usr/bin/env python
"""Clean-JVM timing probe for the r4->r5 sf1 stress regressions.

Runs ONE query in a fresh SparkSession/JVM: warm-up run, then n timed
runs; prints a JSON line. Driven by tools/bisect_stress.sh-style loops:

    python tools/bisect_stress.py <query> <sf_dir> [n]

Purpose (VERDICT r5 "What's wrong" #1): q5_nation_revenue /
cdc_full_pipeline / cdc_txn_assemble showed 1.4-2.3x base+stress drift
between rounds 4 and 5 while the suspect commits were test-only. A
clean-JVM n>=3 measurement separates steady-state capability from the
57-query shared-JVM GC noise of the full bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_cdc_spark import queries as Q  # noqa: E402
from polardbx_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bisect-stress")
    fn = Q.queries()[name]
    fn(spark, sf_dir).count()  # warm-up: JIT + codegen + footers
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "query": name,
        "sf_dir": os.path.basename(sf_dir.rstrip("/")),
        "runs": runs,
        "best": min(runs),
        "median": sorted(runs)[len(runs) // 2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
