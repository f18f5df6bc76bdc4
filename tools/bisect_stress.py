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


def _steal_ticks() -> int:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def main() -> None:
    names, sf_dir = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    base_dir = sys.argv[4] if len(sys.argv) > 4 else None
    spark = get_spark("bisect-stress")
    # comma-separated query list shares ONE fresh JVM (r13): the ~15s
    # session start dominated per-query subprocesses when the bench's
    # clean tranche ran 3+ probes against its wall budget
    for name in names.split(","):
        _probe(spark, name, sf_dir, n, base_dir)
    spark.stop()


def _probe(spark, name: str, sf_dir: str, n: int,
           base_dir: str | None) -> None:
    fn = Q.queries()[name]
    steal0 = _steal_ticks()
    fn(spark, sf_dir).count()  # warm-up: JIT + codegen + footers
    if base_dir:
        # PAIRED mode (r13, verdict ask #2): measure BOTH scales in the
        # same fresh JVM, interleaved, so the ratio divides like with
        # like — the mixed-JVM clean-sf1 / shared-sf0.1 arithmetic
        # manufactured the r11 "8.7" and r12 "7.8" outliers
        # (PERF_R12.md adjudication methodology, now the default).
        fn(spark, base_dir).count()  # warm the base side too
        runs, base_runs = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            fn(spark, base_dir).count()
            base_runs.append(round(time.perf_counter() - t0, 3))
        rec = {
            "query": name,
            "sf_dir": os.path.basename(sf_dir.rstrip("/")),
            "base_dir": os.path.basename(base_dir.rstrip("/")),
            "runs": runs,
            "base_runs": base_runs,
            "best": min(runs),
            "base_best": min(base_runs),
            "ratio_best": round(min(runs) / min(base_runs), 1),
            "steal_ticks": max(0, _steal_ticks() - steal0),
        }
    else:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        rec = {
            "query": name,
            "sf_dir": os.path.basename(sf_dir.rstrip("/")),
            "runs": runs,
            "best": min(runs),
            "median": sorted(runs)[len(runs) // 2],
            "steal_ticks": max(0, _steal_ticks() - steal0),
        }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
