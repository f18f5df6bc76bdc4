"""One-shot driver-gate replica: vanilla SparkSession (no tuned confs),
sf0.01, every registry entry vs its DuckDB oracle. Mirrors what the
driver records in CORRECTNESS_r{N}.json, including the first-50 grading
window. Usage: python tests/driver_replica.py [sf_dir]"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_compare import compare, duck_connection  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # vanilla: exactly what the driver's harness builds — no engine confs
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-replica")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duck_connection(sf_dir)
    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, detail = compare(df, con, oracles[name])
                results[name] = {"ok": ok, "detail": detail if not ok else ""}
            else:
                n = df.count()
                results[name] = {"ok": n >= 0, "detail": f"rows_only:{n}"}
        except Exception:
            results[name] = {"ok": False, "detail": traceback.format_exc()[-800:]}
        results[name]["sec"] = round(time.time() - t0, 2)
        results[name]["graded"] = i < 50
        mark = "PASS" if results[name]["ok"] else "FAIL"
        print(f"[{i + 1:2d}/{len(qs)}] {mark} {name} ({results[name]['sec']}s)", flush=True)

    npass = sum(1 for r in results.values() if r["ok"])
    g = [r for r in list(results.values())[:50]]
    print(f"\nTOTAL {npass}/{len(results)} pass; graded window {sum(1 for r in g if r['ok'])}/50")
    for name, r in results.items():
        if not r["ok"]:
            print(f"\n--- {name} ---\n{r['detail'][:1500]}")
    with open("/tmp/driver_replica.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
