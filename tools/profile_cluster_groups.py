#!/usr/bin/env python
"""Clean-JVM stage profile for dedup_cluster_groups (VERDICT r6 ask #4).

Mirrors the committed LSH profile methodology: one fresh SparkSession,
warm-up pass, then n timed runs of each STAGE in isolation —

  banding    MinHash signatures → band keys → bucket join (candidate pairs)
  verify     true n-gram Jaccard over the candidate pairs
  components connected components over the verified pairs, plus an
             instrumented per-round contraction breakdown (large-star/
             small-star rounds vs the driver union-find finish)

Usage: python tools/profile_cluster_groups.py <sf_dir> [n]
Prints one JSON line per stage and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from polardbx_cdc_spark.functions import dedupe  # noqa: E402
from polardbx_cdc_spark.session import get_spark, load_table  # noqa: E402


def _timed(fn, n: int) -> list[float]:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.stress_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-cluster-groups")
    d = load_table(spark, sf_dir, "documents")

    # warm-up: full pipeline once (JIT + codegen + parquet footers)
    cands_w = dedupe.minhash_lsh_candidates(d, use_md5=True, max_bucket=1000)
    verified_w = dedupe.ngram_jaccard_pairs(d, cands_w).filter(
        F.col("jaccard_sim") >= 0.5
    )
    dedupe.connected_components(verified_w).count()

    out: dict = {"sf_dir": os.path.basename(sf_dir.rstrip("/")), "n": n}

    # stage 1: banding + bucket join → candidate pairs
    def banding():
        dedupe.minhash_lsh_candidates(d, use_md5=True, max_bucket=1000).count()

    out["banding"] = _timed(banding, n)

    # materialize candidates once so verify times ONLY the Jaccard stage
    cands = dedupe.minhash_lsh_candidates(
        d, use_md5=True, max_bucket=1000
    ).localCheckpoint(eager=True)
    out["n_candidates"] = cands.count()

    def verify():
        dedupe.ngram_jaccard_pairs(d, cands).filter(
            F.col("jaccard_sim") >= 0.5
        ).count()

    out["verify"] = _timed(verify, n)

    verified = (
        dedupe.ngram_jaccard_pairs(d, cands)
        .filter(F.col("jaccard_sim") >= 0.5)
        .localCheckpoint(eager=True)
    )
    out["n_verified_pairs"] = verified.count()

    def components():
        dedupe.connected_components(verified).count()

    out["components"] = _timed(components, n)

    # instrumented contraction: per-round edge counts + times on the pure
    # distributed path (driver_threshold=0 disables the union-find finish
    # so every round is visible), plus the hybrid's driver finish timing
    rounds = []
    idpairs = verified.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint(eager=True)
    edges = (
        idpairs.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    for r in range(20):
        t0 = time.perf_counter()
        new_edges = dedupe._small_star(
            dedupe._large_star(edges)
        ).localCheckpoint(eager=True)
        n_new = new_edges.count()
        changed = (
            new_edges.exceptAll(edges)
            .unionByName(edges.exceptAll(new_edges))
            .limit(1)
            .count()
        )
        rounds.append(
            {"round": r, "sec": round(time.perf_counter() - t0, 3),
             "edges_in": n_edges, "edges_out": n_new}
        )
        edges, n_edges = new_edges, n_new
        if changed == 0:
            break
    out["contraction_rounds"] = rounds

    t0 = time.perf_counter()
    dedupe._driver_components(edges).count()
    out["driver_finish_sec"] = round(time.perf_counter() - t0, 3)

    # full graded query, same JVM, for the headline comparison
    from polardbx_cdc_spark import queries as Q

    fn = Q.queries()["dedup_cluster_groups"]
    out["full_query"] = _timed(lambda: fn(spark, sf_dir).count(), n)

    out["summary"] = {
        k: min(out[k]) for k in ("banding", "verify", "components", "full_query")
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
