"""Storage-layout strategies for the snapshot/state tables.

The reference's relay/state stores are RocksDB + files keyed by stream
(RelayFileStoreEngine / RocksDBStoreEngine); on Spark the equivalent
leverage is TABLE LAYOUT: bucketing co-locates join/merge keys so the
recurring joins (snapshot ⋈ CDC batch, src ⋈ dst validation) run with
ZERO exchange on the bucketed side, and partitioning prunes scans.

At 100 TB this is the difference between re-shuffling the full snapshot
every micro-batch and shuffling only the (small) incoming batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted) managed table. Joins/aggregations on
    ``bucket_cols`` against this table skip their exchange (and the sort,
    when ``sort_cols`` prefix-match)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]):
    """Join two tables bucketed on the same keys/count — no shuffle on
    either side (the plan shows zero Exchange under the join)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def zorder_expr(a: str, b: str, bits: int = 16) -> str:
    """SQL text for the Morton (Z-order) interleave of two non-negative
    integer columns — ``bits`` bits each, pure div/mod/multiply integer
    arithmetic so the SAME expression text runs on Spark and (with
    ``//`` for ``div``) DuckDB, bit-identically.

    Z-ordering is the layout move for multi-dimensional data skipping at
    100 TB: sort-by-zvalue before writing and every file's min/max spans
    a small RECTANGLE in (a, b) space, so predicates on EITHER dimension
    prune files — a single-column sort only prunes its own dimension
    (same layout trick Delta's OPTIMIZE ZORDER BY applies)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} div {1 << i}) % 2) * {4 ** i}")
        terms.append(f"(({b} div {1 << i}) % 2) * {2 * 4 ** i}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_oracle_expr(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_expr`` (``//`` floor division)."""
    return zorder_expr(a, b, bits).replace(" div ", " // ")
