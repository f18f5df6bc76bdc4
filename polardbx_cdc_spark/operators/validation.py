"""Validation: table checksums, chunked drill-down, full-copy planning.

Reference: the checksum oracle SQL
``SELECT BIT_XOR(CAST(CRC32(CONCAT_WS(',', cols…, CONCAT(ISNULL(c1),…))) AS UNSIGNED))``
(rpl/validation/ValSQLGenerator.java:75,125,188,222; same SQL in tests
polardbx-cdc-test/.../check/DataConsistencyTest.java:60-67), chunked
checksum + per-row drill-down (rpl/validation/TableValidator.java:65-198),
and min/max/count chunk planning (rpl/extractor/full/MysqlFullProcessor.java:234-244).

We keep the exact structure (row hash of concat_ws + null mask, XOR-folded —
XOR is commutative so the aggregate is order-independent) but use an
md5-prefix hash instead of CRC32 because the DuckDB oracle has no crc32.
bit_xor gets map-side partial aggregation: at 100 TB the checksum is one
scan + a tiny shuffle of per-partition XOR results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checksum(cols: list[str]) -> Column:
    """Per-row 32-bit checksum over ``cols`` + null mask
    (ValSQLGenerator.getChecksumSQL :125 shape)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    nullmask = F.concat(*[F.isnull(F.col(c)).cast("int").cast("string") for c in cols])
    payload = F.concat_ws(",", *parts, nullmask)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def oracle_row_checksum(cols: list[str]) -> str:
    """The identical per-row checksum in DuckDB SQL."""
    parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), '\\N')" for c in cols)
    nullmask = " || ".join(f"CAST(CAST({c} IS NULL AS INT) AS VARCHAR)" for c in cols)
    return (
        f"CAST(('0x' || substr(md5(concat_ws(',', {parts}, {nullmask})), 1, 8)) AS BIGINT)"
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Whole-table checksum: XOR-fold of row checksums + row count."""
    return df.select(row_checksum(cols).alias("_rc")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_rc)").alias("checksum"),
    )


def chunked_checksum(df: DataFrame, pk: str, chunk_size: int, cols: list[str]) -> DataFrame:
    """Per-PK-range chunk checksums (TableValidator.java:65-198). On mismatch
    the caller drills into the offending chunk row-by-row (``checksum_diff``)."""
    return (
        df.select(
            F.floor(F.col(pk) / F.lit(chunk_size)).alias("chunk_id"),
            row_checksum(cols).alias("_rc"),
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_rc)").alias("checksum"),
        )
        .orderBy("chunk_id")
    )


def checksum_diff(src: DataFrame, dst: DataFrame, pk: str, cols: list[str]) -> DataFrame:
    """Row-level drill-down (TableValidator.findDiffOneByOne): rows whose
    checksum differs or that exist on only one side. Both sides reduce to
    (pk, hash) projections before the full-outer join, so the shuffle moves
    two longs per row regardless of table width."""
    s = src.select(F.col(pk).alias("pk"), row_checksum(cols).alias("src_sum"))
    d = dst.select(F.col(pk).alias("pk"), row_checksum(cols).alias("dst_sum"))
    j = s.join(d, "pk", "full_outer")
    return j.filter(
        F.col("src_sum").isNull()
        | F.col("dst_sum").isNull()
        | (F.col("src_sum") != F.col("dst_sum"))
    )


def full_copy_chunks(df: DataFrame, pk: str, num_chunks: int) -> DataFrame:
    """Chunk planning for the initial full copy
    (MysqlFullProcessor.java:162-244): min/max/count then equal-width pk
    ranges. Returns one row per chunk with its bounds and actual row count.
    (On a real JDBC source this becomes partitionColumn/lower/upper/num.)"""
    b = df.agg(F.min(pk).alias("lo"), F.max(pk).alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])  # 2 planning scalars, not data
    width = max(1, (hi - lo + num_chunks) // num_chunks)
    chunk = F.least(
        F.floor((F.col(pk) - F.lit(lo)) / F.lit(width)), F.lit(num_chunks - 1)
    ).alias("chunk_id")
    return (
        df.groupBy(chunk)
        .agg(
            F.min(pk).alias("chunk_min"),
            F.max(pk).alias("chunk_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("chunk_id")
    )


def reconcile_repair(
    src: DataFrame,
    dst: DataFrame,
    table: str,
    pk: str,
    cols: list[tuple[str, Column]],
) -> DataFrame:
    """RECONCILIATION stage of the data-import FSM (rpl/common/fsmutil/
    DataImportTransitions.java:34-94 — validation feeds a repair pass):
    turn the row-level diff into executable repair DML against ``table``.

    - row missing or corrupt on dst → REPLACE INTO with the src image
      (insert-or-overwrite, ApplyHelper REPLACE mode semantics);
    - row present only on dst (orphan) → DELETE.

    ``cols`` is [(column_name, rendered_src_value_expr)] — values are
    pre-formatted strings (the caller fixes float formatting, %.6f rule).
    Both sides reduce to (pk, checksum[, rendered values]) projections
    before the full-outer join, so the shuffle carries the row image only
    for the src side; output is the (small) repair plan, never the table."""
    hash_cols = [c for c, _ in cols]
    # concat_ws silently SKIPS null elements — a NULL source value would
    # emit a REPLACE with fewer VALUES than columns. Render SQL NULL
    # explicitly so the statement stays positionally aligned.
    vals = F.concat_ws(", ", *[F.coalesce(v, F.lit("NULL")) for _, v in cols])
    s = src.select(
        F.col(pk).alias("pk"),
        row_checksum(hash_cols).alias("src_sum"),
        vals.alias("_vals"),
    )
    d = dst.select(F.col(pk).alias("pk"), row_checksum(hash_cols).alias("dst_sum"))
    j = s.join(d, "pk", "full_outer").filter(
        F.col("src_sum").isNull()
        | F.col("dst_sum").isNull()
        | (F.col("src_sum") != F.col("dst_sum"))
    )
    col_list = ", ".join(hash_cols)
    action = F.when(F.col("src_sum").isNull(), F.lit("DELETE")).otherwise(F.lit("REPLACE"))
    sql_text = F.when(
        F.col("src_sum").isNull(),
        F.concat(F.lit(f"DELETE FROM {table} WHERE {pk} = "), F.col("pk").cast("string")),
    ).otherwise(
        F.concat(
            F.lit(f"REPLACE INTO {table} ({col_list}) VALUES ("),
            F.col("_vals"),
            F.lit(")"),
        )
    )
    return j.select("pk", action.alias("action"), sql_text.alias("sql_text"))


def incremental_checksum(cdc: DataFrame, chunk_size: int = 64) -> DataFrame:
    """Continuous-validation checksum: maintain per-chunk table checksums
    from the CDC stream itself, without ever rescanning the table.

    XOR telescoping: model each event as (before_image, after_image) with
    ``after = NULL`` for DELETE and ``before`` = the previous event's
    after (true before-images on a real stream; reconstructed here with a
    per-pk lag so the DuckDB oracle can replay it). Each event contributes
    ``h(before) XOR h(after)`` with ``h(NULL) = 0``; XOR-folding the
    contributions of a pk's whole history collapses to ``h(last live
    image)`` — so the stream-folded checksum equals the checksum of the
    final table, chunk by chunk. That is the validation story at 100 TB:
    the delta is one map-side-combined XOR per micro-batch (associative,
    commutative, self-inverse), applied to bounded per-chunk state; the
    full-table rescan (TableValidator) is only the bootstrap.

    Emits per chunk: the stream-folded ``inc_checksum``, the directly
    recomputed ``direct_checksum`` of surviving last images (they must be
    equal — the query is self-validating), and ``n_live``."""
    from pyspark.sql import Window

    # %.6f-render the double image (cross-engine double→string rule)
    after = F.when(F.col("action") != "DELETE", F.format_string("%.6f", F.col("value")))
    w = Window.partitionBy("pk").orderBy("tso")
    ev = cdc.select(
        "pk",
        "tso",
        F.expr(f"cast(pk as bigint) div {chunk_size}").alias("chunk_id"),
        after.alias("after_img"),
    ).withColumn("before_img", F.lag("after_img").over(w))

    def h_img(col):
        return F.when(col.isNull(), F.lit(0)).otherwise(
            F.conv(F.substring(F.md5(F.concat_ws(",", F.col("pk"), col)), 1, 8), 16, 10)
        ).cast("long")

    contrib = ev.select(
        "chunk_id",
        "pk",
        "after_img",
        "tso",
        h_img(F.col("before_img")).bitwiseXOR(h_img(F.col("after_img"))).alias("delta"),
    )
    inc = contrib.groupBy("chunk_id").agg(F.expr("bit_xor(delta)").alias("inc_checksum"))

    last = (
        contrib.withColumn(
            "rn", F.row_number().over(Window.partitionBy("pk").orderBy(F.desc("tso")))
        )
        .where((F.col("rn") == 1) & F.col("after_img").isNotNull())
        .select("chunk_id", "pk", "after_img")
    )
    direct = last.groupBy("chunk_id").agg(
        F.expr(
            "bit_xor(cast(conv(substring(md5(concat_ws(',', pk, after_img)), 1, 8), 16, 10) as long))"
        ).alias("direct_checksum"),
        F.count(F.lit(1)).cast("long").alias("n_live"),
    )
    return (
        inc.join(direct, "chunk_id", "full_outer")
        .select(
            "chunk_id",
            F.coalesce("inc_checksum", F.lit(0)).cast("long").alias("inc_checksum"),
            F.coalesce("direct_checksum", F.lit(0)).cast("long").alias("direct_checksum"),
            F.coalesce("n_live", F.lit(0)).cast("long").alias("n_live"),
        )
        .orderBy("chunk_id")
    )


def checksum_delta(batch: DataFrame, chunk_size: int = 64) -> DataFrame:
    """Streaming form of :func:`incremental_checksum`: one micro-batch of
    events carrying TRUE before/after images (columns ``pk``,
    ``before_img``, ``after_img`` — what a real CDC feed delivers) →
    per-chunk XOR delta. foreachBatch XORs the delta into the running
    per-chunk state; order between batches does not matter (XOR is
    commutative/associative), so retries and re-ordered lanes fold to the
    same state. One map-side-combined aggregate per batch."""
    def h_img(col):
        return F.when(col.isNull(), F.lit(0)).otherwise(
            F.conv(F.substring(F.md5(F.concat_ws(",", F.col("pk"), col)), 1, 8), 16, 10)
        ).cast("long")

    return (
        batch.select(
            F.expr(f"cast(pk as bigint) div {chunk_size}").alias("chunk_id"),
            h_img(F.col("before_img")).bitwiseXOR(h_img(F.col("after_img"))).alias("delta"),
        )
        .groupBy("chunk_id")
        .agg(F.expr("bit_xor(delta)").alias("delta"))
    )
