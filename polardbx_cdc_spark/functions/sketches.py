"""Distributed probabilistic sketches: HyperLogLog registers and Count-Min.

At 100 TB, "how many distinct keys" and "which keys are hot" are the two
questions every pipeline stage asks before committing to a plan (dedup
band sizing, skew-salting decisions, routing rebalance — the reference
reports exact stream metrics per task, polardbx-cdc-monitor/…/
StatMetrics, which stops being computable exactly once the key space no
longer fits a hash table). Sketches answer both in one
map-side-combining aggregation whose state is CONSTANT-size:

- HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
  analysis of a near-optimal cardinality estimation algorithm", AofA
  2007): m=256 registers, ±~6.5% standard error at any cardinality.
- Count-Min (Cormode & Muthukrishnan, "An improved data stream summary:
  the count-min sketch and its applications", J. Algorithms 2005): d=4 ×
  w=256 counters, point-query overestimate ≤ 2n/w with prob 1-2^-4.

Both are mergeable monoids (register-wise max / cell-wise sum), so they
compose with Spark's partial aggregation: every partition collapses to
≤256 (HLL) / ≤1024 (CM) rows map-side and the shuffle moves only sketch
state, never data — the property that makes them THE scale path where
``count(distinct)`` would shuffle every key.

Cross-engine determinism: hashes are the repo-standard md5-prefix family
(queries.py docstring) — bucket = first 2 md5 hex chars, HLL payload =
next 15 hex chars (60 bits, fits signed 64), so the DuckDB oracle
replays registers and estimates BIT-EXACTLY; the estimator itself is
fixed-point integer arithmetic (no float division to split engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: HLL geometry: m = 2^8 registers; rho ranges 1..61 (60 payload bits,
#: rho = leading zeros + 1; all-zero payload convention rho = 61).
HLL_M = 256
_RHO_ZERO = 61
#: alpha_256 = 0.7213/(1 + 1.079/256) ≈ 0.71827, scaled by 2^12.
_ALPHA_Q12 = 2942
#: fixed-point scale for the harmonic sum: term_j = 2^(54 - min(rho_j, 54)).
#: 54 keeps the worst-case sum (256 empty buckets · 2^54 = 2^62) inside
#: int64; truncating rho > 54 terms to 0 is a < 2^-54 relative error.
_S_SHIFT = 54

#: Count-Min geometry: d=4 salted hash rows × w=256 columns.
CM_D = 4
CM_W = 256


def _hex_bucket(h: Column) -> Column:
    """First 2 md5 hex chars → 0..255 (both the HLL bucket and the CM
    column index)."""
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """HLL register table for the distinct count of ``col``:
    (bucket 0..255, max_rho 1..61), non-empty buckets only.

    ONE aggregation with map-side combine: every partition reduces to at
    most 256 rows before the shuffle, so cost is a scan + a 256-group
    agg regardless of input size or key cardinality. Registers are
    mergeable across tables/days/streams with a further ``max`` —
    the cheap union the exact ``count(distinct)`` can never have."""
    h = F.md5(F.col(col).cast("string"))
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == F.lit(0), F.lit(_RHO_ZERO)).otherwise(
        F.lit(_RHO_ZERO) - F.length(F.bin(w))
    )
    return (
        df.select(_hex_bucket(h).alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Raw HLL estimator over a register table, in pure int64 fixed-point:

        E = alpha_m · m² / Σ_j 2^(-rho_j)      (empty buckets: rho = 0)

    computed as ``(ALPHA_Q12 · m² · 2^30) div (2^12 · (S_fixed div 2^24))``
    with ``S_fixed = Σ 2^(54 - min(rho, 54))`` — floor division on positive
    operands only, so Spark and DuckDB produce the identical bit pattern
    (the round-4 trap list: float division is never cross-engine-stable).
    Raw-regime estimator (n ≳ 2.5 m); the small-range linear-counting
    switch is deliberately out of scope and documented here.
    Output: one row (est_distinct bigint)."""
    return hll_estimate_by(registers, ())


def hll_estimate_by(registers: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """Grouped form of ``hll_estimate``: one estimate per group over a
    register table carrying ``group_cols`` (e.g. per-column NDV from a
    melted multi-column register build). Same fixed-point arithmetic."""
    term = F.when(
        F.col("max_rho") <= F.lit(_S_SHIFT),
        F.expr(f"shiftleft(cast(1 as bigint), {_S_SHIFT} - max_rho)"),
    ).otherwise(F.lit(0).cast("long"))
    gb = registers.groupBy(*group_cols) if group_cols else registers.groupBy()
    agg = gb.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.coalesce(F.sum(term), F.lit(0).cast("long")).alias("s_present"),
    )
    s_fixed = (
        (F.lit(HLL_M).cast("long") - F.col("n_present"))
        * F.lit(1 << _S_SHIFT).cast("long")
        + F.col("s_present")
    )
    num = F.lit(_ALPHA_Q12 * HLL_M * HLL_M * (1 << 30)).cast("long")
    s_r = F.greatest(
        F.expr(f"_s div {1 << 24}").cast("long"), F.lit(1).cast("long")
    )
    return (
        agg.select(*group_cols, s_fixed.alias("_s"))
        .select(*group_cols, (num).alias("_num"), s_r.alias("_sr"))
        .select(*group_cols, F.expr(f"_num div ({1 << 12} * _sr)").alias("est_distinct"))
    )


def analyze_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style per-column statistics in TWO passes total, however
    many columns: pass 1 is one aggregate row (count / nulls / typed
    min-max rendered to strings), pass 2 melts the columns into
    (col_name, value) rows and builds ALL per-column HLL register sets in
    one map-side-combining aggregation (≤ cols·256 groups) — the
    optimizer-stats collection a 100 TB ANALYZE runs, never one scan per
    column. NDV is the fixed-point HLL estimate (hash-exact cross-engine);
    every value hashes via its cast-to-string rendering, so callers pass
    columns with engine-stable renderings (ints, strings, dates).
    Output: (col_name, n, n_null, ndv_est, min_v, max_v)."""
    base = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[
            e
            for c in cols
            for e in (
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"_null_{c}"),
                F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            )
        ],
    )
    per_col = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("_n").alias("n"),
                        F.col(f"_null_{c}").alias("n_null"),
                        F.col(f"_min_{c}").alias("min_v"),
                        F.col(f"_max_{c}").alias("max_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.*").filter(F.col("v").isNotNull())
    h = F.md5(F.col("v"))
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == F.lit(0), F.lit(_RHO_ZERO)).otherwise(
        F.lit(_RHO_ZERO) - F.length(F.bin(w))
    )
    regs = (
        melted.select("col_name", _hex_bucket(h).alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("col_name", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    ndv = hll_estimate_by(regs, ("col_name",)).withColumnRenamed(
        "est_distinct", "ndv_est"
    )
    return per_col.join(ndv, "col_name").select(
        "col_name", "n", "n_null", "ndv_est", "min_v", "max_v"
    )


def cm_sketch(df: DataFrame, col: str) -> DataFrame:
    """Count-Min table for occurrence counts of ``col``:
    (row_id 0..3, col_id 0..255, cnt).

    The d salted hashes explode each input row into d (row, col) pairs,
    then ONE aggregation with map-side combine collapses every partition
    to ≤ d·w rows pre-shuffle. Sketches merge by cell-wise sum."""
    key = F.col(col).cast("string")
    coords = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_id"),
                _hex_bucket(F.md5(F.concat(F.lit(f"{r}:"), key))).alias("col_id"),
            )
            for r in range(CM_D)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .select("c.row_id", "c.col_id")
        .groupBy("row_id", "col_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_point_estimates(sketch: DataFrame, keys: DataFrame, col: str) -> DataFrame:
    """Point-query the sketch for each key in ``keys[col]``:
    est = min over the d rows of the addressed cell (the classic CM upper
    bound — never undercounts, overcounts by colliding keys only).

    The sketch (≤ d·w rows) BROADCASTS; per key the work is d lookups,
    so estimating any number of keys costs one map-side join — no
    re-scan of the sketched data. Output: (col, est bigint)."""
    key = F.col(col).cast("string")
    coords = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        _hex_bucket(F.md5(F.concat(F.lit(f"{r}:"), key))).alias(
                            "col_id"
                        ),
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("c"),
    ).select(F.col(col), "c.row_id", "c.col_id")
    joined = coords.join(F.broadcast(sketch), ["row_id", "col_id"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def hist_quantiles(
    df: DataFrame,
    cents_col: Column,
    probs_bp: list[int],
    shift: int = 16,
) -> DataFrame:
    """Mergeable histogram quantiles in pure integer arithmetic: bucket
    non-negative integer values by ``value >> shift`` (equi-width,
    power-of-two buckets), then answer each quantile as the upper edge of
    the first bucket whose cumulative count reaches rank
    ``k = max(1, (q_bp · n) div 10000)``.

    This is the quantile sketch that composes with Spark the same way the
    HLL/CM tables do: the bucket histogram is a map-side-combining
    aggregation whose state is bounded by the VALUE DOMAIN (domain/2^shift
    rows), not the row count, and histograms merge by cell-wise sum across
    shards/days. Guaranteed error ≤ one bucket width (2^shift), traded
    against state size via ``shift`` — the classic equi-width bound, vs
    GK/KLL's rank guarantees (Spark's own ``approx_percentile``), which a
    cross-engine integer oracle cannot replay. Every step is int64
    floor-division / shift, so DuckDB reproduces the estimates bit-exactly.

    Output: (q_bp int, k bigint, est_cents bigint) — one row per
    requested quantile (basis points)."""
    buckets = df.select(cents_col.cast("long").alias("_c")).select(
        F.expr(f"_c div {1 << shift}").cast("long").alias("b")
    )
    hist = buckets.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative over the (domain-bounded, small) histogram — the window
    # runs over ≤ domain/2^shift rows, constant in input row count
    from pyspark.sql import Window

    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select("b", "cnt", F.sum("cnt").over(w).cast("long").alias("cum"))
    n = hist.agg(F.sum("cnt").cast("long").alias("n"))
    probs = df.sparkSession.createDataFrame([(p,) for p in probs_bp], "q_bp int")
    ranks = probs.crossJoin(F.broadcast(n)).select(
        "q_bp", F.expr("greatest((q_bp * n) div 10000, 1)").cast("long").alias("k")
    )
    # first bucket with cum >= k: min(b) over qualifying buckets
    hit = ranks.join(F.broadcast(cum), F.col("cum") >= F.col("k")).groupBy(
        "q_bp", "k"
    ).agg(F.min("b").alias("_b"))
    return hit.select(
        "q_bp", "k", F.expr(f"(_b + 1) * {1 << shift} - 1").cast("long").alias("est_cents")
    )


class StreamingDistinctMonitor:
    """Continuous cardinality monitoring as a ``foreachBatch`` sink: each
    micro-batch reduces to its ≤256-row HLL register table distributed-side,
    and the driver folds it into a running register set by register-wise
    max (the HLL merge law, pinned in tests/test_sketches.py).

    Driver state is EXACTLY 256 ints regardless of stream volume — the
    shape the reference's stream metrics watchdog needs ("how many
    distinct PKs has this table seen", polardbx-cdc monitoring surface)
    but computed without any per-key state store. The collect is
    sketch-sized, never data-sized."""

    def __init__(self, col: str) -> None:
        self.col = col
        self.registers: dict[int, int] = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        for r in hll_registers(batch_df, self.col).collect():
            b = int(r["bucket"])
            self.registers[b] = max(self.registers.get(b, 0), int(r["max_rho"]))

    def register_frame(self, spark) -> DataFrame:
        rows = sorted(self.registers.items())
        return spark.createDataFrame(
            [(b, r) for b, r in rows], "bucket int, max_rho int"
        )

    def estimate(self, spark) -> int:
        if not self.registers:
            return 0
        return int(
            hll_estimate(self.register_frame(spark)).collect()[0]["est_distinct"]
        )


#: Bloom geometry: m = 4096 bit positions, k = 4 salted hashes.
BLOOM_M = 4096
BLOOM_K = 4


def bloom_build(df: DataFrame, col: str, m_bits: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Bloom filter (Bloom, CACM 1970) as a distributed bit-position
    table: the k md5-salted hashes of every key mark their positions; the
    filter is the DISTINCT position set (≤ m rows however many keys go
    in). Merge across shards = union+distinct (bitwise OR).

    This is the sketch form of membership the exact broadcast
    decontaminate join (functions/curation.py) cannot keep at scale: a
    10^10-key benchmark set broadcasts as m bits here, with the classic
    no-false-negative guarantee and FPR ≈ (1-e^(-kn/m))^k.
    Output: (bit_pos int) — set positions only."""
    key = F.col(col).cast("string")
    positions = F.array(
        *[
            (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 8), 16, 10)
                .cast("long") % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )
    return (
        df.select(F.explode(positions).alias("bit_pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, probes: DataFrame, col: str, m_bits: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Probe membership: a key is ``maybe_in`` iff ALL k of its positions
    are set (no false negatives; false positives at the FPR). The bit
    table (≤ m rows) BROADCASTS — probing any number of keys is one
    map-side join over k·|probes| coordinate rows.
    Output: (col, maybe_in boolean)."""
    key = F.col(col).cast("string")
    positions = F.array(
        *[
            (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 8), 16, 10)
                .cast("long") % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )
    coords = probes.select(F.col(col), F.explode(positions).alias("bit_pos"))
    hit = coords.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit_pos", "left"
    )
    return hit.groupBy(col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == F.lit(k)).alias("maybe_in")
    )
