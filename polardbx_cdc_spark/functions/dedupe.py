"""Deduplication operators over ``documents``: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Built as Catalyst expressions (higher-order array functions — JVM-side, no
Python in the hot path). The scale path:

- exact: fingerprint → groupBy(fingerprint) — one shuffle of (64-bit, id).
- MinHash+LSH: shingles → K minhashes → B band keys → explode(B rows/doc)
  → groupBy(band key) — candidate pairs only ever meet inside a bucket, so
  the O(n²) comparison never materializes; per-bucket joins are local to a
  partition after one shuffle on the band key.
- SimHash: one projection to a 32-bit signature; near-dup = same signature
  (or banded signature pieces, same LSH trick).

Hashes are md5-prefix based so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polardbx_cdc_spark.functions.text import fingerprint, tokens


def _hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# MinHash universal-hash family: h_i(x) = (A[i]*base(x) + B[i]) mod P with
# base(x) = md5-prefix 32-bit. ONE md5 per shingle instead of K — the
# affine transforms are integer ops, exact in both Spark and DuckDB
# (base < 2^32, A,B < 2^30 → products < 2^62, no BIGINT overflow).
# P must be far SMALLER than the a*base product range so the mod wraps
# many times (~2^31 wraps here): with a near-range P (2^61-1 was the old
# choice) a*h+b < 2P wraps at most once, the map is piecewise
# order-preserving, every h_i picks the same min-base-hash shingle, and
# signatures collapse to a function of ONE shingle — measured 19x
# candidate inflation (8226 vs 435 pairs at sf0.1) from docs that merely
# share their minimum shingle.
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def _affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs from a fixed LCG — reproducible in SQL."""
    params, x = [], 88172645463325252
    for _ in range(num_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 62)
        a = (x >> 16) % (1 << 30) | 1  # odd, nonzero
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 62)
        b = (x >> 16) % (1 << 30)
        params.append((a, b))
    return params


def _md5_signature_udf(num_hashes: int, shingle_n: int):
    """Fused text → MinHash signature for the md5-affine (oracle) family,
    one Arrow batch at a time: tokenize, shingle, md5 base hash, K-affine
    running min — all in Python/numpy.

    Rationale: every JVM step of the expression form (shingle `transform`,
    md5 `transform`, affine `aggregate`/`zip_with`) is a higher-order
    function, which Catalyst interprets per element — measured ~0.9s for
    5k docs where this UDF takes ~0.02s/core. Semantics mirror the
    expression path and the DuckDB oracle exactly: trim spaces, lower,
    split on ASCII whitespace, word n-grams ([""] shingle for empty
    text), base = first 8 md5 hex digits, h_i = (a_i*base+b_i) mod P.
    The xxhash64 scale path stays all-JVM (native hash, no Arrow hop).
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = _affine_params(num_hashes)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]
    # Java/DuckDB \s is ASCII-only; Python \s would also eat unicode spaces
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    md5 = hashlib.md5
    n = shingle_n

    @pandas_udf(T.ArrayType(T.LongType()))
    def md5_signature(text):  # pd.Series[str] -> pd.Series[list[int]]
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = ws.split(t.lower().strip(" "))
            k = max(len(toks) - (n - 1), 1)
            base = np.fromiter(
                (
                    int.from_bytes(md5(" ".join(toks[i : i + n]).encode()).digest()[:4], "big")
                    for i in range(k)
                ),
                dtype=np.int64,
                count=k,
            )
            out.append(((A * base[None, :] + B) % MINHASH_P).min(axis=1).tolist())
        return pd.Series(out)

    return md5_signature


def _affine_min_udf(num_hashes: int):
    """Arrow-batched K-affine-min: given array<long> md5 base hashes per
    row, return the MinHash signature array<long> of length K.

    Per batch the base arrays are flattened once; sig[i] = min over the
    row's segment of (A[i]*h + B[i]) mod P falls out of one (K × flat)
    broadcasted multiply + ``np.minimum.reduceat`` over the row offsets.
    Flat work is chunked (~1M hashes) so peak memory stays ~K·chunk·8B
    (~128 MB at K=16) regardless of Arrow batch sizing. Exact integer
    semantics match the SQL oracle: products < 2^62 fit int64.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = _affine_params(num_hashes)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]
    empty_sig = [MINHASH_P] * num_hashes  # aggregate-over-[] identity

    @pandas_udf(T.ArrayType(T.LongType()))
    def affine_min(base):  # base: pd.Series of array<long> (no hints:
        # module-level `from __future__ import annotations` stringifies
        # them and breaks pandas_udf's type inference)
        rows = [
            None if b is None else np.asarray(b, dtype=np.int64) for b in base
        ]
        lens = np.array([0 if r is None else len(r) for r in rows], dtype=np.int64)
        out: list = [None] * len(rows)
        nonempty = [i for i, r in enumerate(rows) if r is not None and len(r)]
        for i, r in enumerate(rows):
            if r is not None and len(r) == 0:
                out[i] = empty_sig
        # chunk over whole rows so each segment stays within one reduceat
        target = 1_000_000
        start = 0
        while start < len(nonempty):
            end = start
            flat_n = 0
            while end < len(nonempty) and (flat_n == 0 or flat_n + lens[nonempty[end]] <= target):
                flat_n += lens[nonempty[end]]
                end += 1
            idx = nonempty[start:end]
            flat = np.concatenate([rows[i] for i in idx])
            offsets = np.zeros(len(idx), dtype=np.int64)
            if len(idx) > 1:
                np.cumsum(lens[idx][:-1], out=offsets[1:])
            hashed = (A * flat[None, :] + B) % MINHASH_P  # K × flat
            mins = np.minimum.reduceat(hashed, offsets, axis=1)  # K × rows
            for j, i in enumerate(idx):
                out[i] = mins[:, j].tolist()
            start = end
        return pd.Series(out)

    return affine_min


def chunk_span_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """SPAN-level exact dedup: fixed-width token chunks fingerprinted and
    grouped across the corpus — the chunk-granular approximation of
    substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better": repeated spans, not just whole-doc copies,
    drive memorization; chunk hashing is the linear-cost stand-in for
    their suffix-array exact-substring pass).

    Returns (chunk_hash, n_docs, n_occurrences, first_doc) for every
    chunk appearing in more than one document. One projection pass
    (tokenize + slice, all JVM) → explode (rows × docs/chunk_tokens,
    each row 2 longs wide) → ONE shuffle on the chunk hash with map-side
    partial aggregation. No joins, no candidate blowup: at 100 TB this
    is a straight hash-aggregate whose reduce side carries only
    distinct-chunk cardinality."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)),
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("chunk")
    ).select("id", _hash32(F.col("chunk")).alias("chunk_hash"))
    return (
        exploded.groupBy("chunk_hash")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _chunk_frame(df: DataFrame, text_col: str, id_col: str,
                 chunk_tokens: int) -> DataFrame:
    """(id, pos, chunk) rows: EXACT single-space tokenization sliced
    into ``chunk_tokens``-word chunks — all JVM (split + slice +
    concat_ws in whole-stage codegen). Shared by the batch rewrite and
    the streaming sink so both scrub identical chunk boundaries."""
    toks = F.split(F.col(text_col), " ", -1)
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunk_arr).alias("pos", "chunk"),
    )


def chunk_dedup_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """The REWRITE pass `chunk_span_dups` only reports on: remove every
    corpus-wide duplicated chunk except its FIRST occurrence (ordered by
    (id, chunk position)) and reassemble the scrubbed documents — the
    chunk-granular form of Lee et al.'s exact-substring scrub, which
    deletes repeated spans from the corpus rather than dropping whole
    documents.

    Split is EXACT single-space tokenization (no normalization): a
    document whose chunks all survive rebuilds to its original bytes,
    so the pass is lossless where nothing is duplicated.

    Returns (id, text [rebuilt], n_chunks, n_kept) — one row per input
    document; a document whose every chunk was scrubbed keeps an empty
    text. Plan shape: one projection pass builds the chunk array
    JVM-side (split + slice + concat_ws, whole-stage codegen), explode,
    then ONE map-side-combined aggregate (min first-occurrence per
    chunk) and a semi join back. The min-struct aggregate — not a
    row_number window — keeps a hot chunk (e.g. a boilerplate header
    repeated across half the corpus) as a combiner-friendly partial
    min instead of a single-partition sort."""
    chunks = _chunk_frame(df, text_col, id_col, chunk_tokens)
    first = chunks.groupBy("chunk").agg(
        F.min(F.struct("id", "pos")).alias("k")
    )
    kept = chunks.withColumn(
        "k", F.struct("id", "pos")
    ).join(first, ["chunk", "k"], "left_semi")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.ceil(
            F.size(F.split(F.col(text_col), " ", -1))
            / F.lit(float(chunk_tokens))
        ).cast("long").alias("n_chunks"),
    )
    return (
        base.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-identity dedup: normalize → fingerprint → keep the lowest
    id per fingerprint group. Returns (keeper id, group size)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (JVM-side: sequence + slice)."""
    toks = tokens(F.lower(text))
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def minhash_signature(
    text: Column, num_hashes: int = 16, shingle_n: int = 3, use_md5: bool = False
) -> Column:
    """MinHash signature: for seed i, min over shingles of hash(i, shingle).
    Returns array<long> of length ``num_hashes``. One projection, no shuffle.

    Both families share the same shape — ONE native base hash per shingle
    (xxhash64 masked to 32 bits, or the md5 prefix for oracle parity)
    followed by the K-affine running min as a numpy segment-reduction in
    an Arrow batch. Higher-order-function expressions are interpreted per
    element (never codegen'd), so the previous K × array_min(transform(
    xxhash64(i, s))) "scale path" walked the shingle array 16 times
    interpreted and measured SLOWER than the fused md5 path it was meant
    to beat; the K-affine family over a single 32-bit base (universal
    hashing, products < 2^62 — exact int64) keeps the per-shingle work
    native and the K-way min vectorized."""
    sh = shingles(text, shingle_n)
    if use_md5:
        base = F.transform(sh, lambda s: _hash32(s))
    else:
        base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(4294967296)))
    return _affine_min_udf(num_hashes)(base)


def _band_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    use_md5: bool,
) -> DataFrame:
    """Shared LSH banding stage: (id, band_idx, band_hash), one row per
    (doc, band). The candidate enumerator and the skew diagnostics both
    consume this frame, so bucket statistics measured by
    ``lsh_bucket_stats`` describe exactly the shuffle the dedup runs."""
    rows_per_band = num_hashes // bands
    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    # small parquet inputs arrive as 1 partition — spread the signature
    # computation across cores (at 100 TB the scan is already parallel).
    # localCheckpoint is load-bearing for PLAN size, not just reuse:
    # without it Catalyst's projection collapse inlines the K-hash
    # signature expression into every band key — a bands×num_hashes
    # expression-tree blowup whose codegen costs seconds of driver time
    # per action regardless of data size. The materialized frame is
    # compact (id + K longs per doc); at 100 TB this is the signature
    # staging table every production LSH pipeline writes anyway.
    if use_md5:
        # fused Arrow UDF: the md5 family's shingle+hash+affine-min would
        # otherwise run as interpreted higher-order functions (see
        # _md5_signature_udf docstring for the measured gap)
        sig_col = _md5_signature_udf(num_hashes, shingle_n)(F.col(text_col))
    else:
        sig_col = minhash_signature(F.col(text_col), num_hashes, shingle_n, False)
    # keyless round-robin KEPT here (r14 measured): these are small doc
    # frames (~5k rows) feeding a HEAVY per-doc Python/expr stage, where
    # round-robin's perfect balance beats a hash spread's +-8% partition
    # tails and the sort-before-repartition of one tiny input partition
    # costs ~nothing - alternating-JVM A/B read fan_out 5-25% SLOWER
    # (minhash best-of-3 1.97s vs 2.46s); at 100 TB the input arrives
    # already partitioned and this exchange should be dropped by the
    # caller, not keyed
    sig_df = df.repartition(n_part).select(
        F.col(id_col).alias("id"), sig_col.alias("sig")
    ).localCheckpoint(eager=True)

    def band_key(b: Column) -> Column:
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        return _hash32(joined) if use_md5 else F.xxhash64(joined)

    return sig_df.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band_idx", "band_hash"),
    )


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    use_md5: bool = False,
) -> DataFrame:
    """Skew diagnostics for the LSH band shuffle: one row with bucket-count,
    max bucket size, mean bucket size and worst-bucket ratio (max/mean —
    the reducer hot-spot factor) in exact integer millis, and the
    candidate-pair count the bucket distribution implies (sum of
    B·(B-1)/2). At 100 TB this is the health check run BEFORE committing
    to a dedup pass: a worst-bucket ratio in the thousands means a
    degenerate band (boilerplate-heavy corpus) and calls for
    ``max_bucket`` capping or more rows per band. All columns are integer
    math (floor-milli instead of float division) so the md5 mode is
    bit-reproducible by a SQL oracle."""
    sizes = (
        _band_frame(df, text_col, id_col, num_hashes, bands, shingle_n, use_md5)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum("sz").cast("long").alias("total_rows"),
            F.sum(F.expr("sz * (sz - 1) div 2")).cast("long").alias("implied_pairs"),
        )
        .select(
            "n_buckets",
            "max_bucket",
            "total_rows",
            F.expr("(1000 * total_rows) div n_buckets").cast("long").alias("mean_bucket_milli"),
            F.expr("(1000 * max_bucket * n_buckets) div total_rows")
            .cast("long")
            .alias("worst_ratio_milli"),
            "implied_pairs",
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    use_md5: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature, explode one row per
    band, bucket-group on (band_idx, band_hash). Output (id_a < id_b) pairs.

    At 100 TB: explode multiplies rows by B (cheap — 2 longs wide), the
    groupBy/band-key self-join shuffles on the band hash, and candidate
    verification (true Jaccard) runs only within buckets.

    ``use_md5`` switches both the signature hash and the band hash to the
    md5-prefix recipe (oracle-reproducible); default stays xxhash64.

    ``max_bucket`` bounds per-bucket fan-in: a bucket whose size exceeds
    the cap is re-salted by doc-id hash into ``ceil(size / cap)``
    sub-buckets BEFORE the collect, so (a) no reducer ever materializes
    more than ~cap ids and (b) no single key emits more than ~cap²/2
    candidate pairs. Without the guard an adversarial corpus (100k
    near-identical docs → one band bucket) implies ~5·10⁹ pairs from one
    key and an unbounded ``collect_list``. Splitting loses only the
    cross-sub-bucket pairs *within that one band*; duplicate pairs keep
    B−1 other independent bands plus the sub-bucket collision chance, and
    the downstream verify stage (true Jaccard) filters candidates either
    way — the ≥0.9 recall law is asserted on a 10k-identical-doc corpus
    in tests/test_dedup_recall.py. Same bounded-fan-in discipline as the
    reference's merge-group sizing
    (polardbx-cdc-format/.../MergeGroupFactory.java:28-87).
    """
    banded = _band_frame(df, text_col, id_col, num_hashes, bands, shingle_n, use_md5)
    # bucket-aggregate pair enumeration: ONE shuffle on the band key, then
    # per-bucket combinations JVM-side (sorted ids → id_a < id_b for free).
    # Beats a banded self-join (two shuffle reads + persist to avoid
    # recomputing signatures on both sides) and keeps a single lineage.
    # A bucket of size B yields B(B-1)/2 pairs under EITHER strategy —
    # that blowup is inherent to LSH; ``max_bucket`` bounds it.
    group_cols = ["band_idx", "band_hash"]
    if max_bucket is not None:
        # Bucket sizing WITHOUT a window pass (profiled r7: the count-over-
        # window needed a full exchange+sort of the banded frame, +17% on
        # the banding stage at sf1): aggregate per-bucket counts (map-side
        # combinable, so the shuffle carries one row per bucket, not per
        # member), keep only OVERSIZED buckets — ≤ rows/max_bucket of them
        # by construction — and join that small set back; AQE broadcasts
        # it in the common case, leaving the banded frame's single shuffle
        # to the groupBy below. Salt subdivides only oversized buckets
        # (no oversize → every sub_bucket is 0 → byte-identical output
        # for every corpus whose buckets fit the cap).
        oversized = (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select(
                "band_idx", "band_hash",
                F.ceil(F.col("_bn") / F.lit(max_bucket)).cast("long").alias("_n_sub"),
            )
        )
        banded = (
            banded.join(oversized, ["band_idx", "band_hash"], "left")
            .withColumn(
                "sub_bucket",
                F.when(F.col("_n_sub").isNull(), F.lit(0)).otherwise(
                    F.pmod(F.xxhash64(F.col("id")), F.col("_n_sub"))
                ),
            )
            .drop("_n_sub")
        )
        group_cols.append("sub_bucket")
    buckets = (
        banded.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    n = F.size(F.col("ids"))
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, n),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two string arrays (distinct-element semantics)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    union = F.size(F.array_union(da, db)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with true n-gram Jaccard. ``pairs`` has
    (id_a, id_b); output adds ``jaccard_sim``.

    Shingles are computed ONCE, and only for docs that appear in a
    candidate pair (semi-join prune): at 100 TB the candidate set is a
    tiny fraction of the corpus, so tokenizing both full-join sides
    independently would shingle the whole corpus twice for nothing. The
    staged (id, shingles) frame is materialized once and both join sides
    read it."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    pairs = pairs.localCheckpoint(eager=True)
    ids = (
        pairs.select(F.col("id_a").alias("_cid"))
        .unionByName(pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sh_df = (
        df.join(ids, df[id_col] == ids["_cid"], "left_semi")
        .repartition(n_part)  # round-robin kept: see sig_df note
        .select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
        .localCheckpoint(eager=True)
    )
    docs_a = sh_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    docs_b = sh_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(docs_a, "id_a")
        .join(docs_b, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard_sim"))
    )


def simhash(text: Column, bits: int = 32, shingle_n: int = 2, use_md5: bool = False) -> Column:
    """SimHash signature: sum ±1 per bit over shingle hashes, sign → bit.

    Single pass over the shingles: the aggregate accumulator is an int
    array of per-bit votes (zip_with merge), folded to a long at the end —
    one traversal instead of ``bits`` traversals. Default hash is xxhash64
    (native, fastest); ``use_md5`` switches to the md5-prefix recipe so a
    DuckDB oracle reproduces the signature bit-for-bit."""
    sh = shingles(text, shingle_n)
    hashed = F.transform(sh, (lambda s: _hash32(s)) if use_md5 else (lambda s: F.xxhash64(s)))
    zero = F.array(*[F.lit(0) for _ in range(bits)])

    def merge(acc: Column, h: Column) -> Column:
        votes = F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
                for b in range(bits)
            ]
        )
        return F.zip_with(acc, votes, lambda x, y: x + y)

    def finish(acc: Column) -> Column:
        sig = F.lit(0).cast("long")
        for b in range(bits):
            sig = sig + F.when(
                F.element_at(acc, b + 1) > 0, F.lit(2**b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return sig

    return F.aggregate(hashed, zero, merge, finish)


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", use_md5: bool = False
) -> DataFrame:
    """Group docs by SimHash signature; same-signature docs are near-dups."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n_part)  # round-robin kept: see minhash sig_df note
        .select(F.col(id_col), simhash(F.col(text_col), use_md5=use_md5).alias("sig"))
        .groupBy("sig")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    n_blocks: int = 4,
    max_hamming: int = 3,
    use_md5: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash NEAR-dup pairs at Hamming distance ≤ ``max_hamming`` — the
    Manku et al. (WWW'07) block-permutation technique: split the signature
    into ``n_blocks`` blocks; any pair within distance ``n_blocks - 1``
    differs in at most n_blocks-1 blocks, so it matches EXACTLY on at
    least one block → bucket by (block_idx, block_value), enumerate pairs
    inside buckets only, verify exact Hamming on the candidates. Requires
    ``max_hamming < n_blocks`` for completeness (pigeonhole).

    Same scale shape as the MinHash-LSH path: one signature projection
    (checkpointed — compact id+long frame), one shuffle on the block key,
    bucket-agg pair enumeration, id-keyed signature joins for the verify.
    ``use_md5`` makes every signature bit DuckDB-reproducible."""
    if max_hamming >= n_blocks:
        raise ValueError("completeness needs max_hamming < n_blocks")
    width = bits // n_blocks
    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    sig_df = (
        df.repartition(n_part)  # round-robin kept: see minhash sig_df note
        .select(
            F.col(id_col).alias("id"),
            simhash(F.col(text_col), bits=bits, use_md5=use_md5).alias("sig"),
        )
        .localCheckpoint(eager=True)
    )
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.shiftright(F.col("sig"), b * width).bitwiseAND(F.lit(mask))
            for b in range(n_blocks)
        ]
    )
    banded = sig_df.select("id", F.posexplode(blocks).alias("block_idx", "block_val"))
    buckets = (
        banded.groupBy("block_idx", "block_val")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    n = F.size(F.col("ids"))
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, n),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    sa = sig_df.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star step: every node connects its strictly-larger neighbors
    to the minimum of its closed neighborhood (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14)."""
    nbr = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = nbr.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        nbr.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star step: orient each edge larger→smaller; every node
    connects its smaller neighbors (and itself) to the minimum of them."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    linked = oriented.join(mins, "src")
    out = linked.select(F.col("dst").alias("src"), F.col("m").alias("dst")).unionByName(
        linked.select("src", F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _driver_components(idpairs: DataFrame) -> DataFrame:
    """Union-find over a BOUNDED, already-materialized pair set (the
    small-graph fast path of ``connected_components``). One collect of
    ≤ driver_threshold (src, dst) rows; output labels each vertex with
    its component minimum, identical to the distributed star contraction."""
    rows = idpairs.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r["src"], r["dst"]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    minlabel: dict = {}
    for v in parent:
        root = find(v)
        if root not in minlabel or v < minlabel[root]:
            minlabel[root] = v
    id_type = idpairs.schema["src"].dataType
    out_schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("cluster_id", id_type)]
    )
    data = [(v, minlabel[find(v)]) for v in parent]
    return idpairs.sparkSession.createDataFrame(data, out_schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Near-dup CLUSTER formation: connected components over candidate
    pairs — the step that turns pairwise matches into keep-one-per-group
    dedup decisions. Returns (id, cluster_id) with cluster_id = the
    component's minimum member id.

    Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14): each round is two join+groupBy passes and converges in
    O(log n) rounds even on adversarially long chains — unlike plain
    min-label propagation, which is O(component diameter). Each round's
    star steps reference the edge set several times, so the logical plan
    would grow EXPONENTIALLY across rounds if merely persisted (persist
    caches data but not the plan); ``localCheckpoint`` every round cuts
    lineage to the materialized edges — plan size stays constant per
    round. Convergence = the edge set reaches a fixed point (star forest:
    every node points at its component minimum).

    Pair sets at or below ``driver_threshold`` (bounded, a few MB at the
    default) finish with union-find on the driver instead: distributed
    star rounds cost several scheduled jobs each, pure overhead on a
    graph that fits in one collect. The SAME cutoff applies mid-flight:
    star rounds contract the edge set monotonically toward the star
    forest, so as soon as a round's output fits the threshold the
    remaining rounds are replaced by one local union-find — the local
    finish the MapReduce CC literature prescribes (Kiveris et al. §6:
    "once the graph fits in memory, finish on one machine"). Both steps
    preserve the component partition and never drop a non-minimum
    vertex from the edge set, so a union-find over any intermediate
    edge set labels every non-singleton vertex with the true component
    minimum. Pass ``driver_threshold=0`` to force the pure distributed
    path (tests do)."""
    # materialize the narrow (src, dst) projection ONCE — verts and edges
    # both derive from it, and ``pairs`` may sit atop an expensive pipeline
    # (e.g. the full MinHash-LSH + Jaccard verify) that must not re-run
    idpairs = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=True)
    if driver_threshold and idpairs.count() <= driver_threshold:
        return _driver_components(idpairs)
    verts = (
        idpairs.select(F.col("src").alias("id"))
        .unionByName(idpairs.select(F.col("dst").alias("id")))
        .distinct()
    )
    edges = (
        idpairs.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # the count is a cheap job over the just-materialized checkpoint;
        # contraction shrinks the edge set fast (typically one round cuts
        # a dup-heavy pair set well under the threshold), so the hybrid
        # finish usually replaces all but the first round
        if driver_threshold and new_edges.count() <= driver_threshold:
            local = _driver_components(new_edges)
            return verts.join(local, "id", "left").select(
                "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
            )
        # fixed point ⇔ same edge set; probe the symmetric difference in ONE
        # job (both frames are materialized, so each branch is a cached scan)
        changed = (
            new_edges.exceptAll(edges)
            .unionByName(edges.exceptAll(new_edges))
            .limit(1)
            .count()
        )
        edges = new_edges
        if changed == 0:
            break
    # converged star forest: src > dst and dst = component minimum
    star = edges.groupBy(F.col("src").alias("id")).agg(
        F.min("dst").alias("cluster_id")
    )
    return verts.join(star, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )


def drop_near_duplicates(
    df: DataFrame, labels: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Apply cluster labels to the corpus: keep each cluster's minimum
    member (its ``cluster_id``), drop every other member. The dropped set
    is ∝ duplicate count — typically a small fraction of the corpus — so
    this is a LEFT ANTI join against the small side: the corpus streams
    through unshuffled and Spark broadcasts the dropped ids when they fit
    (at 100 TB the corpus never moves; only drop-list lookups do)."""
    dropped = labels.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")


def streaming_exact_dedup(
    doc_stream: DataFrame,
    time_col: str,
    watermark: str = "1 hour",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on an unbounded document stream: fingerprint each doc
    and keep the FIRST arrival per fingerprint, dropping later duplicates
    that land within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by fingerprint only (8
    bytes + timestamp per distinct doc) and evicts state once the
    watermark passes — bounded memory on an infinite stream, unlike
    ``dropDuplicates`` whose state grows forever. At 100 TB/day this is
    the only viable shape: state ∝ distinct fingerprints per horizon, not
    corpus size. Duplicates farther apart than the horizon are left to the
    batch compaction pass (``exact_dedup`` over the landed corpus)."""
    fp = doc_stream.select(
        F.col(id_col),
        F.col(time_col),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    return fp.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(["fp"])


def streaming_near_dedup(
    doc_stream: DataFrame,
    time_col: str,
    watermark: str = "1 hour",
    window: str = "10 minutes",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-dup filtering on an unbounded stream — the streaming
    counterpart of MinHash-LSH: emit only documents whose signature
    matches nothing seen within the watermark horizon.

    Two chained stateful operators (Spark ≥3.5 watermark propagation):

    1. band the MinHash signature and ``dropDuplicatesWithinWatermark``
       on (band_idx, band_hash) — the FIRST arrival claims each bucket;
       state is one row per live band bucket, watermark-evicted.
    2. windowed count of surviving bands per doc — a doc whose ``bands``
       buckets were ALL unclaimed is novel and is emitted once its window
       closes; a doc colliding with any prior doc in any band (the LSH
       OR-rule, the same candidate condition as the batch path) is
       suppressed.

    Output: (id, window, n_free_bands) for novel docs, emitted on window
    close. Like every LSH dedup, aggressiveness is the (num_hashes, bands)
    dial and drops are approximate; duplicates farther apart than the
    horizon fall to the batch pass (``minhash_lsh_candidates`` +
    ``connected_components`` over the landed corpus). State at 100 TB/day
    is ∝ live band buckets per horizon (2 longs each), not corpus size."""
    rows_per_band = num_hashes // bands
    sig = doc_stream.select(
        F.col(id_col),
        F.col(time_col),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    )

    def band_key(b: Column) -> Column:
        return F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        )

    banded = sig.select(
        id_col,
        time_col,
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band_idx", "band_hash"),
    )
    claimed = banded.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["band_idx", "band_hash"]
    )
    return (
        claimed.groupBy(F.window(time_col, window), F.col(id_col))
        .agg(F.count("*").alias("n_free_bands"))
        .filter(F.col("n_free_bands") == bands)
    )


class StreamingChunkDedup:
    """Streaming form of `chunk_dedup_rewrite`: scrub every chunk the
    corpus has EVER seen (across the whole stream history, not a
    watermark horizon) and land the rewritten documents — the
    continuous-ingest counterpart of the Lee-et-al. batch scrub.

    Durable seen-chunk store: 16-byte md5 digests under
    ``state_dir/epochs/<epoch>.parquet``, one file set per committed
    micro-batch, with a ``_COMMITS`` manifest written by atomic rename.
    ``process_batch`` is idempotent — a crash-replayed epoch is a no-op
    (the manifest says it already committed), and an epoch's OWN
    digests are never in its anti-join input, so a replay cannot scrub
    a batch against itself.

    Per batch: within-batch first occurrence by (id, pos) — the same
    min-struct + semi-join shape as the batch rewrite — then one
    distributed anti-join against the committed digest store. State
    I/O per batch ∝ distinct chunks ever seen (digests only, 16
    bytes each), never corpus text. Cross-batch ordering is ARRIVAL
    order: an earlier epoch's chunk beats any later arrival, whatever
    its doc id (document ids order only WITHIN a batch).

    Drive it as ``stream.writeStream.foreachBatch(sink.process_batch)``;
    rewritten docs land under ``out_dir/epoch=<n>/`` with the batch
    rewrite's output schema (id, text, n_chunks, n_kept).
    """

    def __init__(self, state_dir: str, out_dir: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 20):
        import os

        self.state_dir = state_dir
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.chunk_tokens = chunk_tokens
        os.makedirs(os.path.join(state_dir, "epochs"), exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)

    # -- commit manifest ------------------------------------------------
    def _commits_path(self) -> str:
        import os
        return os.path.join(self.state_dir, "_COMMITS")

    def _committed(self) -> list[int]:
        import json
        import os
        p = self._commits_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _commit(self, epoch_id: int) -> None:
        import json
        import os
        done = self._committed() + [int(epoch_id)]
        tmp = self._commits_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f)
        os.replace(tmp, self._commits_path())  # atomic flip

    # -- the foreachBatch hook ------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os

        if int(epoch_id) in self._committed():
            return  # crash-replayed epoch: already landed, no-op
        spark = batch_df.sparkSession
        chunks = _chunk_frame(
            batch_df, self.text_col, self.id_col, self.chunk_tokens
        ).withColumn("dg", F.unhex(F.md5("chunk")))

        seen_files = [
            os.path.join(self.state_dir, "epochs", f"{e}.parquet")
            for e in self._committed()
        ]
        if seen_files:
            seen = spark.read.parquet(*seen_files)
            fresh = chunks.join(seen, "dg", "left_anti")
        else:
            fresh = chunks
        fresh = fresh.persist()
        try:
            # within-batch first occurrence: (id, pos) unique → the
            # chunk text rides the min struct for the rebuild
            first = fresh.groupBy("dg").agg(
                F.min(F.struct("id", "pos", "chunk")).alias("k")
            )
            kept = fresh.withColumn(
                "k", F.struct("id", "pos", "chunk")
            ).join(first, ["dg", "k"], "left_semi")
            rebuilt = kept.groupBy("id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                        lambda s: s["chunk"],
                    ),
                    " ",
                ).alias("text"),
                F.count(F.lit(1)).cast("long").alias("n_kept"),
            )
            base = batch_df.select(
                F.col(self.id_col).alias("id"),
                F.ceil(
                    F.size(F.split(F.col(self.text_col), " ", -1))
                    / F.lit(float(self.chunk_tokens))
                ).cast("long").alias("n_chunks"),
            )
            out = (
                base.join(rebuilt, "id", "left")
                .select(
                    F.col("id").alias(self.id_col),
                    F.coalesce("text", F.lit("")).alias("text"),
                    "n_chunks",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                )
            )
            out.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"epoch={int(epoch_id)}"))
            # every chunk PRESENT in this batch is corpus history now —
            # kept or scrubbed, later epochs must not re-admit it
            fresh.select("dg").distinct().write.mode("overwrite").parquet(
                os.path.join(
                    self.state_dir, "epochs", f"{int(epoch_id)}.parquet"))
        finally:
            fresh.unpersist()
        self._commit(epoch_id)

    def result(self, spark) -> DataFrame:
        """Everything landed so far (committed epochs only)."""
        import os
        paths = [
            os.path.join(self.out_dir, f"epoch={e}")
            for e in self._committed()
        ]
        if not paths:
            raise ValueError("no committed epochs yet")
        return spark.read.parquet(*paths)
