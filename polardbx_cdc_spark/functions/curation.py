"""Corpus-curation operators for LLM training-data pipelines: repetition
metrics, rule-based quality filtering, deterministic sampling, sequence
packing, PII scrubbing, and deterministic shard shuffling.

These extend the engine's north-star data-pipeline tier (SURVEY
extensions; reference has no analogue — the designs follow the public
Gopher/RefinedWeb curation rules and the standard concat-and-chunk
pretraining packing scheme).

Scale notes (100 TB):
- repetition/quality metrics shuffle only (doc_id, token)-count partials
  with map-side combine — shuffle volume is bounded by distinct tokens per
  doc, not corpus size.
- ``hash_sample`` is shuffle-free (a pure filter on an md5 threshold);
  ``stratified_quota_sample`` shuffles once, keyed by stratum — for hot
  strata prefer ``hash_sample``.
- ``pack_sequences`` computes a global prefix sum in two phases
  (per-range-partition window + tiny driver-side offset stitch, the same
  trick as ``streaming/pipeline.BinlogSink`` offset assignment) instead of
  a single-task global window.
- all hashes are md5-prefix based so the DuckDB oracle reproduces them
  bit-for-bit (registry determinism rules, queries.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polardbx_cdc_spark.functions.text import STOPWORDS, tokens

# ---------------------------------------------------------------------------
# shared deterministic hash (md5-prefix → BIGINT, DuckDB-reproducible)
# ---------------------------------------------------------------------------


def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def oracle_h32(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style repetition signals)
# ---------------------------------------------------------------------------


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition signals: token totals, distinct counts, and
    the multiplicity of the most frequent unigram/bigram (the public
    Gopher rules' "fraction of tokens in the top n-gram", kept as exact
    integers so cross-engine value hashes match; consumers divide).

    ONE scan, ONE explode, ONE shuffle: unigrams and bigrams are tagged
    ("u"/"b" prefix) and exploded together, aggregated per (doc, gram)
    with map-side combine (shuffle carries one row per distinct gram per
    doc, not per occurrence), then rolled up per doc with conditional
    aggregates — no self-join of two aggregation branches.
    """
    return _gram_stats(docs, id_col, text_col)


def _gram_stats(
    docs: DataFrame, id_col: str, text_col: str, extra_per_doc: dict | None = None
) -> DataFrame:
    """Shared gram-statistics pipeline. ``extra_per_doc`` maps output name
    → Column computed on the pre-explode row (array expressions, no
    shuffle) and carried through both aggregations with ``first()`` — this
    is how quality_filter gets n_chars/n_stop without a second scan of the
    corpus or a join."""
    extra_per_doc = extra_per_doc or {}
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        toks.alias("toks"),
        *[c.alias(n) for n, c in extra_per_doc.items()],
    )
    # bigrams via zip_with over shifted slices: total for size<2 (empty)
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tagged = F.concat(
        F.transform(F.col("toks"), lambda t: F.concat(F.lit("u"), t)),
        F.transform(bigrams, lambda g: F.concat(F.lit("b"), g)),
    )
    g = base.select(id_col, F.explode(tagged).alias("gram"), *extra_per_doc)
    per_gram = g.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.first(n).alias(n) for n in extra_per_doc],
    )
    is_uni = F.col("gram").startswith("u")

    def agg_kind(uni: bool, expr, name):
        cond = is_uni if uni else ~is_uni
        return F.coalesce(expr(F.when(cond, F.col("n"))), F.lit(0)).alias(name)

    return per_gram.groupBy(id_col).agg(
        agg_kind(True, F.sum, "n_tokens"),
        agg_kind(True, F.count, "n_distinct_tokens"),
        agg_kind(True, F.max, "top_tokens_n"),
        agg_kind(False, F.sum, "n_bigrams"),
        agg_kind(False, F.count, "n_distinct_bigrams"),
        agg_kind(False, F.max, "top_bigrams_n"),
        *[F.first(n).alias(n) for n in extra_per_doc],
    )


# ---------------------------------------------------------------------------
# rule-based quality filter (Gopher/RefinedWeb-style)
# ---------------------------------------------------------------------------

#: rule evaluation order is part of the contract (reasons string layout)
QUALITY_RULES = (
    "too_few_tokens",
    "too_many_tokens",
    "mean_word_len_out_of_range",
    "low_distinct_ratio",
    "top_token_dominates",
    "no_stopwords",
)


def quality_filter(
    docs: DataFrame,
    *,
    min_tokens: int = 16,
    max_tokens: int = 100_000,
    min_mean_len_centi: int = 200,  # mean word length >= 2.00 chars
    max_mean_len_centi: int = 1200,  # <= 12.00 chars
    min_distinct_pct: int = 20,  # distinct tokens >= 20% of tokens
    max_top_token_pct: int = 25,  # top unigram <= 25% of tokens
    min_stopwords: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep/drop verdict per document with the failed rules named, in
    ``QUALITY_RULES`` order, as a comma-joined string (string, not array,
    so cross-engine value hashing is trivially stable).

    All thresholds are integers (percent / centi-chars) so every
    comparison is exact integer math on both engines. One scan, one
    explode, one keyed shuffle: n_chars/n_stop ride the shared
    ``_gram_stats`` pipeline as ``first()``-carried per-doc columns —
    no second scan of the corpus, no join.
    """
    toks = tokens(F.col(text_col))
    j = _gram_stats(
        docs,
        id_col,
        text_col,
        extra_per_doc={
            "n_chars": F.length(F.trim(F.col(text_col))),
            "n_stop": F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))),
        },
    )
    # mean word length in centi-chars: round(100 * chars_in_tokens / n_tokens).
    # chars_in_tokens = n_chars - (n_tokens - 1) separators (single-space soup;
    # for general text this undercounts runs of whitespace, acceptable for a
    # quality heuristic). Integer-exact: both engines round() half-away.
    mean_centi = F.round(
        F.lit(100.0) * (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens")
    ).cast("long")
    fails = [
        (F.col("n_tokens") < min_tokens, "too_few_tokens"),
        (F.col("n_tokens") > max_tokens, "too_many_tokens"),
        (
            (mean_centi < min_mean_len_centi) | (mean_centi > max_mean_len_centi),
            "mean_word_len_out_of_range",
        ),
        (
            F.col("n_distinct_tokens") * 100 < F.col("n_tokens") * min_distinct_pct,
            "low_distinct_ratio",
        ),
        (
            F.col("top_tokens_n") * 100 > F.col("n_tokens") * max_top_token_pct,
            "top_token_dominates",
        ),
        (F.col("n_stop") < min_stopwords, "no_stopwords"),
    ]
    reason_cols = [F.when(cond, F.lit(name)).otherwise(F.lit("")) for cond, name in fails]
    reasons = F.concat_ws(",", F.filter(F.array(*reason_cols), lambda s: s != ""))
    return j.select(
        id_col,
        "n_tokens",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def hash_sample(
    docs: DataFrame, pct: int, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Shuffle-free Bernoulli-by-hash sample: keep a row iff its salted
    md5-prefix falls below ``pct`` % of the 32-bit space. Deterministic,
    repartition-invariant, and O(0) extra shuffles — the 100 TB default.
    Exact fraction only in expectation (binomial around pct)."""
    h = _h32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return docs.where(h * 100 < F.lit(pct) * F.lit(1 << 32))


def stratified_quota_sample(
    docs: DataFrame,
    pct: int,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quota: rank rows inside each stratum by a salted
    md5 of the id (a deterministic 'random' order) and keep the first
    ``ceil(pct% of stratum size)``. One shuffle keyed by stratum; for
    heavily skewed strata prefer ``hash_sample`` (no shuffle, approximate
    quota)."""
    key = _h32(F.concat(F.lit("strat:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(by).orderBy(key, id_col)
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "stratum_n", F.count(F.lit(1)).over(Window.partitionBy(by))
    )
    # ceil(stratum_n * pct / 100) in pure integer math
    quota = (F.col("stratum_n") * pct + 99) / 100
    kept = ranked.where(F.col("rn") <= F.floor(quota))
    return kept.drop("rn", "stratum_n")


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk pretraining layout)
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    two_phase: bool = True,
) -> DataFrame:
    """Assign every document its byte^Wtoken span in the standard
    concat-and-chunk pretraining layout: order the corpus by a salted md5
    of the id (deterministic global shuffle), lay token counts end-to-end,
    and cut fixed ``seq_len`` windows. Emits per-doc
    ``(start_off, end_off, first_seq, last_seq)`` — a doc straddles a cut
    iff first_seq < last_seq.

    ``two_phase=True`` (default) computes the global prefix sum scalably:
    range-partition by the order key, window-sum *within* each partition,
    then stitch partition offsets with one tiny driver-side collect (one
    row per partition — same pattern as BinlogSink's dense global offsets,
    streaming/pipeline.py). The resulting offsets depend only on the
    global order + token counts, not on partition boundaries, so the
    single-window oracle matches bit-for-bit."""
    key = _h32(F.concat(F.lit("pack:"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
        key.alias("pk"),
    )
    if not two_phase:
        w = Window.orderBy("pk", id_col).rowsBetween(Window.unboundedPreceding, 0)
        cum = base.withColumn("end_off", F.sum("n_tok").over(w))
    else:
        n_parts = max(docs.sparkSession.sparkContext.defaultParallelism, 2)
        parted = (
            base.repartitionByRange(n_parts, "pk", id_col)
            .withColumn("pid", F.spark_partition_id())
        )
        # localCheckpoint, not persist: persist() registers the plan in the
        # session CacheManager and nobody here can unpersist it after the
        # caller materializes the result — a cached frame would leak for
        # the session lifetime. Checkpoint blocks are freed on GC instead,
        # and the totals collect below reuses the same materialization.
        parted = parted.localCheckpoint(eager=True)
        # per-partition totals -> absolute base offset per partition (the
        # collect is <= n_parts rows — the documented price of dense global
        # offsets without a 1-task sort)
        totals = {
            r["pid"]: r["s"]
            for r in parted.groupBy("pid").agg(F.sum("n_tok").alias("s")).collect()
        }
        bases, acc = {}, 0
        for pid in sorted(totals):
            bases[pid] = acc
            acc += totals[pid]
        base_map = F.create_map(
            *[x for pid, off in sorted(bases.items()) for x in (F.lit(pid), F.lit(off))]
        )
        wloc = Window.partitionBy("pid").orderBy("pk", id_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = parted.withColumn(
            "end_off", F.sum("n_tok").over(wloc) + base_map[F.col("pid")]
        ).drop("pid")
    out = cum.select(
        id_col,
        "n_tok",
        (F.col("end_off") - F.col("n_tok")).alias("start_off"),
        "end_off",
        F.floor((F.col("end_off") - F.col("n_tok")) / seq_len).alias("first_seq"),
        F.floor((F.col("end_off") - 1) / seq_len).alias("last_seq"),
    )
    return out


# ---------------------------------------------------------------------------
# PII scrubbing (regex subset shared by Java regex and RE2)
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}[- ]?[0-9]{2,4}[- ]?[0-9]{3,4}[- ]?[0-9]{3,4}"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 literals / international phone numbers with
    typed placeholders, and count each. Pure projection (whole-stage
    codegen, zero shuffle); patterns restricted to the Java-regex ∩ RE2
    subset (no lookarounds/backrefs) so the DuckDB oracle applies the very
    same expressions."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0))
    scrubbed = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4, "<IP>")
    n_phone = F.size(F.regexp_extract_all(scrubbed, F.lit(PII_PHONE), 0))
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
    )


# ---------------------------------------------------------------------------
# deterministic shard shuffle (training-data layout)
# ---------------------------------------------------------------------------


def shard_shuffle(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id", salt: str = "shuf"
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    shard = salted-md5 mod n, position = rank of a second salted md5
    within the shard. Stable across runs/retries (content-derived, no
    ``rand()``/``monotonically_increasing_id``). One shuffle keyed by
    shard; within-shard ranking parallelizes across shards."""
    h = _h32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    shard = F.pmod(h, F.lit(n_shards))
    pos_key = _h32(F.concat(F.lit(salt + "#pos:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(shard).orderBy(pos_key, id_col)
    return docs.select(
        F.col(id_col),
        shard.alias("shard"),
        (F.row_number().over(w) - 1).alias("pos"),
    )


# ---------------------------------------------------------------------------
# corpus-frequency signals (vocabulary stats, keyword extraction)
# ---------------------------------------------------------------------------


def corpus_freq_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document corpus-frequency signals: how common this doc's words
    are across the whole corpus — sum/min of each token's document
    frequency (a rarity/quality signal: boilerplate scores high, gibberish
    scores low). Exact integers only, so the DuckDB oracle matches
    bit-for-bit — no log/float IDF in the comparison path.

    Shape: one explode → distinct (doc, token) → token-keyed DF agg
    (shuffle ∝ vocabulary) → rejoin (at 100 TB the vocabulary side is
    small after aggregation; Spark broadcasts it when under the
    threshold) → doc-keyed agg."""
    toks = tokens(F.col(text_col))
    doc_tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("tok")
    )
    df_freq = doc_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        doc_tok.join(df_freq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum("df").alias("sum_df"),
            F.min("df").alias("min_df"),
            F.max("df").alias("max_df"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    ``n``-gram with the evaluation set (the standard pre-training hygiene
    step — verbatim eval overlap inflates scores). Returns
    (id, n_hits = matching gram INSTANCES); join ``left_anti`` against it
    to drop contaminated docs.

    Scale shape: the eval side (benchmarks are tiny vs the corpus)
    collapses to distinct grams and BROADCASTS; the corpus streams through
    the join unshuffled, and only matching gram rows — ∝ contamination,
    not corpus size — reach the per-doc aggregate."""
    from polardbx_cdc_spark.functions.dedupe import shingles

    eval_grams = (
        eval_docs.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def lm_perplexity_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style LM quality score: estimate a token-bigram model from
    the corpus itself, then score each doc by the average negative
    log2-probability of its bigrams (p(w2|w1) = c(w1,w2)/c(w1) — MLE, no
    smoothing needed since every scored bigram was observed). Low scores =
    predictable/templated text, high = unusual token sequences; real
    pipelines swap in a reference-corpus LM, which only changes which
    frame the model join reads.

    Scale shape: the bigram model IS a DataFrame (c(w1,w2) with c(w1)
    merged in), so scoring is one keyed join doc-bigrams ⋈ model — at
    100 TB the model table shards across the cluster like any dimension
    too big to broadcast — then a per-doc aggregate."""
    toks = tokens(F.col(text_col))
    # doc bigrams: (id, w1, w2) — one explode of zip(tokens, tokens[1:])
    tok_df = docs.select(F.col(id_col), toks.alias("t")).filter(F.size("t") >= 2)
    doc_bi = tok_df.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bi"),
    ).select(id_col, "bi.w1", "bi.w2")
    bi_counts = doc_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_counts = doc_bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    model = bi_counts.join(uni_counts, "w1")
    scored = doc_bi.join(model, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            -F.sum(F.log2(F.col("c12").cast("double") / F.col("c1").cast("double")))
            / F.count(F.lit(1)),
            6,
        ).alias("avg_neg_log2p"),
    )


def keyword_extract(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic TF-IDF-style keyword per document: the token with
    the highest term frequency, tie-broken by LOWEST document frequency
    (rarer wins — the integer-exact stand-in for idf weighting), then
    lexicographically. max_by with a composite struct key: one explode,
    two keyed aggs, one vocab join — no window over the corpus."""
    toks = tokens(F.col(text_col))
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_freq = (
        docs.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    joined = tf.join(df_freq, "tok")
    # rank key: tf desc, df asc, token asc — min_by over (-tf, df, tok)
    # orders all three dimensions natively; no string-inversion tricks.
    key = F.struct((-F.col("tf")).alias("ntf"), F.col("df"), F.col("tok"))
    return joined.groupBy(id_col).agg(
        F.min_by("tok", key).alias("keyword"),
        F.max("tf").alias("keyword_tf"),
        F.min_by("df", key).alias("keyword_df"),
    )


def mixture_weights(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling weights for the pretraining mixture:
    temperature-scaled (alpha = 0.5) over token mass, the standard move
    that up-samples small high-quality sources and caps the dominance of
    the biggest crawl (multilingual-sampling practice popularized by
    mBERT/XLM-R; same exponent form as data-mixture tuning).

    All-integer outputs: ``s = floor(sqrt(n_tokens))`` (IEEE sqrt is
    correctly rounded in both engines, so the floor is deterministic),
    ``w_ppm = floor(1e6·s/Σs)``, and ``boost_bp`` = the up/down-sampling
    factor vs proportional allocation in basis points. One
    map-side-combined shuffle on the source key, then window math over
    the k-row source frame — scan-shaped at 100 TB."""
    from polardbx_cdc_spark.functions import text as text_fn

    per_src = docs.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(text_fn.token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    s = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    w = Window.partitionBy()
    scaled = per_src.withColumn("s", s).select(
        "*",
        F.sum("s").over(w).alias("s_total"),
        F.sum("n_tokens").over(w).alias("tok_total"),
    )
    return scaled.select(
        F.col(by),
        "n_docs",
        "n_tokens",
        F.expr("(1000000 * s) div s_total").cast("long").alias("w_ppm"),
        F.expr(
            "(10000 * ((1000000 * s) div s_total))"
            " div greatest((1000000 * n_tokens) div tok_total, 1)"
        )
        .cast("long")
        .alias("boost_bp"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (RAG / long-context prep): split
    each document into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap``, emitting the chunk text and its token
    span. One generate-spans projection + one explode — no shuffle, no
    Python; chunk counts are exact integer math so both engines cut
    identical windows. The final chunk is the remainder (may be short);
    a document shorter than one window yields exactly one chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    from polardbx_cdc_spark.functions import text as text_fn

    step = chunk_tokens - overlap
    base = docs.select(id_col, text_fn.tokens(F.col(text_col)).alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    n = F.col("_n")
    # chunks = 1 if n <= chunk else ceil((n - chunk)/step) + 1 (last chunk
    # always reaches token n; may be shorter than a full window)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.expr(f"(_n - {chunk_tokens} + {step} - 1) div {step}") + 1
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            (i * step).alias("start_tok"),
            F.least(i * step + chunk_tokens, n).alias("end_tok"),
        ),
    )
    ex = base.select(id_col, "_toks", F.explode(spans).alias("c"))
    return ex.select(
        F.col(id_col),
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start_tok").cast("long").alias("start_tok"),
        F.col("c.end_tok").cast("long").alias("end_tok"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("c.start_tok") + 1, F.col("c.end_tok") - F.col("c.start_tok")),
            " ",
        ).alias("chunk_text"),
    )
