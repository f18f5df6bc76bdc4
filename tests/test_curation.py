"""Invariant tests for the corpus-curation tier (functions/curation.py).

Oracle value-parity for the registered curation queries is covered by
tests/test_oracle_parity.py; these tests pin the semantic laws the
oracles can't express (determinism under repartition, quota exactness,
packing contiguity, rule triggering).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from polardbx_cdc_spark.functions import curation
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").persist()


def test_hash_sample_deterministic_and_repartition_invariant(spark, docs):
    a = sorted(r.doc_id for r in curation.hash_sample(docs, 20).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in curation.hash_sample(docs.repartition(7), 20).select("doc_id").collect()
    )
    assert a == b and len(a) > 0
    # binomial around 20%: generous 3-sigma band
    n = docs.count()
    sigma = math.sqrt(n * 0.2 * 0.8)
    assert abs(len(a) - 0.2 * n) < 4 * sigma


def test_stratified_quota_exact_per_stratum(spark, docs):
    kept = curation.stratified_quota_sample(docs.select("doc_id", "source"), pct=20)
    got = {r["source"]: r["n"] for r in kept.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    want = {
        r["source"]: math.ceil(r["n"] * 0.2)
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_pack_sequences_two_phase_matches_single_window(spark, docs):
    two = curation.pack_sequences(docs, seq_len=512, two_phase=True)
    one = curation.pack_sequences(docs, seq_len=512, two_phase=False)
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_pack_sequences_spans_are_contiguous_and_cover_total(spark, docs):
    rows = sorted(curation.pack_sequences(docs, seq_len=512).collect(), key=lambda r: r.start_off)
    assert rows[0].start_off == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start_off == prev.end_off  # no gaps, no overlap
    for r in rows:
        assert r.end_off - r.start_off == r.n_tok
        assert r.first_seq == r.start_off // 512
        assert r.last_seq == (r.end_off - 1) // 512


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob.smith+x@ex-ample.co.uk now"),
            Row(doc_id=2, text="host 192.168.0.1 and 10.0.0.255 up"),
            Row(doc_id=3, text="call +1 555 0100 1234 or +44-20-7946-0958"),
            Row(doc_id=4, text="clean text with no pii at all"),
        ]
    )
    out = {r.doc_id: r for r in curation.pii_scrub(df).collect()}
    assert out[1].scrubbed_text == "mail <EMAIL> now" and out[1].n_email == 1
    assert out[2].scrubbed_text == "host <IP> and <IP> up" and out[2].n_ip == 2
    assert out[3].n_phone == 2 and "<PHONE>" in out[3].scrubbed_text
    assert "+" not in out[3].scrubbed_text
    assert out[4].scrubbed_text == "clean text with no pii at all"
    assert (out[4].n_email, out[4].n_ip, out[4].n_phone) == (0, 0, 0)


def test_quality_filter_rules_trigger(spark):
    long_ok = "the quick brown fox jumps over a lazy dog near the bright river bank today " * 3
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=long_ok.strip()),
            Row(doc_id=2, text="short text only"),  # too_few_tokens (3 < 16)
            Row(doc_id=3, text=("spam " * 40).strip()),  # low distinct + top dominates + no stopwords
            Row(doc_id=4, text=("pneumonoultramicroscopic " * 20).strip()),  # mean len out of range
        ]
    )
    out = {r.doc_id: r for r in curation.quality_filter(df).collect()}
    assert out[1].keep and out[1].reasons == ""
    assert not out[2].keep and "too_few_tokens" in out[2].reasons
    assert not out[3].keep
    assert "low_distinct_ratio" in out[3].reasons
    assert "top_token_dominates" in out[3].reasons
    assert "no_stopwords" in out[3].reasons
    assert not out[4].keep and "mean_word_len_out_of_range" in out[4].reasons
    # reasons honor the declared rule order
    names = list(curation.QUALITY_RULES)
    for r in out.values():
        listed = [x for x in r.reasons.split(",") if x]
        assert listed == sorted(listed, key=names.index)


def test_shard_shuffle_dense_positions_and_stable(spark, docs):
    out = curation.shard_shuffle(docs, n_shards=8)
    per = out.groupBy("shard").agg({"pos": "max", "*": "count"}).collect()
    for r in per:
        assert r["max(pos)"] == r["count(1)"] - 1  # dense 0..n-1 per shard
    again = curation.shard_shuffle(docs.repartition(5), n_shards=8)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b a b a c")])
    r = curation.repetition_stats(df).collect()[0]
    assert (r.n_tokens, r.n_distinct_tokens, r.top_tokens_n) == (6, 3, 3)
    # bigrams: "a b","b a","a b","b a","a c" -> top is 2, distinct 3, total 5
    assert (r.n_bigrams, r.n_distinct_bigrams, r.top_bigrams_n) == (5, 3, 2)


def test_streaming_exact_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Duplicates arriving in DIFFERENT micro-batches must still dedup
    (state keyed by fingerprint survives across triggers), and memory
    stays bounded by the watermark horizon."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.functions import dedupe

    src = str(tmp_path / "src")
    os.makedirs(src)
    base_rows = [
        Row(doc_id=i, ts="2024-01-15 00:%02d:00" % i, text=f"unique doc number {i} body")
        for i in range(6)
    ]
    dup_rows = [  # same text, later ids/timestamps, landing in file 2
        Row(doc_id=100 + i, ts="2024-01-15 00:%02d:30" % i, text=f"unique doc number {i} body")
        for i in range(3)
    ]
    mk = lambda rows: spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    mk(base_rows).coalesce(1).write.mode("append").parquet(src)
    mk(dup_rows).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = dedupe.streaming_exact_dedup(stream, time_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream_out").collect()
    assert len(got) == 6  # the 3 cross-batch duplicates were dropped
    assert sorted(r.doc_id for r in got) == list(range(6))  # first arrival kept
    assert len({r.fp for r in got}) == 6


def test_streaming_near_dedup_suppresses_cross_batch_near_dups(spark, tmp_path):
    """Near-duplicates (not byte-identical — one doubled token) arriving in
    LATER micro-batches must be suppressed by the band-bucket state, while
    distinct docs pass. Chained stateful ops: bucket dedup → windowed band
    count (Spark watermark propagation)."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.functions import dedupe

    src = str(tmp_path / "src")
    os.makedirs(src)
    texts = [  # genuinely distinct word streams (no shared shingles)
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "red orange yellow green blue indigo violet crimson amber teal",
        "monday tuesday wednesday thursday friday saturday sunday week month year",
        "north south east west compass bearing heading course route map",
    ]
    base_rows = [
        Row(doc_id=i, ts="2024-01-15 00:0%d:00" % i, text=texts[i]) for i in range(4)
    ]
    near_rows = [  # near-dup of doc i: one token doubled, later arrival
        Row(doc_id=100 + i, ts="2024-01-15 00:0%d:30" % i, text=texts[i] + " beta")
        for i in range(2)
    ]
    flush = [  # advances the watermark past every window above
        Row(doc_id=999, ts="2024-01-15 03:00:00", text="flush sentinel far in the future")
    ]
    mk = lambda rows: spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    mk(base_rows).coalesce(1).write.mode("append").parquet(src)
    mk(near_rows).coalesce(1).write.mode("append").parquet(src)
    mk(flush).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    out = dedupe.streaming_near_dedup(
        stream, time_col="ts", watermark="5 minutes", window="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("near_dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.sql("select * from near_dedup_out").collect()}
    assert set(range(4)) <= got, f"originals must pass: {got}"
    assert not ({100, 101} & got), f"near-dups must be suppressed: {got}"


def test_char_entropy_laws(spark):
    """Entropy of a one-symbol string is 0; of k equiprobable symbols is
    log2(k); repetitive text scores strictly below varied text."""
    import math

    from pyspark.sql import Row

    from polardbx_cdc_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaaaaaa"),
            Row(doc_id=2, text="abcdabcd"),  # 4 symbols, equal counts
            Row(doc_id=3, text="abcdefgh"),  # 8 symbols, equal counts
        ]
    )
    got = {r["doc_id"]: (r["n_chars"], r["char_entropy"]) for r in char_entropy(docs).collect()}
    assert got[1] == (8, 0.0)
    assert got[2] == (8, round(math.log2(4), 6))
    assert got[3] == (8, round(math.log2(8), 6))
    assert got[1][1] < got[2][1] < got[3][1]


def test_decontaminate_drop_law(spark):
    """After left-anti joining the contamination report, no surviving doc
    shares an n-gram with the eval set (the whole point of the op)."""
    from pyspark.sql import Row

    from polardbx_cdc_spark.functions import curation

    eval_docs = spark.createDataFrame([Row(doc_id=0, text="the quick brown fox jumps")])
    corpus = spark.createDataFrame(
        [
            Row(doc_id=10, text="prefix the quick brown fox suffix"),  # contaminated
            Row(doc_id=11, text="entirely unrelated words in this document"),
            Row(doc_id=12, text="quick brown dog runs away"),  # shares only shorter grams
        ]
    )
    report = curation.decontaminate(corpus, eval_docs, n=4)
    flagged = {r["doc_id"] for r in report.collect()}
    assert flagged == {10}
    survivors = {r["doc_id"] for r in corpus.join(report, "doc_id", "left_anti").collect()}
    assert survivors == {11, 12}


def test_keyword_extract_tie_breaks(spark):
    """tf desc, then df asc (rarer wins), then lexicographically smallest.
    doc 1: 'b b a a c' — a and b tie on tf=2; b is corpus-rarer (df: a=3,
    b=1) so b wins despite 'a' < 'b'. doc 2: 'x y' — all tf=1, df=1 →
    lexicographic → x. docs 3,4 exist to set a's df=3."""
    from polardbx_cdc_spark.functions.curation import keyword_extract

    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "x y"), (3, "a"), (4, "a c")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in keyword_extract(docs).collect()}
    assert got[1]["keyword"] == "b" and got[1]["keyword_tf"] == 2 and got[1]["keyword_df"] == 1
    assert got[2]["keyword"] == "x"
    assert got[3]["keyword"] == "a" and got[3]["keyword_df"] == 3


def test_mixture_weights_laws(spark):
    from polardbx_cdc_spark.functions import curation

    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small", "tok " * (50 if i < 90 else 5)) for i in range(100)],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in curation.mixture_weights(docs).collect()}
    # weights normalize (floor rounding loses at most n_sources ppm)
    total = sum(r["w_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    # temperature 0.5 up-samples the small high-quality source…
    assert rows["small"]["boost_bp"] > 10_000
    # …and down-samples the dominant one
    assert rows["big"]["boost_bp"] < 10_000
    assert all(r["w_ppm"] >= 0 for r in rows.values())


def test_chunk_documents_spans_and_text(spark):
    from polardbx_cdc_spark.functions import curation

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(300))), (2, "a b c"),
         (3, " ".join(f"x{i}" for i in range(224)))],
        "doc_id long, text string",
    )
    out = curation.chunk_documents(docs, 128, 32).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc → exactly one (possibly short) chunk
    assert [(r["start_tok"], r["end_tok"]) for r in by_doc[2]] == [(0, 3)]
    assert by_doc[2][0]["chunk_text"] == "a b c"
    # sliding windows advance by chunk - overlap and always reach the end
    assert [(r["start_tok"], r["end_tok"]) for r in by_doc[1]] == [(0, 128), (96, 224), (192, 300)]
    assert [(r["start_tok"], r["end_tok"]) for r in by_doc[3]] == [(0, 128), (96, 224)]
    # chunk text round-trips the token slice
    assert by_doc[1][1]["chunk_text"].split(" ")[0] == "t96"
    assert by_doc[1][2]["chunk_text"].split(" ")[-1] == "t299"
    # overlap invariant: consecutive chunks share `overlap` tokens
    a, b = by_doc[1][0], by_doc[1][1]
    assert a["end_tok"] - b["start_tok"] == 32
