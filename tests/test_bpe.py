"""Distributed BPE training: the Spark trainer (word-freq collapse +
Catalyst fold merges) must produce exactly the merge sequence a
pure-Python classic-BPE reference (Sennrich et al. 2016 dict algorithm)
computes on the same corpus, and encoding must be lossless."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from polardbx_cdc_spark.functions import text as T
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        # max count, ties lexicographic on (a, b) — the trainer's contract
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_trainer_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents").select("text")
    texts = [r["text"] for r in docs.collect()]
    expected = _py_bpe(texts, 8)
    got = T.bpe_train(docs, n_merges=8)
    assert got == expected


def test_encode_is_lossless_and_uses_merges(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(50)
    merges = T.bpe_train(docs, n_merges=6)
    enc = T.bpe_encode(docs, merges)
    rows = enc.select(
        F.lower(F.col("text")).alias("lower_text"), "bpe_tokens"
    ).collect()
    merged_tokens = {a + b for a, b in merges}
    saw_merge = False
    for r in rows:
        # losslessness: concatenating the symbols reproduces the text
        # minus whitespace
        assert "".join(r["bpe_tokens"]) == re.sub(r"\s+", "", r["lower_text"].strip())
        saw_merge = saw_merge or any(t in merged_tokens for t in r["bpe_tokens"])
    assert saw_merge, "no trained merge ever applied — encode is inert"


def test_greedy_merge_fold_handles_overlaps(spark):
    """aaa under merge (a,a) must fold left-to-right into [aa, a] — the
    classic greedy semantics, not [a, aa] or [aaa]."""
    df = spark.createDataFrame([("aaa bb",)], "text string")
    enc = T.bpe_encode(df, [("a", "a"), ("b", "b")])
    assert enc.collect()[0]["bpe_tokens"] == ["aa", "a", "bb"]


def test_pair_stats_weighted_by_occurrence(spark):
    df = spark.createDataFrame([("ab ab ab",), ("cd",)], "text string")
    rows = T.bpe_pair_stats(df, top_k=2).collect()
    assert (rows[0]["pair"], rows[0]["n"]) == ("ab", 3)
    assert (rows[1]["pair"], rows[1]["n"]) == ("cd", 1)


def test_driver_exact_path_matches_distributed_sequential(spark):
    """Round-8 hybrid: the collapsed-vocab driver finish must reproduce
    the distributed per-pass sequential loop bit for bit (it is the same
    algorithm on the same collapsed table), in ONE pass instead of
    n_merges driver round-trips."""
    docs = load_table(spark, SF, "documents").select("text")
    s_fast: dict = {}
    s_slow: dict = {}
    fast = T.bpe_train(docs, n_merges=20, stats=s_fast)
    slow = T.bpe_train(docs, n_merges=20, driver_vocab_limit=0,
                       batch_k=1, stats=s_slow)
    assert fast == slow
    assert s_fast == {"passes": 1, "mode": "driver-exact"}
    assert s_slow["mode"] == "distributed-batched"
    assert s_slow["passes"] == 20


def test_distributed_batched_cuts_passes_5x_at_100_merges(spark):
    """The giant-vocab fallback applies top-k symbol-disjoint merges per
    pass: >= 5x fewer scheduled passes at n_merges=100 (the round-7
    verdict's bar). Divergence contract: batching may reorder sub-token
    merge PATHS (a pair created mid-pass is deferred to the next pass),
    so parity is pinned at batch_k=1 above, not here."""
    docs = load_table(spark, SF, "documents").select("text")
    s: dict = {}
    merges = T.bpe_train(docs, n_merges=100, driver_vocab_limit=0,
                         batch_k=8, stats=s)
    # the sf0.001 corpus runs dry before 100 merges — the pass bar is
    # relative to the merges actually trained (sequential = 1 pass each)
    assert len(merges) >= 60
    assert s["passes"] * 5 <= len(merges), s
    # every merge is still a genuine adjacent pair (no fabrication)
    assert all(isinstance(a, str) and isinstance(b, str) and a and b
               for a, b in merges)
