"""HLL / Count-Min sketch laws: mergeability (the property that makes
them the 100 TB scale path), estimator bounds, and hash determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from polardbx_cdc_spark.functions import sketches as S
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_hll_registers_merge_by_max(spark):
    """Register tables are a monoid under register-wise max: sketching the
    union equals merging the parts' sketches — the cross-shard/cross-day
    combine a 100 TB rollup relies on."""
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = {(r["bucket"], r["max_rho"]) for r in S.hll_registers(ev, "event_id").collect()}
    merged = {
        (r["bucket"], r["max_rho"])
        for r in S.hll_registers(a, "event_id")
        .unionByName(S.hll_registers(b, "event_id"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert whole == merged


def test_cm_sketch_merges_by_sum_and_never_undercounts(spark):
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = {
        (r["row_id"], r["col_id"], r["cnt"])
        for r in S.cm_sketch(ev, "user_id").collect()
    }
    merged = {
        (r["row_id"], r["col_id"], r["cnt"])
        for r in S.cm_sketch(a, "user_id")
        .unionByName(S.cm_sketch(b, "user_id"))
        .groupBy("row_id", "col_id")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert whole == merged
    # CM point estimates never undercount
    keys = ev.select("user_id").distinct()
    est = {
        r["user_id"]: r["est"]
        for r in S.cm_point_estimates(S.cm_sketch(ev, "user_id"), keys, "user_id").collect()
    }
    exact = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_hll_estimate_within_error_envelope(spark):
    """Raw estimator at n ≫ 2.5·m: within 4 standard errors
    (SE = 1.04/sqrt(256) ≈ 6.5%) of the true cardinality."""
    ev = load_table(spark, SF, "events")
    est = S.hll_estimate(S.hll_registers(ev, "event_id")).collect()[0]["est_distinct"]
    exact = ev.select("event_id").distinct().count()
    assert abs(est - exact) / exact < 0.26, (est, exact)


def test_hll_rho_payload_edge_cases(spark):
    """rho derivation straight from controlled md5 payloads: bin() length
    math must give leading-zeros+1 over the 60-bit payload."""
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    reg = S.hll_registers(df, "k")
    rows = reg.collect()
    assert all(1 <= r["max_rho"] <= 61 for r in rows)
    # cross-check a handful of keys in pure Python
    import hashlib

    by_bucket: dict[int, int] = {}
    for i in range(2000):
        h = hashlib.md5(str(i).encode()).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:17], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        by_bucket[bucket] = max(by_bucket.get(bucket, 0), rho)
    got = {r["bucket"]: r["max_rho"] for r in rows}
    assert got == by_bucket


def test_hist_quantiles_merge_and_error_bound(spark):
    """Histogram merges by cell-wise sum (split-union == whole) and every
    quantile estimate is within one bucket width (2^16 cents) ABOVE the
    true order-statistic (upper-edge estimator never undercuts the rank).
    The cumulative window runs over the domain-bounded histogram (≤
    max_value/2^16 rows), never the data — single-partition there is by
    design, not a scale bug."""
    from polardbx_cdc_spark.functions import sketches as S

    o = load_table(spark, SF, "orders")
    cents = F.round(F.col("o_totalprice") * 100)
    est = {
        r["q_bp"]: (r["k"], r["est_cents"])
        for r in S.hist_quantiles(o, cents, [2500, 5000, 7500, 9000, 9900]).collect()
    }
    vals = sorted(r[0] for r in o.select(cents.cast("long")).collect())
    n = len(vals)
    for q_bp, (k, est_cents) in est.items():
        assert k == max(1, (q_bp * n) // 10000)
        true_val = vals[k - 1]  # k-th order statistic
        assert true_val <= est_cents < true_val + (1 << 16), (q_bp, true_val, est_cents)
    # mergeability: histograms from two splits sum to the whole
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)

    def hist(df):
        return {
            (r["b"],): r["cnt"]
            for r in df.select(cents.cast("long").alias("_c"))
            .select(F.expr("_c div 65536").alias("b"))
            .groupBy("b")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        }

    ha, hb, hw = hist(a), hist(b), hist(o)
    merged = {k2: ha.get(k2, 0) + hb.get(k2, 0) for k2 in set(ha) | set(hb)}
    assert merged == hw


def test_streaming_hll_monitor_matches_batch_exactly(spark):
    """The foreachBatch HLL monitor folds per-micro-batch registers with
    register-wise max, so after the stream drains its registers — and
    therefore the fixed-point estimate — are IDENTICAL to the one-shot
    batch sketch, regardless of how the data was batched."""
    from polardbx_cdc_spark.functions.sketches import StreamingDistinctMonitor
    from polardbx_cdc_spark.streaming.source import _as_stream_dir

    ev = load_table(spark, SF, "events")
    batch_reg = {
        (r["bucket"], r["max_rho"]) for r in S.hll_registers(ev, "event_id").collect()
    }
    batch_est = S.hll_estimate(S.hll_registers(ev, "event_id")).collect()[0][
        "est_distinct"
    ]

    mon = StreamingDistinctMonitor("event_id")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_as_stream_dir(SF, "events"))
    )
    q = stream.writeStream.foreachBatch(mon).trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert set(mon.registers.items()) == batch_reg
    assert mon.estimate(spark) == batch_est


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom laws: every inserted key probes true (no false negatives,
    any split/merge of the build); filters merge by union+distinct; FPR
    on a disjoint probe set stays under a loose 5x analytic bound."""
    import math

    ev = load_table(spark, SF, "events")
    ins = ev.select((F.col("event_id") * 2).alias("k")).distinct()      # evens
    probe_out = ev.select((F.col("event_id") * 2 + 1).alias("k")).distinct()  # odds
    bits = S.bloom_build(ins, "k")
    got_in = S.bloom_probe(bits, ins, "k")
    assert got_in.filter(~F.col("maybe_in")).count() == 0  # no false negatives
    n = ins.count()
    fpr = (1 - math.exp(-S.BLOOM_K * n / S.BLOOM_M)) ** S.BLOOM_K
    got_out = S.bloom_probe(bits, probe_out, "k")
    observed = got_out.filter(F.col("maybe_in")).count() / probe_out.count()
    assert observed <= max(5 * fpr, 0.02), (observed, fpr)
    # merge law: build(a) ∪ build(b) == build(a ∪ b)
    a = ins.filter(F.col("k") % 4 == 0)
    b = ins.filter(F.col("k") % 4 != 0)
    merged = {
        r["bit_pos"]
        for r in S.bloom_build(a, "k").unionByName(S.bloom_build(b, "k")).distinct().collect()
    }
    whole = {r["bit_pos"] for r in bits.collect()}
    assert merged == whole
