"""Edge-case suites (SURVEY §5 item 5: BigEventTest / BigTransTest /
special-characters flavor) + skew-path equivalence."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import apply as apply_ops
from polardbx_cdc_spark.operators import appliers
from polardbx_cdc_spark.tso import make_tso


def _mk_cdc(spark, rows):
    df = spark.createDataFrame(
        rows, "phys long, txn_id long, seq long, action string, db string, tbl string, pk string, value double"
    )
    return (
        df.withColumn("tso", make_tso(F.col("phys"), F.col("txn_id"), F.col("seq")))
        .withColumn("source_id", F.concat(F.lit("dn-"), (F.col("txn_id") % 2).cast("string")))
        .drop("phys")
    )


def test_big_transaction_collapse(spark):
    """BigTransTest flavor: one 100k-row transaction on one PK collapses
    correctly (the hot-key path) and the salted variant agrees exactly."""
    n = 100_000
    rows = [(1_000_000, 0, s, "UPDATE" if s else "INSERT", "d", "t", "hot", float(s)) for s in range(n)]
    rows += [(2_000_000, 1, 0, "UPDATE", "d", "t", "cold", 42.0)]
    df = _mk_cdc(spark, rows).repartition(16)

    plain = {tuple(r[k] for k in ("db", "tbl", "pk")): r.asDict() for r in apply_ops.last_image(df).collect()}
    salted = {tuple(r[k] for k in ("db", "tbl", "pk")): r.asDict() for r in apply_ops.last_image_salted(df).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k] == salted[k], k
    hot = plain[("d", "t", "hot")]
    assert hot["n_changes"] == n
    assert hot["first_action"] == "INSERT" and hot["last_action"] == "UPDATE"
    assert hot["value"] == float(n - 1)


def test_last_image_adaptive_gates_on_skew(spark):
    """The adaptive collapse (r10 verdict #6) samples the batch and salts
    only above hot_rows_threshold — both branches produce the plain
    result exactly, and the gate picks the branch the skew estimate
    demands (SplitApplier.java:52-92's conditional-fallback shape)."""
    n = 50_000
    rows = [(1_000_000, 0, s, "UPDATE" if s else "INSERT", "d", "t", "hot", float(s)) for s in range(n)]
    rows += [(2_000_000 + s, 1, 0, "UPDATE", "d", "t", f"cold{s}", 42.0) for s in range(100)]
    df = _mk_cdc(spark, rows).repartition(8)

    plain = {tuple(r[k] for k in ("db", "tbl", "pk")): r.asDict()
             for r in apply_ops.last_image(df).collect()}

    # probe: the 2% sample must estimate the hot chain within ~±20%
    est_n, est_mx = apply_ops.estimate_top_key_share(df, ("db", "tbl", "pk"))
    assert 0.7 * n < est_mx < 1.3 * n
    assert 0.7 * (n + 100) < est_n < 1.3 * (n + 100)

    # below threshold → plain plan; above → salted plan. Both exact.
    for threshold in (10 ** 9, 1_000):
        got = {tuple(r[k] for k in ("db", "tbl", "pk")): r.asDict()
               for r in apply_ops.last_image_adaptive(
                   df, hot_rows_threshold=threshold,
                   size_floor_bytes=0).collect()}
        assert got == plain, f"threshold={threshold}"

    # the gate itself: plan shape differs (salted = two-stage agg)
    lo = apply_ops.last_image_adaptive(df, hot_rows_threshold=10 ** 9,
                                       size_floor_bytes=0)
    hi = apply_ops.last_image_adaptive(df, hot_rows_threshold=1_000,
                                       size_floor_bytes=0)
    lo_plan = lo._jdf.queryExecution().optimizedPlan().toString()
    hi_plan = hi._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in lo_plan
    assert "_salt" in hi_plan

    # tier 1: under the plan-stats size floor (default 1 GiB) the probe
    # itself is skipped — plain plan even with a hot threshold of 1.
    # (Needs a KNOWN-stats plan: range-derived; the createDataFrame
    # input above reports unknown stats → conservative probe.)
    small = spark.range(1000).selectExpr(
        "'d' AS db", "'t' AS tbl", "CAST(id % 3 AS STRING) AS pk",
        "LPAD(CAST(id AS STRING), 6, '0') AS tso",
        "'UPDATE' AS action", "CAST(id AS DOUBLE) AS value",
    )
    floored = apply_ops.last_image_adaptive(small, hot_rows_threshold=1)
    assert "_salt" not in floored._jdf.queryExecution().optimizedPlan().toString()
    # same frame, floor removed → probe sees hot chains over threshold 1
    probed = apply_ops.last_image_adaptive(
        small, hot_rows_threshold=1, sample_fraction=0.5, size_floor_bytes=0)
    assert "_salt" in probed._jdf.queryExecution().optimizedPlan().toString()


def test_big_transaction_assembly(spark):
    """One transaction spanning 100k events assembles into one complete
    token (TxnBuffer spill path in the reference; a counter here)."""
    from polardbx_cdc_spark.operators import merge

    n = 100_000
    rows = [(1_000_000, 7, s, "INSERT", "d", "t", str(s), 0.0) for s in range(n)]
    df = _mk_cdc(spark, rows).repartition(16)
    tok = merge.assemble_transactions(df).collect()
    assert len(tok) == 1
    t = tok[0]
    assert t["txn_size"] == n and t["complete"] and t["n_parties"] == 1


def test_special_characters_end_to_end(spark):
    """Unicode / quotes / separators survive checksum parity (vs DuckDB on
    the same parquet) and DML rendering escapes correctly."""
    texts = [
        "naïve — café ☕ 中文 🚀",
        "O'Brien said \"hi\"",
        "comma,separated|pipe\\backslash",
        "line\nbreak\ttab",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, s string")
    d = tempfile.mkdtemp(prefix="special_chars_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        spark_sums = {
            r["id"]: r["h"]
            for r in df.select(
                "id",
                F.conv(F.substring(F.md5(F.concat_ws(",", F.col("s"))), 1, 8), 16, 10)
                .cast("long")
                .alias("h"),
            ).collect()
        }
        con = duckdb.connect()
        duck_sums = dict(
            con.execute(
                f"SELECT id, CAST(('0x' || substr(md5(concat_ws(',', s)), 1, 8)) AS BIGINT) "
                f"FROM read_parquet('{d}/*.parquet')"
            ).fetchall()
        )
        assert spark_sums == duck_sums
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # DML rendering: quotes escaped, unicode passes through
    ops = spark.createDataFrame(
        [("d", "t", "O'Brien", "INSERT", 1.0), ("d", "t", "中文'😀", "DELETE", 0.0)],
        "db string, tbl string, pk string, op string, value double",
    )
    sqls = {r["pk"]: r["sql_text"] for r in appliers.render_dml(ops).collect()}
    assert "VALUES ('O''Brien', 1.0)" in sqls["O'Brien"]
    assert "WHERE pk = '中文''😀'" in sqls["中文'😀"]


def test_framing_interleaved_transactions(spark):
    """Two transactions whose event times interleave must still frame as
    whole contiguous blocks in commit order (Sorter.java release order)."""
    from polardbx_cdc_spark.operators.merge import frame_transactions

    # txn 0: events at t=10,30,50 (commit 50); txn 1: events at 20,40 (commit 40)
    rows = [
        (10, 0, 0, "INSERT", "d", "t", "a", 1.0),
        (30, 0, 1, "UPDATE", "d", "t", "a", 2.0),
        (50, 0, 2, "UPDATE", "d", "t", "a", 3.0),
        (20, 1, 0, "INSERT", "d", "t", "b", 9.0),
        (40, 1, 1, "UPDATE", "d", "t", "b", 8.0),
    ]
    df = _mk_cdc(spark, rows)
    framed = frame_transactions(df)
    ordered = framed.orderBy("txn_commit_tso", "frame_rank", "tso").collect()
    layout = [(r["action"], r["txn_id"]) for r in ordered]
    # txn 1 commits first (40 < 50) → its whole block precedes txn 0's
    assert layout == [
        ("BEGIN", 1), ("INSERT", 1), ("UPDATE", 1), ("COMMIT", 1),
        ("BEGIN", 0), ("INSERT", 0), ("UPDATE", 0), ("UPDATE", 0), ("COMMIT", 0),
    ], layout


def test_empty_and_single_row_inputs(spark):
    """Boundary sizes: empty frame and single event through the collapse."""
    empty = _mk_cdc(spark, []).filter(F.lit(False))
    assert apply_ops.collapse_ops(empty).count() == 0
    one = _mk_cdc(spark, [(1, 0, 0, "DELETE", "d", "t", "x", 1.0)])
    out = apply_ops.collapse_ops(one).collect()
    assert len(out) == 1 and out[0]["op"] == "DELETE"
    assert apply_ops.replay_to_state(one).count() == 0


def test_lang_id_multilanguage(spark):
    """Per-language stopword scoring picks the right language and falls
    back to 'other' below threshold; ties break en>es>de>fr."""
    from polardbx_cdc_spark.functions.text import lang_id

    rows = [
        (1, "the cat sat on the mat and it was the best of days"),
        (2, "el perro corre por la calle y los gatos se esconden en las casas"),
        (3, "der hund läuft und die katze schläft mit den kindern von heute"),
        (4, "le chien est dans les jardins pour une promenade qui dure"),
        (5, "zzz qqq xxx www yyy"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"] for r in df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "other", 6: "other"}


def test_asof_state_strict_vs_inclusive_and_missing_prior(spark):
    """AS-OF semantics pinned: strict probes see only changes with
    tso < probe_tso (a change AT the probe TSO is invisible); inclusive
    probes see it; a probe before any change gets NULLs."""
    ch = _mk_cdc(
        spark,
        [
            (100, 1, 0, "INSERT", "db0", "t0", "a", 1.0),
            (200, 2, 0, "UPDATE", "db0", "t0", "a", 2.0),
            (300, 3, 0, "UPDATE", "db0", "t0", "a", 3.0),
        ],
    )
    tso_at = {r["value"]: r["tso"] for r in ch.collect()}
    probes = spark.createDataFrame(
        [("db0", "t0", "a", tso_at[2.0]), ("db0", "t0", "a", "0" * 48)],
        "db string, tbl string, pk string, probe_tso string",
    )
    strict = {
        r["probe_tso"]: (r["asof_action"], r["asof_value"])
        for r in apply_ops.asof_state(ch, probes, strict=True).collect()
    }
    # probe AT the t=200 update sees only the INSERT (1.0)
    assert strict[tso_at[2.0]] == ("INSERT", 1.0)
    # probe before everything: key didn't exist yet
    assert strict["0" * 48] == (None, None)
    incl = {
        r["probe_tso"]: (r["asof_action"], r["asof_value"])
        for r in apply_ops.asof_state(ch, probes, strict=False).collect()
    }
    # inclusive probe AT the update sees the update itself
    assert incl[tso_at[2.0]] == ("UPDATE", 2.0)


def test_asof_state_multiple_probes_per_key_one_pass(spark):
    """Any number of probes per key resolve in the same single window
    pass — each sees exactly the changes before it."""
    ch = _mk_cdc(
        spark,
        [(100 * (i + 1), i, 0, "UPDATE", "db0", "t0", "k", float(i)) for i in range(10)],
    )
    tsos = sorted(r["tso"] for r in ch.collect())
    probes = spark.createDataFrame(
        [("db0", "t0", "k", t) for t in tsos],
        "db string, tbl string, pk string, probe_tso string",
    )
    out = apply_ops.asof_state(ch, probes, strict=True).collect()
    by_probe = {r["probe_tso"]: r["asof_value"] for r in out}
    assert by_probe[tsos[0]] is None
    for i in range(1, 10):
        assert by_probe[tsos[i]] == float(i - 1)


def test_bpe_encode_corpus_oracle_symmetry_on_hostile_text(spark, tmp_path):
    """Round-9 review find: the text_bpe_encode_corpus query/oracle pair
    must stay hash-equal on MIXED-CASE and tab/newline/multi-space text,
    not just the clean lowercase single-space corpus the generator
    happens to emit."""
    import duckdb

    from polardbx_cdc_spark import queries as Q

    docs = [
        (0, "srcA", "The THeatre  at\tRome"),
        (1, "srcB", " that\nrobot ate the\t\tro "),
        (2, "srcC", "ATRO path   math\n"),
        (3, "srcD", "THE the ThE tHe"),
        (4, "srcE", "a"),
    ]
    d = str(tmp_path / "hostile")
    import os

    os.makedirs(d)
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    sdf = Q.queries()["text_bpe_encode_corpus"](spark, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    from tests.oracle_compare import compare

    ok, detail = compare(sdf, con, Q.oracle_sql()["text_bpe_encode_corpus"])
    assert ok, detail
