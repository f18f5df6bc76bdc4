"""Spatial surface: MySQL geometry WKB codec, Arrow-batched decode,
grid-cell radius join laws + plan gates, chunk-dedup rewrite laws."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from polardbx_cdc_spark.functions import spatial as S
from polardbx_cdc_spark.functions.dedupe import chunk_dedup_rewrite


# ------------------------------------------------------------------
# Pure-Python WKB codec
# ------------------------------------------------------------------

def test_point_wkb_layout_matches_mysql_doc():
    # GeometryField.java:24-30 documents the exact layout:
    # srid(4) | order 01 | type 01000000 | x | y — little-endian
    b = S.point_wkb(1.0, -1.0, srid=0)
    assert len(b) == 25
    assert b[:4] == b"\x00\x00\x00\x00"
    assert b[4] == 1
    assert b[5:9] == b"\x01\x00\x00\x00"
    assert b[9:17] == bytes.fromhex("000000000000F03F")
    assert b[17:25] == bytes.fromhex("000000000000F0BF")


@pytest.mark.parametrize("srid", [0, 4326, 3857])
def test_point_roundtrip(srid):
    srid2, gtype, coords = S.parse_mysql_geometry(
        S.point_wkb(12.5, -0.25, srid=srid))
    assert (srid2, gtype, coords) == (srid, S.WKB_POINT, [(12.5, -0.25)])


def test_linestring_polygon_roundtrip():
    ls = S.linestring_wkb([(0.0, 0.0), (1.5, 2.5)], srid=7)
    assert S.parse_mysql_geometry(ls) == (
        7, S.WKB_LINESTRING, [(0.0, 0.0), (1.5, 2.5)])
    rings = [[(0, 0), (4, 0), (4, 4), (0, 0)], [(1, 1), (2, 1), (1, 1)]]
    srid, gtype, coords = S.parse_mysql_geometry(S.polygon_wkb(rings))
    assert gtype == S.WKB_POLYGON
    assert len(coords) == 7


def test_parse_rejects_trailing_bytes_and_unknown_type():
    with pytest.raises(ValueError, match="trailing"):
        S.parse_mysql_geometry(S.point_wkb(0, 0) + b"\x00")
    import struct as st
    bad = st.pack("<IBI", 0, 1, 99)
    with pytest.raises(ValueError, match="unsupported"):
        S.parse_mysql_geometry(bad)


# ------------------------------------------------------------------
# Arrow-batched decode
# ------------------------------------------------------------------

def test_geometry_props_mixed_and_null(spark):
    rows = [
        (1, S.point_wkb(1.5, -2.25, srid=4326)),
        (2, S.linestring_wkb([(0, 0), (1, 1), (2, 0.5)], srid=7)),
        (3, S.polygon_wkb(
            [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, g binary")
    got = {
        r["id"]: r for r in
        S.geometry_props(df, "g", scale=4).collect()
    }
    assert (got[1]["geo_srid"], got[1]["geo_gtype"],
            got[1]["geo_x"], got[1]["geo_y"]) == (4326, 1, 6, -9)
    assert (got[2]["geo_gtype"], got[2]["geo_npoints"],
            got[2]["geo_xmax"], got[2]["geo_ymax"]) == (2, 3, 8, 4)
    assert (got[3]["geo_gtype"], got[3]["geo_npoints"],
            got[3]["geo_xmin"], got[3]["geo_ymax"]) == (3, 5, 0, 16)
    assert all(got[4][f"geo_{f}"] is None for f in S._PROPS_FIELDS)


def test_geometry_props_point_fast_path_equals_slow_path(spark):
    # same values through the all-POINT numpy path and (forced by one
    # linestring) the WKB-walk path must decode identically
    pts = [(i, S.point_wkb(i / 1024.0, -i / 1024.0, srid=10))
           for i in range(50)]
    fast = spark.createDataFrame(pts, "id long, g binary")
    slow = spark.createDataFrame(
        pts + [(99, S.linestring_wkb([(0, 0), (1, 1)]))],
        "id long, g binary")
    a = {r["id"]: (r["geo_srid"], r["geo_x"], r["geo_y"]) for r in
         S.geometry_props(fast, "g", scale=1024).collect()}
    b = {r["id"]: (r["geo_srid"], r["geo_x"], r["geo_y"]) for r in
         S.geometry_props(slow, "g", scale=1024).collect()
         if r["id"] != 99}
    assert a == b
    assert a[7] == (10, 7, -7)


# ------------------------------------------------------------------
# Grid-cell radius join: brute-force law + plan gate
# ------------------------------------------------------------------

def test_cell_radius_join_matches_brute_force(spark):
    pts = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 7919) % 2000000 - 1000000).alias("x"),
        ((F.col("id") * 104729) % 2000000 - 1000000).alias("y"))
    probes = spark.range(7).select(
        F.col("id").alias("probe_id"),
        ((F.col("id") * 399887) % 2000000 - 1000000).alias("qx"),
        ((F.col("id") * 999983) % 2000000 - 1000000).alias("qy"))
    r = 150000
    j = S.cell_radius_join(pts, probes, radius=r)
    got = sorted((x["probe_id"], x["id"], x["dist2"]) for x in j.collect())
    P = [(x["id"], x["x"], x["y"]) for x in pts.collect()]
    Q = [(x["probe_id"], x["qx"], x["qy"]) for x in probes.collect()]
    want = sorted(
        (q[0], p[0], (p[1] - q[1]) ** 2 + (p[2] - q[2]) ** 2)
        for p, q in itertools.product(P, Q)
        if (p[1] - q[1]) ** 2 + (p[2] - q[2]) ** 2 <= r * r)
    assert got == want
    assert len(got) > 0


def test_cell_radius_join_plan_broadcasts_probes_never_cartesian(spark):
    pts = spark.range(100).select(
        F.col("id"), (F.col("id") * 3).alias("x"), (F.col("id") * 5).alias("y"))
    probes = spark.range(3).select(
        F.col("id").alias("pid"), F.col("id").alias("qx"),
        F.col("id").alias("qy"))
    j = S.cell_radius_join(pts, probes, radius=1000)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Broadcast" in plan


def test_cell_radius_join_rejects_cell_smaller_than_radius(spark):
    df = spark.range(1).select(
        F.col("id"), F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match="cell"):
        S.cell_radius_join(df, df.selectExpr("id", "x as qx", "y as qy"),
                           radius=100, cell=50)


def test_grid_cell_is_pure_catalyst(spark):
    # stays in codegen: no python UDF / BatchEvalPython in the plan
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 100).alias("x"),
        (F.col("id") * 200).alias("y"))
    out = df.select(S.grid_cell(F.col("x"), F.col("y"), 1000))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# ------------------------------------------------------------------
# chunk_dedup_rewrite laws
# ------------------------------------------------------------------

def test_chunk_rewrite_identity_when_no_duplicates(spark):
    docs = [(1, "a b c d e f"), (2, "g h i j k")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           chunk_dedup_rewrite(df, chunk_tokens=3).collect()}
    assert got[1]["text"] == "a b c d e f"
    assert (got[1]["n_chunks"], got[1]["n_kept"]) == (2, 2)
    assert got[2]["text"] == "g h i j k"
    assert (got[2]["n_chunks"], got[2]["n_kept"]) == (2, 2)


def test_chunk_rewrite_first_occurrence_wins(spark):
    # chunk "x y z" appears in docs 1 (pos 1), 2 (pos 0), 3 (twice):
    # only doc 1 keeps it — (doc_id, pos) = (1, 1) is the minimum
    docs = [
        (1, "a b c x y z"),
        (2, "x y z d e f"),
        (3, "x y z x y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           chunk_dedup_rewrite(df, chunk_tokens=3).collect()}
    assert got[1]["text"] == "a b c x y z"
    assert got[2]["text"] == "d e f"
    assert got[3]["text"] == ""
    assert (got[3]["n_chunks"], got[3]["n_kept"]) == (2, 0)


def test_chunk_rewrite_short_tail_chunk_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string")
    got = chunk_dedup_rewrite(df, chunk_tokens=3).collect()[0]
    assert got["text"] == "a b c d"
    assert got["n_chunks"] == 2


def test_chunk_rewrite_aggregate_not_window(spark):
    # the first-occurrence rule must ride a combiner-friendly partial
    # aggregate, not a per-chunk sort window (hot-chunk skew at scale)
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string")
    plan = chunk_dedup_rewrite(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Window" not in plan


# ------------------------------------------------------------------
# Point-in-polygon refine
# ------------------------------------------------------------------

def test_pip_pure_python_square_and_hole():
    square = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    assert S.point_in_polygon_py(5, 5, square)
    assert not S.point_in_polygon_py(15, 5, square)
    donut = square + [[(4, 4), (6, 4), (6, 6), (4, 6)]]
    assert not S.point_in_polygon_py(5, 5, donut)   # in the hole
    assert S.point_in_polygon_py(2, 5, donut)


def test_pip_concave_polygon():
    # U-shape: the notch (5, 6) is outside, the arms are inside
    u = [[(0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3),
          (3, 10), (0, 10)]]
    assert not S.point_in_polygon_py(5, 6, u)
    assert S.point_in_polygon_py(1, 8, u)
    assert S.point_in_polygon_py(8, 8, u)
    assert S.point_in_polygon_py(5, 1, u)


def test_points_in_region_matches_pure_python(spark):
    import random
    rng = random.Random(13)
    pts = [(i, rng.uniform(-2, 12), rng.uniform(-2, 12))
           for i in range(500)]
    rings = [[(0, 0), (10, 0), (10, 10), (0, 10)],
             [(4, 4), (6, 4), (6, 6), (4, 6)]]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = sorted(r["id"] for r in
                 S.points_in_region(df, rings).collect())
    want = sorted(i for i, x, y in pts
                  if S.point_in_polygon_py(x, y, rings))
    assert got == want
    assert 0 < len(got) < len(pts)


def test_points_in_region_bbox_prefilter_is_catalyst(spark):
    # the bbox stage must prune BEFORE the Python refine: the plan's
    # scan-side filter carries the range predicates
    df = spark.createDataFrame(
        [(1, 5.0, 5.0)], "id long, x double, y double")
    out = S.points_in_region(df, [[(0, 0), (10, 0), (10, 10), (0, 10)]])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "(x#" in plan or ">= 0.0" in plan


# ------------------------------------------------------------------
# Streaming parity: cell_radius_join on a readStream points source
# ------------------------------------------------------------------

def test_cell_radius_join_runs_unchanged_on_streams(spark, tmp_path):
    from pyspark.sql import functions as F

    pts = spark.range(500).select(
        F.col("id"),
        ((F.col("id") * 7919) % 2000000 - 1000000).alias("x"),
        ((F.col("id") * 104729) % 2000000 - 1000000).alias("y"))
    probes = spark.range(4).select(
        F.col("id").alias("probe_id"),
        ((F.col("id") * 399887) % 2000000 - 1000000).alias("qx"),
        ((F.col("id") * 999983) % 2000000 - 1000000).alias("qy"))
    src = str(tmp_path / "pts")
    pts.write.parquet(src)
    stream = spark.readStream.schema("id long, x long, y long").parquet(src)
    joined = S.cell_radius_join(stream, probes, radius=250000)
    out = str(tmp_path / "out")
    q = (joined.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = sorted((r["probe_id"], r["id"])
                 for r in spark.read.parquet(out).collect())
    want = sorted((r["probe_id"], r["id"]) for r in
                  S.cell_radius_join(pts, probes, radius=250000).collect())
    assert got == want and len(got) > 0


# ------------------------------------------------------------------
# StreamingChunkDedup: arrival-order scrub with durable digest state
# ------------------------------------------------------------------

def test_streaming_chunk_dedup_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    from polardbx_cdc_spark.functions.dedupe import (StreamingChunkDedup,
                                                     chunk_dedup_rewrite)

    docs = [
        (1, "a b c x y z"),
        (2, "x y z d e f"),
        (3, "g h i a b c"),
        (4, "x y z g h i j k l"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "src")
    # two id-ordered files → arrival order == doc_id order, so the
    # stream result must equal the batch rewrite exactly
    df.filter("doc_id <= 2").coalesce(1).write.parquet(src)
    df.filter("doc_id > 2").coalesce(1).write.mode("append").parquet(src)
    sink = StreamingChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"), chunk_tokens=3)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink.process_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    assert len(sink._committed()) == 2  # one epoch per file
    got = {r["doc_id"]: (r["text"], r["n_chunks"], r["n_kept"])
           for r in sink.result(spark).collect()}
    want = {r["doc_id"]: (r["text"], r["n_chunks"], r["n_kept"])
            for r in chunk_dedup_rewrite(df, chunk_tokens=3).collect()}
    assert got == want
    # cross-batch scrub actually happened: doc 4's "x y z"/"g h i" gone
    assert got[4][0] == "j k l"
    # crash-replay of a committed epoch is a NO-OP
    before = sorted(sink.result(spark).collect())
    sink.process_batch(df.filter("doc_id > 2"), 1)
    assert sorted(sink.result(spark).collect()) == before


def test_streaming_chunk_dedup_batch_never_scrubs_against_itself(
    spark, tmp_path
):
    from polardbx_cdc_spark.functions.dedupe import StreamingChunkDedup

    sink = StreamingChunkDedup(
        str(tmp_path / "s"), str(tmp_path / "o"), chunk_tokens=3)
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r s t u")], "doc_id long, text string")
    sink.process_batch(df, 0)
    got = {r["doc_id"]: r["text"] for r in sink.result(spark).collect()}
    # within-batch: doc 1 (lower id) keeps the shared chunk
    assert got == {1: "p q r", 2: "s t u"}
    # replaying epoch 0 after commit must not scrub doc 1 against the
    # digests its own epoch landed
    sink.process_batch(df, 0)
    assert {r["doc_id"]: r["text"] for r in
            sink.result(spark).collect()} == got
