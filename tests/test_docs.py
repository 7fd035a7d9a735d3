"""Interleaved docs: deterministic synthesis, coordinate round-trip,
span-sequence invariant through engine jobs."""

from pyspark.sql import functions as F

from ffcl_spark.datagen import docs_from_points, make_points
from ffcl_spark.operators import search as S
from ffcl_spark.operators import tiles as TL
from ffcl_spark.sources import docs as D
from ffcl_spark.sources import points as P


def test_synth_docs_deterministic(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = D.synth_docs(src, "doc_id", "text").toPandas().sort_values("doc_id")
    b = D.synth_docs(src, "doc_id", "text").toPandas().sort_values("doc_id")
    assert a.equals(b)


def test_media_ref_coordinate_roundtrip_exact(spark):
    """format %.3f → regexp parse → double must reproduce the derived
    coordinate bit-for-bit (milli-unit values are format-stable)."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = D.synth_docs(src, "doc_id", "text")
    pts = P.media_points(docs)
    pid = (
        F.regexp_extract("doc_id", r"doc-(\d+)", 1).cast("long") * 2
        + F.when(F.col("offset") > 0, 1).otherwise(0)
    )
    recomputed = pts.select(
        "id",
        "x",
        "y",
        D.derived_coord(pid, D.AX_MUL, D.AX_ADD).alias("ex"),
        D.derived_coord(pid, D.AY_MUL, D.AY_ADD).alias("ey"),
    )
    bad = recomputed.where(
        (F.col("x") != F.col("ex")) | (F.col("y") != F.col("ey"))
    ).count()
    assert bad == 0


def test_span_invariant_through_jobs(spark, cfg):
    docs = docs_from_points(spark, "blobs", 300).cache()
    before = docs
    pts = P.media_points(docs)
    # run engine jobs that consume the docs
    S.knn_join(pts, pts, 3, cfg).count()
    TL.pip_join(pts, TL.grid_tiles(spark, cfg), cfg).count()
    # docs unchanged: digest identical
    assert D.check_span_invariant(before, docs) == 0


def test_span_digest_detects_mutation(spark):
    docs = docs_from_points(spark, "blobs", 100)
    mutated = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.concat(s["text"], F.lit("x")).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    assert D.check_span_invariant(docs, mutated) > 0


def test_fixture_points_flow_into_media_spans(spark):
    docs = docs_from_points(spark, "noisy_circles", 200)
    pts = P.media_points(docs).toPandas()
    xy = make_points("noisy_circles", 200)
    got = {(round(x, 6), round(y, 6)) for x, y in zip(pts.x, pts.y)}
    exp = {(round(float(p[0]), 6), round(float(p[1]), 6)) for p in xy}
    assert got == exp
