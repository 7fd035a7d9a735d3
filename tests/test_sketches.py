"""Sketch family: exact paths oracle-checked against DuckDB on the
real documents table (the in-pytest driver-gate pattern), sketch paths
pinned to their guarantees (no underestimate, additive merge,
partitioning invariance, bounded error) against the exact twins."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from ffcl_spark.operators.sketches import (
    count_min_estimate,
    count_min_heavy_hitters,
    count_min_table,
    distinct_count,
    heavy_hitters,
    quantiles,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_heavy_hitters_oracle_exact(docs, duck):
    got = (
        heavy_hitters(docs, "lang", 0.10)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = duck.sql(
        """
        SELECT lang, count(*) AS cnt,
               count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS share
        FROM documents GROUP BY lang
        HAVING count(*) >= 0.10 * (SELECT count(*) FROM documents)
        ORDER BY lang
        """
    ).df()
    assert list(got.lang) == list(want.lang)
    assert list(got.cnt) == list(want.cnt)
    np.testing.assert_array_equal(got.share.values, want.share.values)  # same division


def test_heavy_hitters_grouped(docs, duck):
    got = (
        heavy_hitters(docs, "source", 0.05, by="lang")
        .toPandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    want = duck.sql(
        """
        SELECT lang, source, count(*) AS cnt,
               count(*) / CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE) AS share
        FROM documents GROUP BY lang, source
        QUALIFY share >= 0.05
        ORDER BY lang, source
        """
    ).df()
    assert list(got.lang) == list(want.lang)
    assert list(got.source) == list(want.source)
    assert list(got.cnt) == list(want.cnt)


def test_count_min_guarantees(spark, docs):
    width, depth = 64, 4  # small width to make collisions real
    n = docs.count()
    cms = count_min_table(docs, "source", width, depth).cache()
    # table is bounded by d×w regardless of input size
    assert cms.count() <= width * depth
    est = count_min_estimate(cms, docs.select("source").distinct(), "source", depth)
    true = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    both = est.join(true, est.value == true.source).select("value", "est", "cnt").toPandas()
    assert len(both) == 20
    # never underestimates; deterministic additive error below N/width·e
    assert (both.est >= both.cnt).all()
    assert (both.est - both.cnt <= np.e * n / width).all()


def test_count_min_partitioning_invariant_and_mergeable(spark, docs):
    width, depth = 128, 3
    t1 = count_min_table(docs.repartition(1), "source", width, depth).toPandas()
    t16 = count_min_table(docs.repartition(16), "source", width, depth).toPandas()
    k = ["depth", "bucket"]
    assert t1.sort_values(k).reset_index(drop=True).equals(
        t16.sort_values(k).reset_index(drop=True)
    )
    # additive merge: sketch(half A) + sketch(half B) == sketch(all)
    a = count_min_table(docs.where("doc_id % 2 = 0"), "source", width, depth)
    b = count_min_table(docs.where("doc_id % 2 = 1"), "source", width, depth)
    merged = (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
        .sort_values(k)
        .reset_index(drop=True)
    )
    full = (
        count_min_table(docs, "source", width, depth)
        .select("depth", "bucket", "cnt")
        .toPandas()
        .sort_values(k)
        .reset_index(drop=True)
    )
    assert merged.equals(full)


def test_cm_heavy_hitters_match_exact(docs):
    # the sketch candidates-then-verify path returns EXACTLY the exact
    # operator's answer (no false negatives by the CMS overestimate
    # property; verification removes false positives)
    exact = (
        heavy_hitters(docs, "source", 0.04)
        .select("source", "cnt")
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    sk = (
        count_min_heavy_hitters(docs, "source", 0.04, width=64, depth=4)
        .select("source", "cnt")
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert exact.equals(sk)


def test_distinct_exact_and_hll(docs, duck):
    want = duck.sql("SELECT count(DISTINCT source) FROM documents").fetchone()[0]
    got = distinct_count(docs, ["source"]).head()[0]
    assert got == want
    approx = distinct_count(docs, ["source"], exact=False, rsd=0.02).head()[0]
    assert abs(approx - want) <= max(2, 3 * 0.02 * want)
    # multi-column
    want2 = duck.sql("SELECT count(DISTINCT (lang, source)) FROM documents").fetchone()[0]
    got2 = distinct_count(docs, ["lang", "source"]).head()[0]
    assert got2 == want2


def test_quantiles_exact_vs_duckdb(docs, duck):
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = quantiles(docs, "n_chars", probs).toPandas().iloc[0].to_numpy(dtype=float)
    want = np.array(
        duck.sql(
            "SELECT "
            + ", ".join(f"quantile_cont(n_chars, {p})" for p in probs)
            + " FROM documents"
        ).fetchone(),
        dtype=float,
    )
    # both are PERCENTILE_CONT: same rank formula, engines may differ
    # in the final interpolation's operation order only
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_quantiles_grouped_and_approx(docs, duck):
    got = (
        quantiles(docs, "n_chars", [0.5], by="lang")
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = duck.sql(
        "SELECT lang, quantile_cont(n_chars, 0.5) AS m FROM documents"
        " GROUP BY lang ORDER BY lang"
    ).df()
    assert list(got.lang) == list(want.lang)
    np.testing.assert_allclose(got.q_0_5.values, want.m.values, rtol=1e-12)
    # approx path: rank error ≤ n/accuracy ⇒ with accuracy 10k on 500
    # rows the summary is exact at the retrieved rank — allow one rank
    ex = quantiles(docs, "n_chars", [0.5]).head()[0]
    ap = quantiles(docs, "n_chars", [0.5], exact=False).head()[0]
    vals = np.sort(
        np.array([r.n_chars for r in docs.select("n_chars").collect()])
    )
    lo = np.searchsorted(vals, min(ex, ap)) - 2
    hi = np.searchsorted(vals, max(ex, ap)) + 2
    assert hi - lo <= len(vals) * 0.02 + 6
