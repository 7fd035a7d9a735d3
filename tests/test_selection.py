"""Deterministic data-selection operators (operators/sampling.py):
seeded subsampling / stratified / mixture / split / exact-k, each
checked against an independent pure-Python hashlib twin. Replaces the
reference's driver-local Fisher-Yates + MT19937 sampling surface
(Sampling.hpp:13-60, Distributions.hpp:16-61) with engine-portable
seeded-hash selection."""

import hashlib

import pandas as pd
import pytest

from ffcl_spark.operators import sampling as SP

HASH_SPACE = 1 << 32


def bucket(key, seed: int) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(600),
            "lang": [["en", "en", "en", "de", "zh", "fr"][i % 6] for i in range(600)],
            "source": [f"src{i % 10}" for i in range(600)],
        }
    )
    return spark.createDataFrame(pdf).repartition(7).cache(), pdf


def test_hash_sample_matches_twin_and_partitioning_invariant(spark, docs):
    df, pdf = docs
    kept = sorted(r.doc_id for r in SP.hash_sample(df, 0.25, seed=7).collect())
    twin = sorted(
        i for i in pdf.doc_id if bucket(i, 7) < int(0.25 * HASH_SPACE)
    )
    assert kept == twin and 0 < len(kept) < len(pdf)
    again = sorted(
        r.doc_id for r in SP.hash_sample(df.repartition(31), 0.25, seed=7).collect()
    )
    assert again == kept
    # disjoint seeds give different (independent) samples
    other = sorted(r.doc_id for r in SP.hash_sample(df, 0.25, seed=8).collect())
    assert other != kept


def test_stratified_sample_matches_twin(docs):
    df, pdf = docs
    rates = {"en": 0.3, "de": 0.9, "zh": 0.0}
    got = sorted(
        r.doc_id
        for r in SP.stratified_sample(df, "lang", rates, seed=11).collect()
    )
    twin = sorted(
        i
        for i, lang in zip(pdf.doc_id, pdf.lang)
        if bucket(i, 11) < int(rates.get(lang, 0.0) * HASH_SPACE)
    )
    assert got == twin
    langs = {r.lang for r in SP.stratified_sample(df, "lang", rates, seed=11).collect()}
    assert "zh" not in langs and "fr" not in langs  # rate 0 / unnamed dropped


def test_split_by_group_is_leakage_safe_and_total(docs):
    df, pdf = docs
    out = SP.split_by_group(df, 0.3, "source", seed=5).collect()
    assert len(out) == len(pdf)  # projection only: every row labeled
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())  # no group straddles
    sides = {r.split for r in out}
    assert sides == {"train", "test"}
    # twin: the side is decided by the group bucket
    for r in out[:50]:
        want = "test" if bucket(r.source, 5) < int(0.3 * HASH_SPACE) else "train"
        assert r.split == want


def test_mixture_rates_arithmetic():
    counts = {"en": 1000, "de": 100, "zh": 300}
    rates = SP.mixture_rates(counts, {"en": 0.5, "de": 0.25, "zh": 0.25})
    # de is the scarcest corpus: 100 rows at weight 0.25 -> total 400
    assert rates["de"] == 1.0
    assert rates["en"] == pytest.approx(400 * 0.5 / 1000)
    assert rates["zh"] == pytest.approx(400 * 0.25 / 300)
    with pytest.raises(ValueError):
        SP.mixture_rates(counts, {"en": 0.5, "xx": 0.5})
    with pytest.raises(ValueError):
        SP.mixture_rates(counts, {})


def test_mix_corpora_rate_path_matches_twin(docs):
    df, pdf = docs
    weights = {"en": 0.5, "de": 0.25, "zh": 0.25}
    out = SP.mix_corpora(df, "lang", weights, seed=7)
    got = sorted(r.doc_id for r in out.collect())
    counts = pdf[pdf.lang.isin(weights)].lang.value_counts().to_dict()
    rates = SP.mixture_rates(counts, weights)
    twin = sorted(
        i
        for i, lang in zip(pdf.doc_id, pdf.lang)
        if lang in rates and bucket(i, 7) < int(rates[lang] * HASH_SPACE)
    )
    assert got == twin
    # realized mixture is binomial-tight around the target
    mixed = pd.DataFrame([r.asDict() for r in out.collect()])
    frac_en = (mixed.lang == "en").mean()
    assert abs(frac_en - 0.5) < 0.1


def test_mix_corpora_exact_path_sizes_and_determinism(docs):
    df, pdf = docs
    weights = {"en": 0.5, "de": 0.25, "zh": 0.25}
    out = SP.mix_corpora(df, "lang", weights, seed=7, exact=True)
    rows = out.collect()
    counts = pdf[pdf.lang.isin(weights)].lang.value_counts().to_dict()
    feasible = min(counts[c] / w for c, w in weights.items())
    want = {c: int(feasible * w) for c, w in weights.items()}
    got = pd.Series([r.lang for r in rows]).value_counts().to_dict()
    assert got == want
    # exact path picks the smallest (bucket, id) per corpus — twin check
    for lang, n in want.items():
        ids = [i for i, lg in zip(pdf.doc_id, pdf.lang) if lg == lang]
        twin = sorted(ids, key=lambda i: (bucket(i, 7), i))[:n]
        assert sorted(r.doc_id for r in rows if r.lang == lang) == sorted(twin)


def test_topk_sample_exact_size_and_twin(docs):
    df, pdf = docs
    got = sorted(r.doc_id for r in SP.topk_sample(df, 40, seed=13).collect())
    twin = sorted(sorted(pdf.doc_id, key=lambda i: (bucket(i, 13), i))[:40])
    assert got == twin


def test_pack_chunks_matches_prefix_sum_oracle(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [
                " ".join(f"w{j}" for j in range(rng.integers(1, 40)))
                for _ in range(200)
            ],
        }
    )
    from ffcl_spark.operators.sampling import pack_chunks

    chunk = 128
    got = (
        pack_chunks(spark.createDataFrame(pdf), chunk)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    n_tok = pdf.text.str.split().str.len().to_numpy()
    start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    assert got.n_tokens.tolist() == n_tok.tolist()
    assert got.shard.tolist() == (start // chunk).tolist()
    assert got.offset.tolist() == (start % chunk).tolist()
    # a straddling doc exists on this fixture (boundaries cut docs)
    assert ((start % chunk) + n_tok > chunk).any()


def test_pack_chunks_invariant_across_partitioning(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [
                " ".join("x" * 1 for _ in range(rng.integers(1, 25)))
                for _ in range(300)
            ],
        }
    )
    from ffcl_spark.operators.sampling import pack_chunks

    frames = []
    for parts in (1, 3, 16):
        df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=parts))
        frames.append(
            pack_chunks(df, 64, partitions=parts)
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])
    pd.testing.assert_frame_equal(frames[0], frames[2])
