import numpy as np
from pyspark.sql import functions as F

from ffcl_spark.operators import similarity as SIM


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 50 == 0)
    got = SIM.cosine_topk(emb, qs, 5).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    expected = set()
    for qi in np.nonzero(ids % 50 == 0)[0]:
        sims = Vn[qi] @ Vn.T
        sims[qi] = -np.inf  # self excluded
        # (−cos, id) order
        order = np.lexsort((ids, -sims))[:5]
        expected |= {(ids[qi], ids[j]) for j in order}
    assert set(zip(got.q_id, got.n_id)) == expected


def test_ivf_recall_reasonable(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    exact = SIM.cosine_topk(emb, qs, 5).toPandas()
    cents = SIM.train_ivf_centroids(emb, 8)
    approx = SIM.ivf_topk(emb, qs, 5, cents, n_probe=4).toPandas()
    exact_pairs = set(zip(exact.q_id, exact.n_id))
    approx_pairs = set(zip(approx.q_id, approx.n_id))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall


def test_cosine_neardup_threshold(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near dup of 0
        (2, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = SIM.cosine_neardup_pairs(df, 0.99).toPandas()
    assert set(zip(got.id_a, got.id_b)) == {(0, 1)}


def _planted(spark, n_base=60, dims=16, seed=5):
    """Base unit vectors + perturbed copies with cos ≈ 0.92-0.98."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dims))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(n_base, dims))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    alpha = rng.uniform(0.15, 0.35, size=(n_base, 1))
    dup = base + alpha * noise
    rows = [(int(i), [float(v) for v in base[i]]) for i in range(n_base)] + [
        (int(i + 100000), [float(v) for v in dup[i]]) for i in range(n_base)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_neardup_recall_vs_brute(spark):
    df = _planted(spark).cache()
    t = 0.9
    brute = SIM.cosine_neardup_pairs(df, t).toPandas()
    lsh = SIM.lsh_neardup_pairs(df, t, dims=16).toPandas()
    bp = set(zip(brute.id_a, brute.id_b))
    lp = set(zip(lsh.id_a, lsh.id_b))
    assert len(bp) >= 30  # the planted dups are really above threshold
    assert lp <= bp  # exact verification: no false positives, ever
    recall = len(lp & bp) / len(bp)
    assert recall >= 0.95, recall


def test_lsh_signatures_deterministic(spark):
    df = _planted(spark)
    a = SIM.hyperplane_signatures(df.repartition(2), 16).toPandas().sort_values("id")
    b = SIM.hyperplane_signatures(df.repartition(7), 16).toPandas().sort_values("id")
    assert [list(x) for x in a.sig] == [list(x) for x in b.sig]


def test_pq_codebooks_deterministic_and_encode_matches_numpy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    cb1 = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    cb2 = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    assert np.array_equal(cb1, cb2)
    m, k_codes, dsub = cb1.shape
    assert (m, dsub) == (8, len(emb.first().embedding) // 8)

    got = SIM.pq_encode(emb, cb1).toPandas().sort_values("id").reset_index(drop=True)
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    X = np.array(pdf.embedding.tolist(), dtype=np.float64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        dist = (
            np.sum(sub**2, axis=1)[:, None]
            + np.sum(cb1[j] ** 2, axis=1)[None, :]
            - 2.0 * sub @ cb1[j].T
        )
        exp = dist.argmin(axis=1)
        codes = np.array(got.code.tolist(), dtype=np.int64)
        assert np.array_equal(codes[:, j], exp), f"subspace {j}"


def test_pq_topk_recall_vs_exact_l2(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    got = SIM.pq_topk(emb, qs, 5, cb, refine=8).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    exact_pairs = set()
    for qi in np.nonzero(ids % 25 == 0)[0]:
        d = np.sum((V - V[qi]) ** 2, axis=1)
        d[qi] = np.inf  # self excluded
        order = np.lexsort((ids, d))[:5]
        exact_pairs |= {(ids[qi], ids[j]) for j in order}
    got_pairs = set(zip(got.q_id, got.n_id))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    # ADC shortlist + exact re-rank: every returned pair is exactly
    # ranked within the shortlist, so errors are only shortlist misses
    assert recall >= 0.6, recall
    # the returned l2 values are the TRUE distances (exact re-rank)
    sample = got.head(20)
    id_to_row = {i: n for n, i in enumerate(ids)}
    for _, r in sample.iterrows():
        true_l2 = float(np.sum((V[id_to_row[r.q_id]] - V[id_to_row[r.n_id]]) ** 2))
        assert abs(true_l2 - r.l2) < 1e-9


def test_ivf_pq_topk_recall_and_bucket_prune(spark):
    # IVF×PQ composition (FAISS IndexIVFPQ shape): codes scanned only
    # within probed buckets; recall vs exact L2 pinned; every returned
    # l2 is the TRUE distance (exact re-rank); deterministic.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    k = 5
    cents = SIM.train_ivf_centroids(emb, 8)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    got = SIM.ivf_pq_topk(emb, qs, k, cents, cb, n_probe=4, refine=8).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    exact_pairs = set()
    for qi in np.nonzero(ids % 25 == 0)[0]:
        d = np.sum((V - V[qi]) ** 2, axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:k]
        exact_pairs |= {(ids[qi], ids[j]) for j in order}
    got_pairs = set(zip(got.q_id, got.n_id))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall

    # true-distance re-rank: returned l2 equals the exact L2
    id_to_row = {i: n for n, i in enumerate(ids)}
    for _, r in got.head(20).iterrows():
        d = np.sum(
            (V[id_to_row[r.q_id]].astype(np.float64) - V[id_to_row[r.n_id]]) ** 2
        )
        assert abs(d - r.l2) < 1e-9

    # bucket prune is real: every returned neighbor lies in one of its
    # query's probed buckets (replay the assignment in NumPy)
    dq = (
        np.sum(V**2, axis=1)[:, None]
        + np.sum(cents**2, axis=1)[None, :]
        - 2.0 * V @ cents.T
    )
    bucket_of = {ids[i]: int(np.lexsort((np.arange(len(cents)), dq[i]))[0]) for i in range(len(ids))}
    probes = {
        ids[i]: set(np.lexsort((np.arange(len(cents)), dq[i]))[:4].tolist())
        for i in np.nonzero(ids % 25 == 0)[0]
    }
    for _, r in got.iterrows():
        assert bucket_of[r.n_id] in probes[r.q_id], (r.q_id, r.n_id)

    again = SIM.ivf_pq_topk(emb, qs, k, cents, cb, n_probe=4, refine=8).toPandas()
    assert set(zip(again.q_id, again.n_id)) == got_pairs


def test_pq_join_distributed_queries(spark):
    """pq_join: the distributed-query ADC path. Recall vs exact L2,
    true-distance re-rank, and partitioning invariance (multi-block
    forced) — the properties that make it the all-pairs-capable form."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    k = 5
    got = SIM.pq_join(qs, emb, k, cb, refine=8).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    exact_pairs = set()
    for qi in np.nonzero(ids % 25 == 0)[0]:
        d = np.sum((V - V[qi]) ** 2, axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:k]
        exact_pairs |= {(ids[qi], ids[j]) for j in order}
    got_pairs = set(zip(got.q_id, got.n_id))
    assert len(got) == k * qs.count()
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.6, recall
    # returned l2 values are TRUE distances (exact re-rank)
    id_to_row = {i: n for n, i in enumerate(ids)}
    for _, r in got.head(20).iterrows():
        true_l2 = float(np.sum((V[id_to_row[r.q_id]] - V[id_to_row[r.n_id]]) ** 2))
        assert abs(true_l2 - r.l2) < 1e-9
    # partitioning invariance: force multi-block on BOTH sides and a
    # different input partitioning — identical rows (deterministic
    # (adc, n_id) block tie-break + scalar global merge)
    again = SIM.pq_join(
        qs.repartition(7),
        emb.repartition(13),
        k,
        cb,
        refine=8,
        ref_block_rows=100,
        query_block_rows=8,
    ).toPandas()
    a = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])
    assert np.allclose(a.l2.to_numpy(), b.l2.to_numpy(), rtol=0, atol=0)


def test_ivf_pq_join_distributed_queries(spark):
    """ivf_pq_join: distributed-query IVF x PQ. Recall vs exact L2,
    bucket-prune containment (every returned neighbor lies in one of
    the query's probed buckets), true-distance re-rank, and
    partitioning invariance."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cents = SIM.train_ivf_centroids(emb, 8)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    k, n_probe = 5, 4
    got = SIM.ivf_pq_join(qs, emb, k, cents, cb, n_probe=n_probe, refine=8).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    id_to_row = {i: n for n, i in enumerate(ids)}
    # NumPy twin of bucket assignment and probe sets
    d_c = (
        np.sum(V**2, axis=1)[:, None]
        + np.sum(cents**2, axis=1)[None, :]
        - 2.0 * V @ cents.T
    )
    ref_bucket = np.lexsort(
        (np.broadcast_to(np.arange(len(cents)), d_c.shape), d_c), axis=1
    )[:, 0]
    probes = np.lexsort(
        (np.broadcast_to(np.arange(len(cents)), d_c.shape), d_c), axis=1
    )[:, :n_probe]

    exact_pairs = set()
    for qi in np.nonzero(ids % 25 == 0)[0]:
        d = np.sum((V - V[qi]) ** 2, axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:k]
        exact_pairs |= {(ids[qi], ids[j]) for j in order}
    got_pairs = set(zip(got.q_id, got.n_id))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall
    for q_id, n_id in got_pairs:
        # returned neighbor must be inside the query's probed buckets
        assert ref_bucket[id_to_row[n_id]] in probes[id_to_row[q_id]]
    # true-distance re-rank
    for _, r in got.head(20).iterrows():
        true_l2 = float(np.sum((V[id_to_row[r.q_id]] - V[id_to_row[r.n_id]]) ** 2))
        assert abs(true_l2 - r.l2) < 1e-9
    # partitioning invariance
    again = SIM.ivf_pq_join(
        qs.repartition(7), emb.repartition(13), k, cents, cb, n_probe=n_probe, refine=8
    ).toPandas()
    a = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])


def test_ann_index_at_rest(spark, tmp_path):
    """write_ann_index / read_ann_index: stored (id, code, bucket)
    table + metadata sidecar. Queries over the stored index must equal
    the on-the-fly path exactly, and the bucket filter must
    partition-prune the parquet scan (probed buckets' files only)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cents = SIM.train_ivf_centroids(emb, 8)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    path = str(tmp_path / "ann_index")
    SIM.write_ann_index(emb, cents, cb, path)
    coded, cents2, cb2 = SIM.read_ann_index(spark, path)
    assert np.array_equal(cents, cents2) and np.array_equal(cb, cb2)
    assert coded.count() == emb.count()

    # partition pruning: the bucket predicate must land in the scan's
    # PartitionFilters (inputFiles() shows the pre-pruning listing, so
    # the physical plan is the thing to check)
    import contextlib
    import io

    one = coded.where(F.col("bucket") == int(coded.agg(F.min("bucket")).first()[0]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt
    assert "bucket" in txt.split("PartitionFilters", 1)[1][:200]

    k = 5
    fly_topk = SIM.ivf_pq_topk(emb, qs, k, cents, cb, n_probe=4, refine=8).toPandas()
    idx_topk = SIM.ivf_pq_topk(
        emb, qs, k, cents2, cb2, n_probe=4, refine=8, coded=coded
    ).toPandas()
    a = fly_topk.sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = idx_topk.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])

    fly_join = SIM.ivf_pq_join(qs, emb, k, cents, cb, n_probe=4, refine=8).toPandas()
    idx_join = SIM.ivf_pq_join(
        qs, emb, k, cents2, cb2, n_probe=4, refine=8, coded=coded
    ).toPandas()
    a = fly_join.sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = idx_join.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])


def test_adc_query_chunking_invariance(spark, monkeypatch):
    """The in-kernel query-axis chunk bound (_ADC_SLAB_CELLS) is a pure
    memory reorganization: forcing pathologically small chunks (a few
    rows per dense slab) must reproduce the default output bit-for-bit
    on both distributed-query paths."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)
    cents = SIM.train_ivf_centroids(emb, 8)
    k = 5
    base_pq = SIM.pq_join(qs, emb, k, cb, refine=8).toPandas()
    base_ivf = SIM.ivf_pq_join(qs, emb, k, cents, cb, n_probe=3, refine=8).toPandas()
    # non-vacuous guard: the helper itself, called directly, must be
    # chunk-invariant (slab of 1 cell = one query row per slab)
    import pandas as pd

    rng = np.random.default_rng(3)
    dim = cb.shape[0] * cb.shape[2]  # m × dsub
    qpdf = pd.DataFrame(
        {"q_id": np.arange(9), "v": list(rng.normal(size=(9, dim)))}
    )
    rpdf = pd.DataFrame(
        {
            "n_id": np.arange(40),
            "code": list(rng.integers(0, 16, size=(40, 8)).astype(np.int64)),
        }
    )
    c_sq = np.sum(cb**2, axis=2)
    whole = SIM._adc_block_candidates(qpdf, rpdf, 7, cb, c_sq, 10**9)
    tiny = SIM._adc_block_candidates(qpdf, rpdf, 7, cb, c_sq, 1)
    key = ["q_id", "n_id"]
    a = whole.sort_values(key).reset_index(drop=True)
    b = tiny.sort_values(key).reset_index(drop=True)
    # identical candidate sets; adc agrees to the BLAS last ulp (slab
    # changes regroup the matmuls — shortlist robustness comes from the
    # refine margin + exact re-rank, asserted on the operators below)
    assert a[key].equals(b[key])
    assert np.allclose(a.adc.to_numpy(), b.adc.to_numpy(), rtol=1e-12, atol=0)
    # arrival-order invariance at a FIXED slab is exact (queries are
    # re-sorted by id before chunking)
    perm = SIM._adc_block_candidates(
        qpdf.sample(frac=1.0, random_state=5), rpdf, 7, cb, c_sq, 1
    )
    assert perm.sort_values(key).reset_index(drop=True).equals(b)

    # ~3 query rows per slab at 500 refs — dozens of chunks per task;
    # the kernels capture the bound driver-side, so the patch ships
    monkeypatch.setattr(SIM, "_ADC_SLAB_CELLS", 1500)
    tiny_pq = SIM.pq_join(qs, emb, k, cb, refine=8).toPandas()
    tiny_ivf = SIM.ivf_pq_join(qs, emb, k, cents, cb, n_probe=3, refine=8).toPandas()
    for base, tiny in ((base_pq, tiny_pq), (base_ivf, tiny_ivf)):
        a = base.sort_values(["q_id", "rank"]).reset_index(drop=True)
        b = tiny.sort_values(["q_id", "rank"]).reset_index(drop=True)
        assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])
        assert np.allclose(a.l2.to_numpy(), b.l2.to_numpy(), rtol=0, atol=0)


def _moments_twin(V, scale=10**4):
    """Exact-integer twin of embedding_moments_exact (Python ints)."""
    import numpy as np

    x = V.astype(np.float64) * scale
    # Spark F.round is HALF_UP (away from zero); np.round is half-even
    q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
    q = np.vectorize(int)(q.astype(object))
    n, d = q.shape
    s = q.sum(axis=0)
    out = {}
    for i in range(d):
        for j in range(i, d):
            spp = int((q[:, i] * q[:, j]).sum())
            num = n * spp - int(s[i]) * int(s[j])
            cov = float(num) / float(n * (n - 1)) / float(scale * scale)
            out[(i, j)] = (
                float(int(s[i])) / n / scale,
                float(int(s[j])) / n / scale,
                cov,
            )
    return out


def test_embedding_moments_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    V = np.array(pdf.embedding.tolist(), dtype=np.float32)
    d = V.shape[1]
    got = SIM.embedding_moments_exact(emb, d).toPandas()
    assert len(got) == d * (d + 1) // 2
    want = _moments_twin(V)
    for _, r in got.iterrows():
        mi, mj, cov = want[(r.i, r.j)]
        # fixed-point integer sums → bit-exact, not approximately equal
        assert r.mean_i == mi and r.mean_j == mj, (r.i, r.j)
        assert r["cov"] == cov, (r.i, r.j)  # ["cov"]: .cov is a pandas method
    # partitioning invariance: same bits at different parallelism
    got2 = (
        SIM.embedding_moments_exact(emb.repartition(13), d)
        .toPandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    g1 = got.sort_values(["i", "j"]).reset_index(drop=True)
    assert (g1["cov"] == got2["cov"]).all() and (g1.mean_i == got2.mean_i).all()


def test_pca_project_matches_numpy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    d, k = V.shape[1], 4

    mean, comps, ev = SIM.pca_components(emb, d, k)
    # components are orthonormal, variances descending
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    assert (np.diff(ev) <= 1e-12).all()
    # deterministic sign: largest-|component| entry positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0

    out = SIM.pca_project(emb, d, k, components=(mean, comps))
    got = out.select("vec_id", "pca").toPandas().sort_values("vec_id")
    P = np.array(got.pca.tolist())
    want = (V - mean) @ comps.T
    assert P.shape == (len(V), k)
    assert np.allclose(P, want, atol=1e-9)
    # projection really captures the top of the spectrum
    assert ev[0] >= np.var(V, axis=0, ddof=1).max() - 1e-9


def test_append_ann_index_maintenance(spark, tmp_path):
    """Epoch append with the frozen-model contract: new refs encoded
    with the STORED centroids/codebooks; (build half + append half)
    answers queries identically to a one-shot full build; epoch replay
    is idempotent."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    half0 = emb.where(F.col("vec_id") % 2 == 0)
    half1 = emb.where(F.col("vec_id") % 2 == 1)
    qs = emb.where(F.col("vec_id") % 25 == 0)
    cents = SIM.train_ivf_centroids(emb, 8)
    cb = SIM.train_pq_codebooks(emb, m=8, k_codes=16)

    inc = str(tmp_path / "ann_inc")
    SIM.write_ann_index(half0, cents, cb, inc)
    SIM.append_ann_index(half1, inc, epoch=1)
    full = str(tmp_path / "ann_full")
    SIM.write_ann_index(emb, cents, cb, full)

    coded_i, c_i, b_i = SIM.read_ann_index(spark, inc)
    coded_f, _, _ = SIM.read_ann_index(spark, full)
    assert coded_i.count() == coded_f.count() == emb.count()

    k = 5
    a = (
        SIM.ivf_pq_topk(emb, qs, k, c_i, b_i, n_probe=4, refine=8, coded=coded_i)
        .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    )
    b = (
        SIM.ivf_pq_topk(emb, qs, k, cents, cb, n_probe=4, refine=8, coded=coded_f)
        .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    )
    assert a[["q_id", "n_id", "rank"]].equals(b[["q_id", "n_id", "rank"]])

    # replay epoch 1: no duplicate codes
    SIM.append_ann_index(half1, inc, epoch=1)
    coded_r, _, _ = SIM.read_ann_index(spark, inc)
    assert coded_r.count() == emb.count()


def test_pca_whiten(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d, k = 64, 4
    out = SIM.pca_project(emb, d, k, whiten=True).select("pca").toPandas()
    P = np.array(out.pca.tolist())
    # whitened projections have unit sample variance on every axis
    # (up to the fixed-point quantization of the covariance: the
    # eigenvalues describe the scale-1e4-rounded data, the raw floats
    # differ in the ~1e-4 digit)
    assert np.allclose(P.var(axis=0, ddof=1), 1.0, atol=1e-3)
    import pytest

    mean, comps, _ = SIM.pca_components(emb, d, k)
    with pytest.raises(ValueError, match="whiten"):
        SIM.pca_project(emb, d, k, components=(mean, comps), whiten=True)


def test_semantic_neardup_k1_equals_brute(spark):
    """n_clusters=1 degrades exactly to the brute cosine pair set
    (same ids, same cos values)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    brute = SIM.cosine_neardup_pairs(emb, 0.4).toPandas()
    sem = SIM.semantic_neardup_pairs(emb, 0.4, n_clusters=1).toPandas()
    bset = {(r.id_a, r.id_b): r.cos for r in brute.itertuples()}
    sset = {(r.id_a, r.id_b): r.cos for r in sem.itertuples()}
    assert bset.keys() == sset.keys() and len(bset) > 0
    for k in bset:
        assert sset[k] == bset[k]


def test_semantic_dedup_groups_and_closure(spark):
    """Planted clique chains collapse to one canonical keep under the
    clustered pass (identical/near vectors share a cluster), output
    contract matches dedup_groups (min-id canonical, singleton size
    1), and pairs ⊆ the brute pair set (clustering only prunes)."""
    import numpy as np

    rng = np.random.default_rng(11)
    dims = 8
    base = rng.normal(size=(12, dims))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for i in range(12):
        rows.append((vid, base[i].tolist())); vid += 1
    # chain A~B~C near vec 0: B between A and C so A~C may miss the cut
    a = base[0]
    d = rng.normal(size=dims); d -= (d @ a) * a; d /= np.linalg.norm(d)
    for ang in (0.05, 0.10):  # cos(0.05)≈0.9988, cos(0.10)≈0.995
        v = np.cos(ang) * a + np.sin(ang) * d
        rows.append((vid, (v / np.linalg.norm(v)).tolist())); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    t = 0.998  # A~B (0.9988) and B~C (0.9988) pass; A~C (0.995) fails
    sem_pairs = SIM.semantic_neardup_pairs(df, t, n_clusters=4).toPandas()
    brute = SIM.cosine_neardup_pairs(df, t).toPandas()
    sp = set(zip(sem_pairs.id_a, sem_pairs.id_b))
    bp = set(zip(brute.id_a, brute.id_b))
    assert sp <= bp  # clustering only prunes
    assert (0, 12) in sp and (12, 13) in sp  # the chain survived
    assert (0, 13) not in bp  # A~C genuinely below the cut

    got = SIM.semantic_dedup(df, t, n_clusters=4).toPandas().set_index("id")
    assert got.loc[0].canonical_id == 0
    assert got.loc[12].canonical_id == 0  # closure: A~B
    assert got.loc[13].canonical_id == 0  # closure: B~C without A~C
    assert got.loc[0].group_size == 3
    # untouched vectors are their own singleton groups
    assert got.loc[5].canonical_id == 5 and got.loc[5].group_size == 1
    assert len(got) == 14
