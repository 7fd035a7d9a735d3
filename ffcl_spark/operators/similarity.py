"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline. Queries are a
  (small) subset → broadcast; the dot product runs JVM-side via
  zip_with + aggregate (no Python). Ranking tie-breaks by neighbor id.
- cosine near-dup pairs: threshold variant.
- IVF (inverted-file) ANN: the scale path — k-means-lite centroids
  (driver NumPy over a bounded sample), refs bucketed by nearest
  centroid, queries probe the top-``n_probe`` nearest buckets only.
  Recall is tested against the brute-force baseline in pytest.
- PQ (product quantization) ANN: ADC over compressed codes + exact
  re-rank, in two query contracts — ``pq_topk`` (bounded broadcast
  query set, driver-built LUTs) and ``pq_join`` (queries as a
  DataFrame: blocked cogroup, LUTs built in-kernel — the
  all-pairs-capable form); ``ivf_pq_topk`` / ``ivf_pq_join`` compose
  both prunes under the same two query contracts.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    refs: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, n_id, rank) of the k most cosine-similar refs per query
    (self excluded when ids collide); ties broken by n_id."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    r = refs.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
    )
    # compute the similarity, then drop the vectors BEFORE the window —
    # otherwise every 64-float array rides through the rank shuffle
    sim = (
        F.broadcast(q)
        .crossJoin(r)
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("n_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


def cosine_neardup_pairs(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id_a, id_b) with cosine ≥ threshold, id_a < id_b. Brute-force
    form — compose with IVF bucketing for scale."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("na")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iters: int = 20,
) -> DataFrame:
    """Within-cluster cosine near-dup pairs — the SemDeDup candidate
    rule (Abbas et al. 2023, public): k-means the embedding space,
    then compare pairs ONLY inside each cluster. The engine's third
    near-dup candidate generator beside SRP-LSH banding and IVF
    buckets: k-means buckets adapt to the corpus's density (LSH
    bands are data-oblivious), which is what semantic dedup of
    training corpora runs in practice.

    Approximation contract: a pair straddling a cluster boundary is
    never compared (identical vectors always share a cluster — the
    argmin is a pure function of the vector). ``n_clusters=1``
    degrades exactly to :func:`cosine_neardup_pairs`.

    Scale shape: clustering is the gate-proven distributed Lloyd
    (`kmeans_nd` — broadcast centroids, k·dims driver rows per
    iteration); pair generation is ONE shuffle on the cluster label
    with pair work Σ|cluster|² instead of n² — n_clusters is the
    knob that bounds the quadratic term."""
    from ffcl_spark.operators.kmeans import kmeans_nd

    pts = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("features")
    )
    _, _, labels = kmeans_nd(
        pts, n_clusters, seed=seed, max_iters=max_iters
    )
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nn"),
    ).join(labels, "id")
    a = side.select(
        "label",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nn").alias("na"),
    )
    b = side.select(
        "label",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nn").alias("nb"),
    )
    return (
        a.join(b, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """SemDeDup: (id, canonical_id, group_size) keep/drop decisions
    from embedding-space near-duplicates — :func:`semantic_neardup_pairs`
    candidates closed transitively by the shared min-label star
    contraction (``dedup.dedup_groups(pairs=...)``), so A~B, B~C
    collapse to one canonical keep even when the cluster pass never
    compared A to C. Same output contract as ``exact_dedup`` /
    ``dedup_groups`` — downstream keep/drop logic is identical across
    the exact, MinHash, SimHash, and semantic dedup families."""
    from ffcl_spark.operators.dedup import dedup_groups

    pairs = semantic_neardup_pairs(
        df, threshold, n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    return dedup_groups(df, threshold, id_col=id_col, pairs=pairs)


LSH_BANDS = 12
LSH_BAND_BITS = 8


def hyperplane_signatures(
    df: DataFrame,
    dims: int,
    n_bits: int = LSH_BANDS * LSH_BAND_BITS,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig array<long>): random-hyperplane (SRP) sign signatures.
    bit_i = 1 iff h_i · v > 0, h_i ~ seeded N(0,1) — P[bit match] =
    1 − θ/π [Charikar 2002]. Hyperplanes are a driver-seeded constant
    shipped in the task closure (n_bits × dims floats — metadata);
    signatures are computed as ONE Arrow-batched matmul per batch
    (mapInPandas), packed into ⌈n_bits/64⌉ int64 words."""
    import pandas as pd
    from pyspark.sql import types as T

    rng = np.random.default_rng(seed)
    H = rng.normal(size=(n_bits, dims))
    n_words = (n_bits + 63) // 64
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["v"].tolist(), dtype=np.float64)
            bits = (m @ H.T) > 0  # (rows, n_bits)
            words = np.zeros((len(pdf), n_words), dtype=np.uint64)
            for i in range(n_bits):
                words[:, i // 64] |= bits[:, i].astype(np.uint64) << np.uint64(i % 64)
            yield pd.DataFrame(
                {"id": pdf["id"], "sig": [w.astype(np.int64).tolist() for w in words]}
            )

    return sel.mapInPandas(kernel, out_schema)


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    dims: int,
    n_bands: int = LSH_BANDS,
    band_bits: int = LSH_BAND_BITS,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos): near-dup pairs via banded SRP-LSH candidate
    generation + EXACT cosine verification (JVM fold) — the scale path
    for the near-dup regime (cos ≳ 0.8, where banding prunes hard:
    candidate rate for orthogonal pairs is n_bands·2^−band_bits).

    Approximate by construction: recall = 1 − (1 − p^band_bits)^n_bands
    with p = 1 − θ/π; measured ≥ 0.95 against the brute oracle in
    pytest at the defaults. The brute ``cosine_neardup_pairs`` remains
    the exact oracle — at LOW thresholds (random-pair cosine near the
    threshold) no LSH family prunes, and exact all-pairs is inherently
    quadratic; the gate keeps the brute form there by design."""
    # persist the signatures: the band self-join below has the
    # signature pipeline (an Arrow matmul pass over every vector) in
    # BOTH branches — without the persist it runs twice (Spark does
    # not dedup common subtrees). Handle rides the result for
    # ``plans.cache.release``.
    sigs = hyperplane_signatures(
        df, dims, n_bands * band_bits, seed, id_col, vec_col
    ).persist()
    # band keys: band_bits-wide slices of the packed words (band_bits
    # divides 64 at the defaults, so a band never straddles words)
    band_exprs = []
    for bi in range(n_bands):
        start = bi * band_bits
        word = F.element_at(F.col("sig"), start // 64 + 1)
        key = F.shiftrightunsigned(word, start % 64).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )
        band_exprs.append(F.struct(F.lit(bi).alias("band"), key.alias("key")))
    bk = sigs.select("id", F.explode(F.array(*band_exprs)).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    a = bk.select(F.col("id").alias("id_a"), "band", "key")
    b = bk.select(F.col("id").alias("id_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    from ffcl_spark.plans.cache import carry

    return carry(
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos"),
        sigs,
    )


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
) -> np.ndarray:
    """k-means-lite (Lloyd, reference ``Lloyd.hpp:91-166`` semantics:
    assign → mean; empty cluster keeps its old centroid) on a bounded
    driver-side sample. The sample is a seeded hash filter on the id
    (pmod(xxhash64(id, seed), m) == 0), sorted by id locally — fully
    deterministic at any partitioning (an unordered ``limit`` is
    plan/partition-order dependent)."""
    import math

    n = df.count()
    m = max(1, math.ceil(n / sample_rows))
    basis = df
    if m > 1:
        basis = df.where(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m)) == 0
        )
    pdf = basis.select(id_col, vec_col).toPandas().sort_values(id_col)
    sample = np.array(pdf[vec_col].tolist()[:sample_rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = (
            np.sum(sample**2, axis=1)[:, None]
            + np.sum(cents**2, axis=1)[None, :]
            - 2.0 * sample @ cents.T
        )
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)  # empty keeps old (Lloyd.hpp:114-118)
    return cents


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks [Jégou et al. 2011]: split the
    d-dim space into ``m`` subspaces of d/m dims and run Lloyd
    (reference ``Lloyd.hpp:91-166`` semantics — assign → mean, empty
    cluster keeps its old centroid) independently per subspace on the
    same bounded seeded-hash driver sample as ``train_ivf_centroids``.
    Returns (m, k_codes, d/m) float64 — a few KiB of closure metadata."""
    import math

    n = df.count()
    mm = max(1, math.ceil(n / sample_rows))
    basis = df
    if mm > 1:
        basis = df.where(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(mm)) == 0
        )
    pdf = basis.select(id_col, vec_col).toPandas().sort_values(id_col)
    sample = np.array(pdf[vec_col].tolist()[:sample_rows], dtype=np.float64)
    d = sample.shape[1]
    if d % m != 0:
        raise ValueError(f"dims {d} not divisible by m={m} subspaces")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k_codes, dsub))
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=min(k_codes, len(sub)), replace=False)].copy()
        for _ in range(iters):
            dist = (
                np.sum(sub**2, axis=1)[:, None]
                + np.sum(cents**2, axis=1)[None, :]
                - 2.0 * sub @ cents.T
            )
            assign = dist.argmin(axis=1)
            for c in range(len(cents)):
                msk = assign == c
                if msk.any():
                    cents[c] = sub[msk].mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < k_codes:  # degenerate tiny sample: pad by repeat
            books[j, len(cents) :] = cents[0]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<int>): each vector compressed to m codeword ids
    (nearest codeword per subspace). One Arrow-batched matmul per
    subspace per batch (mapInPandas); no shuffle. At 64-d float32 →
    m=8 byte-ish codes this is ~32× storage compression — the form a
    100 TB embedding corpus is scanned in."""
    import pandas as pd
    from pyspark.sql import types as T

    m, k_codes, dsub = codebooks.shape
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("code", T.ArrayType(T.IntegerType())),
        ]
    )
    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cb = codebooks  # closure constant
    c_sq = np.sum(cb**2, axis=2)  # (m, k)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            codes = np.zeros((len(pdf), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                dist = c_sq[j][None, :] - 2.0 * sub @ cb[j].T  # +||x||² constant per row
                codes[:, j] = dist.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "code": list(codes)})

    return sel.mapInPandas(kernel, out_schema)


def pq_topk(
    refs: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: np.ndarray,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """(q_id, n_id, rank): approximate L2 top-k via asymmetric distance
    computation (ADC) over PQ codes + exact re-rank — the FAISS
    IndexPQ search shape. Per Arrow batch of codes, each query's
    distance to every ref is m table lookups + adds into a per-query
    (m × k_codes) LUT (no decompression); per-batch top-(k·refine)
    candidates cut the shuffle to O(n_batches · k · refine) rows, a
    global window keeps the ADC-best k·refine per query, and an exact
    JVM fold over the candidates' true vectors re-ranks to the final k
    (self excluded). Approximate by construction (recall vs the exact
    baseline pinned in pytest); queries are a bounded broadcast set —
    the same contract as ``cosine_topk``. Scale: the full-corpus scan
    touches only the code column (8 ints/row), the vector column is
    read for k·refine rows per query."""
    import pandas as pd
    from pyspark.sql import types as T

    m, k_codes, dsub = codebooks.shape
    if codes is None:
        codes = pq_encode(refs, codebooks, id_col, vec_col)
    qpdf = (
        queries.select(id_col, vec_col).toPandas().sort_values(id_col).reset_index(drop=True)
    )
    Q = np.array(qpdf[vec_col].tolist(), dtype=np.float64)
    q_ids = qpdf[id_col].to_numpy()
    nq = len(q_ids)
    # LUT[qi, j, c] = ||Q_sub − codeword||² (the constant ADC tables)
    lut = np.zeros((nq, m, k_codes))
    for j in range(m):
        qs = Q[:, j * dsub : (j + 1) * dsub]
        lut[:, j, :] = (
            np.sum(qs**2, axis=1)[:, None]
            + np.sum(codebooks[j] ** 2, axis=1)[None, :]
            - 2.0 * qs @ codebooks[j].T
        )
    cand_k = k * refine + 1  # +1 so a self-hit cannot evict a real candidate
    id_type = refs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("n_id", id_type),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def kernel(batches):
        from ffcl_spark.kernels.neighbors import topk_rows

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            C = np.array(pdf["code"].tolist(), dtype=np.int64)  # (n, m)
            rids = pdf["id"].to_numpy()
            order = np.argsort(rids, kind="stable")  # (adc, id) tie-break
            C, rids = C[order], rids[order]
            dist = np.zeros((nq, n))
            for j in range(m):
                dist += lut[:, j, C[:, j]]
            # self excluded BEFORE the local top — otherwise the self
            # row consumes a slot in whichever batch holds it and the
            # shortlist's boundary element becomes batching-dependent
            dist[q_ids[:, None] == rids[None, :]] = np.inf
            top = min(cand_k, n)
            # deterministic local top: with the (adc, id) order per
            # batch, the global windowed shortlist is invariant to how
            # rows are batched (each global top element is in its own
            # batch's non-self top under the same total order)
            idx, dd = topk_rows(dist, top)
            rows_q = np.repeat(q_ids, top)
            rows_n = rids[idx.ravel()]
            rows_d = dd.ravel()
            keep = np.isfinite(rows_d)
            yield pd.DataFrame(
                {"q_id": rows_q[keep], "n_id": rows_n[keep], "adc": rows_d[keep]}
            )

    cands = codes.mapInPandas(kernel, out_schema)
    w_adc = Window.partitionBy("q_id").orderBy("adc", "n_id")
    shortlist = (
        cands.where(F.col("q_id") != F.col("n_id"))
        .withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= cand_k)
        .select("q_id", "n_id")
    )
    # exact re-rank: true L2 over the shortlisted vectors only
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    rv = refs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("n_vec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("q_id").orderBy("l2", "n_id")
    return (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(rv, "n_id")
        .withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "l2")
    )


# peak dense-ADC slab per kernel invocation, in float64 cells (~64 MB):
# the distributed-query kernels chunk their query axis to this bound, so
# task memory stays flat no matter how many queries share one
# block/bucket (a hot IVF bucket receives ALL queries probing it)
_ADC_SLAB_CELLS = 8_000_000


def _adc_block_candidates(
    qpdf, rpdf, cand_k: int, cb: np.ndarray, c_sq: np.ndarray, slab_cells: int
):
    """Shared ADC scan for the distributed-query kNN-join kernels
    (``pq_join`` / ``ivf_pq_join``): per-query LUTs from the closure
    codebooks, self masked BEFORE the local top, (adc, n_id)-ordered
    top-``cand_k`` per query. The query axis is processed in chunks of
    ≤ ``_ADC_SLAB_CELLS / n_refs`` rows so the dense (queries × refs)
    distance slab stays bounded. Queries are processed in sorted-id
    order, so chunk composition (hence every BLAS call shape) is a pure
    function of the group's membership — results are deterministic at
    any arrival order / physical batching for a fixed slab size.
    Changing the slab size itself regroups the matmuls and may perturb
    adc values in the last ulp (BLAS is not shape-associative); the
    operator's final output is re-ranked by exact L2 over a
    refine-margin shortlist, so rank output is stable (pinned by the
    chunk-invariance test)."""
    import pandas as pd

    from ffcl_spark.kernels.neighbors import topk_rows

    m, _, dsub = cb.shape
    if len(qpdf) == 0 or len(rpdf) == 0:
        return pd.DataFrame({"q_id": [], "n_id": [], "adc": []})
    C = np.array(rpdf["code"].tolist(), dtype=np.int64)  # (n, m)
    rids = rpdf["n_id"].to_numpy()
    order = np.argsort(rids, kind="stable")  # (adc, n_id) tie-break
    C, rids = C[order], rids[order]
    Q_all = np.array(qpdf["v"].tolist(), dtype=np.float64)
    qids_all = qpdf["q_id"].to_numpy()
    qorder = np.argsort(qids_all, kind="stable")
    Q_all, qids_all = Q_all[qorder], qids_all[qorder]
    kk = min(cand_k, len(rids))
    chunk = max(1, slab_cells // max(1, len(rids)))
    outs = []
    for s in range(0, len(qids_all), chunk):
        Q = Q_all[s : s + chunk]
        qids = qids_all[s : s + chunk]
        dist = np.zeros((len(Q), len(rids)))
        for j in range(m):
            qs = Q[:, j * dsub : (j + 1) * dsub]
            lut = (
                np.sum(qs**2, axis=1)[:, None]
                + c_sq[j][None, :]
                - 2.0 * qs @ cb[j].T
            )
            dist += lut[:, C[:, j]]
        # self excluded BEFORE the local top (shortlist boundary must
        # not depend on which block/bucket task holds the self row)
        dist[qids[:, None] == rids[None, :]] = np.inf
        idx, dd = topk_rows(dist, kk)
        rows_q = np.repeat(qids, kk)
        rows_n = rids[idx.ravel()]
        rows_d = dd.ravel()
        keep = np.isfinite(rows_d)
        outs.append(
            pd.DataFrame(
                {"q_id": rows_q[keep], "n_id": rows_n[keep], "adc": rows_d[keep]}
            )
        )
    return outs[0] if len(outs) == 1 else pd.concat(outs, ignore_index=True)


def _bucket_assign_refs(
    refs: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id, bucket): nearest-IVF-centroid per ref — the shared
    (d2, bucket) tie order used by every IVF path.

    MAP-ONLY Arrow kernel (r6): the centroid matrix ships in the task
    closure; d2 accumulates as an explicit per-dimension left fold
    (acc = fl(acc + fl((x−y)²)) in ascending dimension order, float64)
    — bit-identical to the previous ``aggregate(zip_with(...))`` JVM
    fold — and np.argmin's first-minimum is exactly the old
    ``row_number over (orderBy d2, bucket) == 1``. The crossJoin ×
    |centroids| + window was a full shuffle+sort of n·|centroids|
    rows (guide §2.4)."""
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("id", refs.schema[id_col].dataType),
            T.StructField("bucket", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            acc = np.zeros((len(pdf), len(C)), dtype=np.float64)
            for i in range(C.shape[1]):
                diff = V[:, i, None] - C[None, :, i]
                acc = acc + diff * diff  # left fold, dim order
            yield pd.DataFrame(
                {"id": pdf["id"], "bucket": acc.argmin(axis=1).astype("int32")}
            )

    return refs.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(kernel, out_schema)


def write_ann_index(
    refs: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF×PQ index at rest: the (id, code, bucket) table
    written as parquet PARTITIONED BY bucket, plus a small JSON sidecar
    carrying centroids + codebooks. Train once, encode once, query many
    times — and because the code table is bucket-partitioned, the
    probed-bucket filter in ``ivf_pq_topk`` partition-prunes at the
    SCAN (only probed buckets' files are read at all). The sidecar is
    index metadata (a few KiB), not data — the codes ride Spark."""
    import json

    coded = pq_encode(refs, codebooks, id_col, vec_col).join(
        _bucket_assign_refs(refs, centroids, id_col, vec_col), "id"
    )
    # (bucket, epoch) layout so append_ann_index can add batches under
    # the same partition scheme; the initial build is epoch=0
    coded.withColumn("epoch", F.lit(0)).write.mode("overwrite").partitionBy(
        "bucket", "epoch"
    ).parquet(f"{path}/codes")
    meta = {
        "centroids": [[float(v) for v in c] for c in centroids],
        "codebooks": [[[float(v) for v in cw] for cw in sub] for sub in codebooks],
    }
    jvm_free_write = f"{path}/meta.json"
    with open(jvm_free_write.replace("file:", ""), "w") as f:
        json.dump(meta, f)


def read_ann_index(spark, path: str) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Load an index written by ``write_ann_index``: returns the
    bucket-partitioned (id, code, bucket) DataFrame (bucket filters
    partition-prune — verify PushedFilters/PartitionFilters in
    explain) plus centroids and codebooks."""
    import json

    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    coded = spark.read.parquet(f"{path}/codes").drop("epoch")
    return (
        coded,
        np.array(meta["centroids"], dtype=np.float64),
        np.array(meta["codebooks"], dtype=np.float64),
    )


def append_ann_index(
    refs: DataFrame,
    path: str,
    epoch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance of the ANN index at rest: encode a new
    ref batch with the STORED centroids/codebooks (the frozen-model
    contract of IVF/PQ maintenance — the quantizer is not retrained,
    so old and new codes stay comparable) and write it under
    ``(bucket, epoch)`` partitions with dynamic overwrite (idempotent
    epoch replay). Probes are unchanged: bucket partition filters
    prune across every epoch."""
    from ffcl_spark.plans.epoch_write import overwrite_epoch_partitions

    spark = refs.sparkSession
    _, centroids, codebooks = read_ann_index(spark, path)
    coded = pq_encode(refs, codebooks, id_col, vec_col).join(
        _bucket_assign_refs(refs, centroids, id_col, vec_col), "id"
    )
    overwrite_epoch_partitions(
        coded.withColumn("epoch", F.lit(int(epoch))),
        f"{path}/codes",
        "bucket",
        "epoch",
    )


def pq_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    codebooks: np.ndarray,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    ref_block_rows: int = 100_000,
    query_block_rows: int = 4_096,
) -> DataFrame:
    """Distributed-query ADC kNN join: ``pq_topk`` semantics with the
    QUERY SET as a DataFrame — the all-pairs-capable form (``pq_topk``
    holds its queries on the driver, the bounded-broadcast contract).

    Plan (the ``knn_join_nd_blocked`` blocking with the roles priced by
    what each side ships): queries hash into blocks carrying their
    vectors (needed to build ADC LUTs), refs ship only the m-int code
    column (~32× narrower than the vector column — so replicating refs
    across query blocks costs m ints/row, not the embedding). Each
    (query-block × ref-block) cogroup task builds the per-query
    (m × k_codes) LUTs from the closure codebooks and ADC-scans the
    code matrix; per task it emits the block-local ADC top-(k·refine+1)
    under the deterministic (adc, n_id) order, ONE global window merges
    the scalar candidates (exact w.r.t. the ADC order — every global
    shortlist member is in its block's top list under the same order),
    and the exact L2 re-rank reads true vectors for shortlist rows only
    via shuffled id joins (no driver materialization anywhere).

    Output (q_id, n_id, rank, l2): rank by TRUE L2 over the shortlist,
    self excluded, ties to the smaller n_id — deterministic at any
    partitioning. Approximate by construction (shortlist misses only);
    recall vs exact pinned in pytest."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    m, k_codes, dsub = codebooks.shape
    if codes is None:
        codes = pq_encode(refs, codebooks, id_col, vec_col)
    nq = queries.count()
    nr = refs.count()
    n_rb = max(1, math.ceil(nr / ref_block_rows))
    n_qb = max(1, math.ceil(nq / query_block_rows))
    cand_k = k * refine + 1  # +1 so a self-hit cannot evict a candidate

    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_qb)).alias("qb"),
        )
        .withColumn("rb", F.explode(F.sequence(F.lit(0), F.lit(n_rb - 1))))
        .select("q_id", "v", (F.col("qb") * n_rb + F.col("rb")).alias("blk"))
    )
    r = (
        codes.select(
            F.col("id").alias("n_id"),
            "code",
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_rb)).alias("rb"),
        )
        .withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(n_qb - 1))))
        .select("n_id", "code", (F.col("qb") * n_rb + F.col("rb")).alias("blk"))
    )

    id_type = queries.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("n_id", refs.schema[id_col].dataType),
            T.StructField("adc", T.DoubleType()),
        ]
    )
    cb = codebooks  # closure constant (a few KiB)
    c_sq = np.sum(cb**2, axis=2)  # (m, k_codes)

    slab = _ADC_SLAB_CELLS  # captured driver-side so overrides ship

    def kernel(qpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # query-chunked shared ADC scan — identical arithmetic to
        # pq_topk's driver LUT, task memory bounded by the slab cap
        return _adc_block_candidates(qpdf, rpdf, cand_k, cb, c_sq, slab)

    cands = q.groupBy("blk").cogroup(r.groupBy("blk")).applyInPandas(kernel, out_schema)
    w_adc = Window.partitionBy("q_id").orderBy("adc", "n_id")
    shortlist = (
        cands.where(F.col("q_id") != F.col("n_id"))
        .withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= cand_k)
        .select("q_id", "n_id")
    )
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    rv = refs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("n_vec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("q_id").orderBy("l2", "n_id")
    return (
        shortlist.join(qv, "q_id")
        .join(rv, "n_id")
        .withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "l2")
    )


def ivf_pq_topk(
    refs: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    n_probe: int = 3,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """IVF × PQ composition (the FAISS IndexIVFPQ search shape; the
    COVERAGE.md scale claim "assign codes within probed buckets"):
    refs live in their nearest-IVF-centroid bucket AND carry PQ codes;
    a query ADC-scans ONLY its ``n_probe`` nearest buckets' code rows,
    then exact-L2 re-ranks the per-query shortlist. Combines both
    prunes: the scan touches (probed fraction of the corpus) ×
    (8-int code column) — at 16 buckets / probe 4 / m=8 on 64-d
    float32 that is ~128× less data than a full vector scan.

    (q_id, n_id, rank, l2): rank by TRUE L2 over the shortlist (self
    excluded), ties to the smaller n_id. Approximate by construction —
    recall pinned in pytest and floored in the driver gate. Queries
    are a bounded broadcast set (same contract as ``pq_topk``);
    bucketing, codebooks and draws are seeded driver NumPy →
    deterministic end to end."""
    import pandas as pd
    from pyspark.sql import types as T

    m, k_codes, dsub = codebooks.shape
    # ref bucket = nearest centroid (JVM fold, same expression as
    # ivf_topk's assignment) riding next to the code column; a stored
    # index (``coded`` from read_ann_index — bucket-partitioned at
    # rest) skips both the encode and the assignment, and the probed-
    # bucket filter below partition-prunes its scan
    if coded is None:
        if codes is None:
            codes = pq_encode(refs, codebooks, id_col, vec_col)
        coded = codes.join(
            _bucket_assign_refs(refs, centroids, id_col, vec_col), "id"
        )

    # query-side: probe sets + ADC LUTs are driver NumPy (bounded
    # broadcast query contract)
    qpdf = (
        queries.select(id_col, vec_col).toPandas().sort_values(id_col).reset_index(drop=True)
    )
    Q = np.array(qpdf[vec_col].tolist(), dtype=np.float64)
    q_ids = qpdf[id_col].to_numpy()
    nq = len(q_ids)
    dq = (
        np.sum(Q**2, axis=1)[:, None]
        + np.sum(centroids**2, axis=1)[None, :]
        - 2.0 * Q @ centroids.T
    )
    # n_probe nearest buckets per query, ties to the smaller bucket id
    # (lexsort mirrors the JVM window's (d2, bucket) order)
    probe = np.lexsort(
        (np.broadcast_to(np.arange(len(centroids)), dq.shape), dq), axis=1
    )[:, :n_probe]
    probe_mask = np.zeros((nq, len(centroids)), dtype=bool)
    for qi in range(nq):
        probe_mask[qi, probe[qi]] = True
    lut = np.zeros((nq, m, k_codes))
    for j in range(m):
        qs_ = Q[:, j * dsub : (j + 1) * dsub]
        lut[:, j, :] = (
            np.sum(qs_**2, axis=1)[:, None]
            + np.sum(codebooks[j] ** 2, axis=1)[None, :]
            - 2.0 * qs_ @ codebooks[j].T
        )
    # scan prune: only the union of probed buckets is read at all
    probed_union = sorted({int(b) for b in probe.ravel()})
    coded = coded.where(F.col("bucket").isin(probed_union))

    cand_k = k * refine + 1
    id_type = refs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("n_id", id_type),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def kernel(batches):
        from ffcl_spark.kernels.neighbors import topk_rows

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            C = np.array(pdf["code"].tolist(), dtype=np.int64)  # (n, m)
            rids = pdf["id"].to_numpy()
            order = np.argsort(rids, kind="stable")  # (adc, id) tie-break
            C, rids = C[order], rids[order]
            buckets = pdf["bucket"].to_numpy()[order]
            dist = np.zeros((nq, n))
            for j in range(m):
                dist += lut[:, j, C[:, j]]
            # per-query bucket mask: a row outside the query's probe
            # set must not shortlist for it
            dist[~probe_mask[:, buckets]] = np.inf
            # self excluded BEFORE the local top (see pq_topk — keeps
            # the shortlist boundary batching-invariant)
            dist[q_ids[:, None] == rids[None, :]] = np.inf
            top = min(cand_k, n)
            # deterministic local top (see pq_topk) — masked rows sort
            # last (inf) and are dropped below
            idx, dd = topk_rows(dist, top)
            rows_q = np.repeat(q_ids, top)
            rows_n = rids[idx.ravel()]
            rows_d = dd.ravel()
            keep = np.isfinite(rows_d)
            yield pd.DataFrame(
                {"q_id": rows_q[keep], "n_id": rows_n[keep], "adc": rows_d[keep]}
            )

    cands = coded.mapInPandas(kernel, out_schema)
    w_adc = Window.partitionBy("q_id").orderBy("adc", "n_id")
    shortlist = (
        cands.where(F.col("q_id") != F.col("n_id"))
        .withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= cand_k)
        .select("q_id", "n_id")
    )
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    rv = refs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("n_vec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("q_id").orderBy("l2", "n_id")
    return (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(rv, "n_id")
        .withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "l2")
    )


def ivf_pq_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    n_probe: int = 3,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """Distributed-query IVF×PQ kNN join — ``ivf_pq_topk`` semantics
    with the query set as a DataFrame (completes the contract matrix:
    every ANN path now has a distributed-query form).

    Plan: queries explode to their ``n_probe`` nearest buckets (probe
    assignment is a per-batch NumPy argsort against the closure
    centroids — no driver materialization, no crossJoin); refs carry
    (bucket, code) — the PQ code column bucketed by nearest centroid.
    A cogroup on ``bucket`` runs the ADC scan per bucket (per-query
    LUTs built in-kernel from the closure codebooks), emitting the
    per-(query, bucket) top-(k·refine+1) under the deterministic
    (adc, n_id) order; one scalar window merges across a query's
    probed buckets, and the exact L2 re-rank reads true vectors for
    shortlist rows only. Scan volume = (probed corpus fraction) ×
    (m-int code column) — both prunes, at any query-set size.

    Parallelism is bucket-grained (one Arrow task per bucket holding
    all its probing queries) — size ``len(centroids)`` to the cluster
    (≫ cores) in production; skewed buckets split further by AQE only
    at the shuffle, so prefer more/finer centroids over fewer."""
    import pandas as pd
    from pyspark.sql import types as T

    m, _k_codes, dsub = codebooks.shape
    # ref side: (id, code, bucket) — from the stored index when given
    # (read_ann_index), else encode + nearest-centroid assignment here
    if coded is None:
        if codes is None:
            codes = pq_encode(refs, codebooks, id_col, vec_col)
        coded = codes.join(
            _bucket_assign_refs(refs, centroids, id_col, vec_col), "id"
        )
    r = coded.select(F.col("id").alias("n_id"), "code", "bucket")

    # query side: probe buckets via an Arrow kernel against the closure
    # centroids (ties to the smaller bucket id, mirroring the lexsort
    # in ivf_pq_topk) — each query fans out to n_probe rows
    C2 = np.sum(centroids**2, axis=1)
    id_type = queries.schema[id_col].dataType
    probe_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("bucket", T.IntegerType()),
        ]
    )
    q_sel = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("v")
    )

    def probe_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array(pdf["v"].tolist(), dtype=np.float64)
            dq = np.sum(Q**2, axis=1)[:, None] + C2[None, :] - 2.0 * Q @ centroids.T
            order = np.lexsort(
                (np.broadcast_to(np.arange(len(centroids)), dq.shape), dq), axis=1
            )[:, :n_probe]
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(pdf["q_id"].to_numpy(), n_probe),
                    "v": [v for v in pdf["v"] for _ in range(n_probe)],
                    "bucket": order.astype(np.int32).ravel(),
                }
            )

    q = q_sel.mapInPandas(probe_kernel, probe_schema)

    cand_k = k * refine + 1
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("n_id", refs.schema[id_col].dataType),
            T.StructField("adc", T.DoubleType()),
        ]
    )
    cb = codebooks
    c_sq = np.sum(cb**2, axis=2)

    slab = _ADC_SLAB_CELLS  # captured driver-side so overrides ship

    def adc_kernel(qpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # query-chunked shared ADC scan (see pq_join): a hot bucket
        # receives ALL queries probing it, so the chunk bound is what
        # keeps task memory flat under query-side skew
        return _adc_block_candidates(qpdf, rpdf, cand_k, cb, c_sq, slab)

    cands = (
        q.groupBy("bucket").cogroup(r.groupBy("bucket")).applyInPandas(adc_kernel, out_schema)
    )
    w_adc = Window.partitionBy("q_id").orderBy("adc", "n_id")
    shortlist = (
        cands.where(F.col("q_id") != F.col("n_id"))
        .withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= cand_k)
        .select("q_id", "n_id")
    )
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    rv = refs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("n_vec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("q_id").orderBy("l2", "n_id")
    return (
        shortlist.join(qv, "q_id")
        .join(rv, "n_id")
        .withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "l2")
    )


def ivf_topk(
    refs: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: refs live in their nearest-centroid bucket; a query
    scans only its ``n_probe`` nearest buckets. Approximate — recall
    measured vs ``cosine_topk`` in tests.

    Bucket assignment is MAP-ONLY (r6): the centroid matrix is driver
    metadata and ships in the task closure of one Arrow kernel pass
    per side, instead of crossJoin × |centroids| + a row_number
    window — that window was a full shuffle+sort of n·|centroids| rows
    on both sides (guide §2.4: remove shuffles outright; §4.2: batch
    NumPy in the kernel). The kernel accumulates d2 as an explicit
    per-dimension left fold — acc = fl(acc + fl((x−y)²)) in ascending
    dimension order, float64 — which is bit-identical to the old
    ``aggregate(zip_with(...))`` SQL fold, and argmin/stable argsort
    break ties by ascending bucket exactly like the old
    ``row_number over (orderBy d2, bucket)`` — identical bucket sets,
    identical results (pinned in tests)."""
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)

    def assign(df: DataFrame, top_n: int) -> DataFrame:
        cols = df.columns
        out_schema = T.StructType(
            [df.schema[c] for c in cols] + [T.StructField("bucket", T.IntegerType())]
        )

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf.iloc[:, 1].tolist(), dtype=np.float64)
                acc = np.zeros((len(pdf), len(C)), dtype=np.float64)
                for i in range(C.shape[1]):
                    diff = V[:, i, None] - C[None, :, i]
                    acc = acc + diff * diff  # left fold, dim order
                if top_n == 1:
                    # argmin = first minimum = smallest bucket on ties
                    yield pdf.assign(bucket=acc.argmin(axis=1).astype("int32"))
                else:
                    order = np.argsort(acc, axis=1, kind="stable")[:, :top_n]
                    idx = np.repeat(np.arange(len(pdf)), order.shape[1])
                    out = pdf.iloc[idx].reset_index(drop=True)
                    out["bucket"] = order.ravel().astype("int32")
                    yield out

        return df.mapInPandas(kernel, out_schema)

    r = refs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), _norm(F.col(vec_col)).alias("n_norm"))
    r_b = assign(r, 1)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), _norm(F.col(vec_col)).alias("q_norm"))
    q_b = assign(q, n_probe)
    sim = (
        q_b.join(r_b, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("n_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


# ----------------------------------------------- exact moments + PCA

def embedding_moments_exact(
    df: DataFrame,
    dims: int,
    vec_col: str = "embedding",
    scale: int = 10**4,
) -> DataFrame:
    """Partitioning-invariant mean vector + covariance matrix of an
    embedding column via FIXED-POINT integer sums — the d-dimensional
    generalization of ``stats.feature_stats_exact``.

    ``q_i = round(v_i · scale)`` is an exact int64; every Σq_i and
    Σq_i·q_j is an exact integer (order-free), accumulated in
    decimal(38,0) so the covariance numerator n·Σq_iq_j − Σq_i·Σq_j
    never rounds (DuckDB's HUGEINT lands on the same integer). Each
    output value is then ONE float division chain — identical bits at
    any parallelism and in any engine.

    Output: one row per upper-triangle pair (i ≤ j) with
    ``(i, j, n, mean_i, mean_j, cov)`` where cov is the sample
    covariance. Diagonal rows carry the per-dimension variance.

    Plan shape: one corpus scan → Arrow-batched integer-matmul
    partial sums (QᵀQ per batch, exact int64) → (i, j) agg of the
    partials. The shuffle is O(batches · d²) rows of three integers —
    never O(n) — and the output is d(d+1)/2 rows regardless of corpus
    size. This is the covariance input of a PCA/whitening stage
    (OPQ-style ANN preprocessing) computed distributedly but exactly.
    """
    import pandas as pd

    dec = "decimal(38,0)"
    iu, ju = np.triu_indices(dims)
    n_tri = len(iu)

    # Arrow-batched partial-sum kernel: per batch, one int64 matmul
    # QᵀQ (BLAS-fast, EXACT — |entry| ≤ batch_rows·q_max², safe to
    # ~10⁹ rows/batch at q_max = 10⁵; Arrow batches are ~10⁴ rows) +
    # column sums. Emits d(d+1)/2 + d partial rows per batch; marker
    # j = −1 rows carry the plain sums Σq_i. A d²-term column
    # expression would blow whole-stage codegen (interpreted-eval
    # hazard, the round-4 MinHash lesson) — the kernel keeps the hot
    # loop in vectorized integer NumPy with zero per-row Python.
    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64) * scale
            # Spark/DuckDB round() is HALF_UP (away from zero)
            q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
                np.int64
            )
            c = q.T @ q
            s = q.sum(axis=0)
            n = len(q)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([np.arange(dims), iu]).astype(np.int32),
                    "j": np.concatenate([np.full(dims, -1), ju]).astype(np.int32),
                    "s": np.concatenate([s, c[iu, ju]]),
                    "cnt": np.full(dims + n_tri, n, dtype=np.int64),
                }
            )

    part = df.select(vec_col).mapInPandas(partials, schema="i int, j int, s long, cnt long")
    agg = part.groupBy("i", "j").agg(
        F.sum(F.col("s").cast(dec)).alias("s"), F.sum("cnt").alias("n")
    )
    sums = agg.where(F.col("j") == -1).select(
        F.col("i").alias("k"), F.col("s").alias("sk")
    )
    prods = agg.where(F.col("j") >= 0)

    n = F.col("n")
    num = n.cast(dec) * F.col("s") - F.col("si") * F.col("sj")
    s2 = float(scale * scale)
    return (
        prods.join(sums.select(F.col("k").alias("i"), F.col("sk").alias("si")), "i")
        .join(sums.select(F.col("k").alias("j"), F.col("sk").alias("sj")), "j")
        .select(
            "i",
            "j",
            n.cast("int").alias("n"),
            (F.col("si").cast("double") / n / scale).alias("mean_i"),
            (F.col("sj").cast("double") / n / scale).alias("mean_j"),
            F.when(
                n > 1,
                num.cast("double") / (n * (n - 1)).cast("double") / F.lit(s2),
            ).alias("cov"),
        )
    )


def pca_components(
    df: DataFrame,
    dims: int,
    k: int,
    vec_col: str = "embedding",
    scale: int = 10**4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-``k`` principal components from the EXACT distributed
    covariance (``embedding_moments_exact`` — the only corpus pass;
    the eigensolve is a driver-side d×d NumPy ``eigh``, d² floats).
    Deterministic sign: each eigenvector's largest-|component| entry is
    made positive (first index wins ties). Returns
    ``(mean[d], components[k, d], explained_variance[k])``."""
    rows = embedding_moments_exact(df, dims, vec_col, scale).collect()
    mean = np.zeros(dims)
    cov = np.zeros((dims, dims))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
        mean[r["i"]] = r["mean_i"]
        mean[r["j"]] = r["mean_j"]
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    for c in comps:
        m = np.argmax(np.abs(c))
        if c[m] < 0:
            c *= -1.0
    return mean, comps, w[order]


def pca_project(
    df: DataFrame,
    dims: int,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
    scale: int = 10**4,
    components: tuple[np.ndarray, np.ndarray] | None = None,
    whiten: bool = False,
) -> DataFrame:
    """Append a ``k``-dim PCA projection column: centered dot products
    against the (broadcast-literal) component matrix, all JVM-side
    (zip_with + aggregate — no Python rows). Pass ``components=
    (mean, comps)`` from :func:`pca_components` to reuse a fit; else
    one is computed. ``whiten=True`` scales each axis to unit variance
    (component rows divided by √eigenvalue — the OPQ-style
    preprocessing that balances subspace energy before PQ; requires
    the fit to be computed here, since the scaling needs the
    eigenvalues). At 100 TB the fit is one exact-covariance pass and
    the transform is a map-only scan — nothing shuffles."""
    if components is None:
        mean, comps, ev = pca_components(df, dims, k, vec_col, scale)
        if whiten:
            comps = comps / np.sqrt(np.maximum(ev, 1e-300))[:, None]
    else:
        if whiten:
            raise ValueError(
                "whiten=True needs the eigenvalues — pass components=None "
                "or pre-scale the component rows yourself"
            )
        mean, comps = components
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col), mean_lit, lambda x, m: x.cast("double") - m
    )
    proj_cols = []
    for j in range(comps.shape[0]):
        w = F.array(*[F.lit(float(c)) for c in comps[j]])
        proj_cols.append(
            F.aggregate(
                F.zip_with(centered, w, lambda x, c: x * c),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    return df.withColumn(out_col, F.array(*proj_cols))


def compact_ann_index(spark, path: str) -> None:
    """Collapse all code-table epochs into one (small-files
    maintenance after many appends). The frozen centroids/codebooks
    sidecar is untouched; query results are unchanged."""
    from ffcl_spark.plans.epoch_write import compact_epochs

    compact_epochs(spark, f"{path}/codes", "bucket")
