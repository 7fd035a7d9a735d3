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
