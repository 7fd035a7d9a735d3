"""Generate pinned k-means oracles for the driver correctness gates.

`kmeans_labels` was the last deterministic rows-only gate (with
`silhouette`, fixed separately via a real SQL oracle): Lloyd's
iterative float-mean centroids are not reasonably expressible as
DuckDB SQL. Same pattern as scripts/make_hdbscan_oracle.py /
make_kmedoids_oracle.py: recompute the expected labels OUTSIDE Spark —
a pure-NumPy Lloyd twin over the deterministic fixtures, seeded by the
package's pytest-trusted ``kmeanspp_init`` (the exact parity of the
NumPy twin against the distributed pipeline is already pinned in
tests/test_clustering.py / test_nd.py) — and store them in
``oracles/kmeans_pinned_sf001.json``. ``__spark_entry__.oracle_sql``
embeds them as VALUES relations, turning the gate from rows-only into
an exact-match driver check of the distributed pipeline (synthesis →
seeded-hash sample → kmeans++ → Spark groupBy-avg Lloyd rounds →
assignment expression) for all three variants (`lloyd`, `hamerly` —
identical labels by construction, Hamerly's bounds only skip work —
and `lloyd_nd`).

Float caveat, stated honestly: Spark's per-cluster `avg` and NumPy's
`mean` can differ in the last ulp (summation order), so a pinned label
would flip only if a point were equidistant to two centroids at that
precision — geometrically a measure-zero boundary the 1/1000-grid
fixture sits nowhere near. The pin is verified against the live Spark
pipeline before being committed (scripts/check_entry.py runs the gate
vs this oracle at sf0.01).

Pins are valid for the sf0.01 fixture only; at any other sf the
row-count comparison fails loudly. Rerun after changing gate params:

    python scripts/make_kmeans_oracle.py

Reference: Lloyd.hpp:91-166 (assign → sum/divide; empty cluster keeps
its previous centroid, Lloyd.hpp:114-118), KMeansPlusPlus.hpp:40-65,
Hamerly.hpp (drop-in engine, identical results), KMeans.hpp:153-230.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_kmedoids_oracle import doc_points  # noqa: E402

from ffcl_spark.operators.kmeans import kmeanspp_init  # noqa: E402
from ffcl_spark.sources.vectors import synth_features_np  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "oracles", "kmeans_pinned_sf001.json",
)
K = 4
ITERS_2D = 10   # q_kmeans_labels lloyd/hamerly
ITERS_ND = 8    # q_kmeans_labels lloyd_nd
DIMS_ND = 8
TOL = 1e-6
SEED = 7


def lloyd_labels(pts: np.ndarray, init: np.ndarray, max_iters: int) -> np.ndarray:
    """NumPy twin of operators/kmeans.lloyd_once: assign → per-cluster
    mean (empty keeps previous centroid) → move-tol early stop; final
    labels under the FINAL centroids, distance ties to the smaller
    centroid id (argmin keeps the first)."""
    cents = init.copy()
    for _ in range(max_iters):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(axis=1)
        new_c = cents.copy()
        for j in range(len(cents)):
            m = lab == j
            if m.any():
                new_c[j] = pts[m].mean(axis=0)
        move = float(np.max(np.sqrt(((new_c - cents) ** 2).sum(axis=1))))
        cents = new_c
        if move < TOL:
            break
    d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    return d2.argmin(axis=1)


def pin_2d() -> list[list]:
    """q_kmeans_labels `lloyd` (and `hamerly`, identical by the
    bounds-only-skip-work contract pinned in tests): the init sample is
    the (x, y)-sorted full fixture (n ≤ sample_rows → no hash filter)."""
    pdf = doc_points()
    sample = (
        pdf.sort_values(["x", "y"]).reset_index(drop=True)[["x", "y"]].to_numpy()
    )
    init = kmeanspp_init(sample, K, SEED)
    pts = pdf[["x", "y"]].to_numpy(dtype=np.float64)
    labels = lloyd_labels(pts, init, ITERS_2D)
    return [[i, int(l)] for i, l in zip(pdf["id"], labels)]


def pin_nd() -> list[list]:
    """q_kmeans_labels `lloyd_nd`: synth_features over documents
    doc_ids; init sample id-sorted (kmeans_nd sorts by id)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = np.array(sorted(int(v) for v in t.column("doc_id").to_pylist()), dtype=np.int64)
    vecs = synth_features_np(ids, DIMS_ND)
    init = kmeanspp_init(vecs, K, SEED)  # id-sorted == kmeans_nd's sample order
    labels = lloyd_labels(vecs, init, ITERS_ND)
    return [[str(i), int(l)] for i, l in zip(ids, labels)]


def main() -> None:
    pins = {"sf_dir": SF_DIR, "kmeans_lloyd": pin_2d(), "kmeans_nd": pin_nd()}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(pins, f)
    for name in ("kmeans_lloyd", "kmeans_nd"):
        labs = {r[1] for r in pins[name]}
        print(f"{name}: {len(pins[name])} rows, labels used: {sorted(labs)}")


if __name__ == "__main__":
    main()
