"""Generate the pinned HDBSCAN oracle for the driver correctness gates.

HDBSCAN labels are deterministic integer logic over exact distances,
but the condensed-tree selection is not expressible as reasonable
DuckDB SQL — so the gates pin the expected labels instead (round-3
VERDICT task #4): this script recomputes, OUTSIDE Spark, the exact
(id, label, is_noise) sets for the two gate subsets at sf0.01 using
the pytest-trusted local pipeline (NumPy Prim MST + the driver
hierarchy kernels), and stores them in
``oracles/hdbscan_pinned_sf001.json``. ``__spark_entry__.oracle_sql``
embeds them as a VALUES relation, turning the gates from rows-only
into exact-match driver checks of the whole distributed pipeline
(synthesis → subset → MST → selection → distributed label emission).

The pin is valid for the sf0.01 fixture only (the driver's correctness
scale); at any other sf the row-count comparison fails loudly rather
than silently passing. Rerun after changing gate parameters:

    python scripts/make_hdbscan_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import zlib

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffcl_spark.kernels.hierarchy import hdbscan_labels  # noqa: E402
from ffcl_spark.kernels.mst_local import prim_mst  # noqa: E402
from ffcl_spark.sources.docs import AX_ADD, AX_MUL, AY_ADD, AY_MUL  # noqa: E402
from ffcl_spark.sources.vectors import synth_features_np  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "oracles", "hdbscan_pinned_sf001.json")
MIN_CLUSTER_SIZE = 8  # matches q_hdbscan / q_hdbscan_nd
DIMS_ND = 8


def doc_ids() -> list[int]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    return sorted(int(v) for v in t.column("doc_id").to_pylist())


def doc_points(ids: list[int]) -> tuple[list[str], np.ndarray]:
    """The media_points fixture in pure Python ints (sources/docs.py
    AX/AY mixing): 2 spans per doc at offsets 0 and 2."""
    pids, xy = [], []
    for d in ids:
        for m, off in ((0, 0), (1, 2)):
            pid = 2 * d + m
            ax = (pid * AX_MUL + AX_ADD) % 4294967296
            ay = (pid * AY_MUL + AY_ADD) % 4294967296
            pids.append(f"doc-{d}#{off}")
            xy.append(((ax % 60000 - 30000) / 1000.0, (ay % 60000 - 30000) / 1000.0))
    return pids, np.array(xy, dtype=np.float64)


def md5_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


EARTH_RADIUS_M = 6_371_008.8


def haversine_mat(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    p, l = np.radians(lat), np.radians(lon)
    sp = np.sin((p[None, :] - p[:, None]) / 2)
    sl = np.sin((l[None, :] - l[:, None]) / 2)
    h = sp * sp + np.cos(p)[:, None] * np.cos(p)[None, :] * sl * sl
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(1.0, h)))


def prim_matrix(ids: list, d: np.ndarray) -> list[tuple]:
    """Prim over a precomputed distance matrix — the metre-space twin
    of the engine's chord-space Borůvka (geo gate)."""
    n = len(ids)
    order = sorted(range(n), key=lambda i: ids[i])
    start = order[0]
    in_tree = np.zeros(n, bool)
    in_tree[start] = True
    best = d[start].copy()
    src = np.full(n, start)
    edges = []
    for _ in range(n - 1):
        j = int(np.where(in_tree, np.inf, best).argmin())
        edges.append((ids[src[j]], ids[j], float(best[j])))
        in_tree[j] = True
        upd = d[j] < best
        best[upd] = d[j][upd]
        src[upd] = j
    return edges


def main() -> None:
    ids = doc_ids()

    # ---- 2-D gate: md5(id) % 3 == 0 subset of the doc points
    pids, xy = doc_points(ids)
    keep = [i for i, p in enumerate(pids) if md5_mod(p, 3) == 0]
    sub_ids = [pids[i] for i in keep]
    sub_xy = xy[keep]
    edges = prim_mst(sub_xy, np.array(sub_ids, dtype=object))
    labels = hdbscan_labels(sub_ids, edges, MIN_CLUSTER_SIZE, allow_single_cluster=False)
    pinned_2d = [
        [p, labels[p] if labels[p] is not None else "0", labels[p] is None]
        for p in sub_ids
    ]

    # ---- geo gate: the SAME md5 %3 doc subset mapped onto the sphere
    # (lat = x*3, lon = y*6 — one multiply each, bit-identical to the
    # Spark mapping); MST recomputed by an independent haversine-matrix
    # Prim in METRES (the engine runs chord-space Borůvka over the 3-D
    # embedding and converts edge weights — a different metric
    # computation path), then the same condense/select kernels
    geo_edges = prim_matrix(sub_ids, haversine_mat(sub_xy[:, 0] * 3, sub_xy[:, 1] * 6))
    geo_labels = hdbscan_labels(
        sub_ids, geo_edges, MIN_CLUSTER_SIZE, allow_single_cluster=False
    )
    pinned_geo = [
        [p, geo_labels[p] if geo_labels[p] is not None else "0", geo_labels[p] is None]
        for p in sub_ids
    ]

    # ---- n-D gate: crc32(str(id)) % 3 == 0 subset of the 8-D dyadic fixture
    nd_keys = [d for d in ids if zlib.crc32(str(d).encode()) % 3 == 0]
    feats = synth_features_np(np.array(nd_keys, dtype=np.int64), DIMS_ND)
    nd_edges = prim_mst(feats, np.array(nd_keys, dtype=np.int64))
    nd_labels = hdbscan_labels(nd_keys, nd_edges, MIN_CLUSTER_SIZE, allow_single_cluster=False)
    pinned_nd = [
        [k, nd_labels[k] if nd_labels[k] is not None else 0, nd_labels[k] is None]
        for k in nd_keys
    ]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "min_cluster_size": MIN_CLUSTER_SIZE,
                "hdbscan": pinned_2d,
                "hdbscan_nd": pinned_nd,
                "hdbscan_geo": pinned_geo,
            },
            f,
        )
    n_cl = len({r[1] for r in pinned_2d if not r[2]})
    n_cl_nd = len({r[1] for r in pinned_nd if not r[2]})
    n_cl_geo = len({r[1] for r in pinned_geo if not r[2]})
    print(
        f"wrote {OUT}: hdbscan {len(pinned_2d)} rows / {n_cl} clusters, "
        f"hdbscan_nd {len(pinned_nd)} rows / {n_cl_nd} clusters, "
        f"hdbscan_geo {len(pinned_geo)} rows / {n_cl_geo} clusters"
    )


if __name__ == "__main__":
    main()
