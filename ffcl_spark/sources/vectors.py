"""Deterministic n-D feature synthesis for the n-dimensional operator
gates (reference n-features contract: ``KDTree.hpp:137``, MNIST 784-d
``KMeansTest.cpp`` — the engine must consume arbitrary-dimension
feature vectors, not just (x, y)).

Every component is a DYADIC RATIONAL — an integer in [-2048, 2047]
divided by 256 — produced by pure int64 arithmetic:

    h_j = ((d·2654435761 + (j+1)·40503 + 1013904223) mod 2^32) mod 4096
    v_j = (h_j − 2048) / 256           ∈ [−8, 8), granularity 2^−8

Why dyadic: squared differences are multiples of 2^−16 bounded by 2^8,
and a sum of any reasonable number of them needs < 52 mantissa bits —
so EVERY summation order produces the exact same float64, and sqrt is
correctly rounded on top. Distances computed by the Spark fold, the
NumPy kernels, and any DuckDB SQL expression are therefore bit-equal
BY CONSTRUCTION, which is what lets the n-D operators have exact
value-hash oracles despite engines disagreeing on float summation
order in general.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIX_A = 2654435761  # Knuth multiplicative constants (public domain)
MIX_B = 40503
MIX_C = 1013904223
MOD32 = 4294967296
LEVELS = 4096
HALF = 2048
SCALE = 256.0


def _mult(j: int) -> int:
    # per-dimension ODD multiplier — a shared multiplier would make the
    # per-dim differences of any key pair identical mod 4096 (tightly
    # clustered, degenerate fixture)
    return MIX_A + 2 * j * MIX_B


def _component(d: Column, j: int) -> Column:
    h = (d * F.lit(_mult(j)) + F.lit((j + 1) * MIX_C)) % F.lit(MOD32)
    return ((h % F.lit(LEVELS)) - F.lit(HALF)).cast("double") / F.lit(SCALE)


def synth_features(
    df: DataFrame, key_col: str, dims: int, id_col: str = "id", vec_col: str = "features"
) -> DataFrame:
    """(id, features array<double>): deterministic n-D points keyed by
    a non-negative integer column. Pure column expressions."""
    d = F.col(key_col).cast("long")
    return df.select(
        d.alias(id_col), F.array(*[_component(d, j) for j in range(dims)]).alias(vec_col)
    )


def synth_features_np(keys: np.ndarray, dims: int) -> np.ndarray:
    """NumPy twin of :func:`synth_features` — test oracle."""
    d = np.asarray(keys, dtype=np.int64)
    out = np.empty((len(d), dims), dtype=np.float64)
    for j in range(dims):
        h = (d * _mult(j) + (j + 1) * MIX_C) % MOD32
        out[:, j] = ((h % LEVELS) - HALF).astype(np.float64) / SCALE
    return out


def oracle_cte(dims: int, src: str = "documents", key: str = "doc_id") -> str:
    """DuckDB CTE producing the identical fixture as (id, f0..f{dims-1})
    scalar columns — shared by every n-D oracle query."""
    cols = ",\n    ".join(
        f"CAST((((d*{_mult(j)} + {(j + 1) * MIX_C}) % {MOD32}) % {LEVELS}) - {HALF} AS DOUBLE) / {SCALE} AS f{j}"
        for j in range(dims)
    )
    return f"""
keys AS (SELECT CAST({key} AS BIGINT) AS d FROM {src}),
vecs AS (SELECT d AS id,
    {cols}
  FROM keys)
"""


def to_pandas_matrix(df: DataFrame, vec_col: str = "features") -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) — local materialization helper for test oracles."""
    pdf: pd.DataFrame = df.toPandas().sort_values("id").reset_index(drop=True)
    return pdf["id"].to_numpy(), np.array(pdf[vec_col].tolist(), dtype=np.float64)
