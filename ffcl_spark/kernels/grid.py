"""NumPy twin of ``functions.cells`` — same encoding, used inside
pandas kernels and test oracles. Must stay bit-in-sync with the SQL
expressions (identical floor/clamp arithmetic in float64)."""

from __future__ import annotations

import numpy as np

from ffcl_spark.config import EngineConfig
from ffcl_spark.functions.cells import AXIS_MOD, RES_SHIFT


def axis_index(coord: np.ndarray, origin: float, cell_size: float, grid_n: int) -> np.ndarray:
    ix = np.floor((np.asarray(coord, dtype=np.float64) - origin) / cell_size)
    return np.clip(ix, 0, grid_n - 1).astype(np.int64)


def cell_id(x: np.ndarray, y: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    ix = axis_index(x, cfg.x0, cfg.cell_size, cfg.grid_n)
    iy = axis_index(y, cfg.y0, cfg.cell_size, cfg.grid_n)
    return (np.int64(cfg.resolution) << RES_SHIFT) + ix * AXIS_MOD + iy


def cell_ixy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ix = (np.asarray(cell, dtype=np.int64) >> 0) // AXIS_MOD % AXIS_MOD
    iy = np.asarray(cell, dtype=np.int64) % AXIS_MOD
    return ix, iy
