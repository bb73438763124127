"""Spatial cell indexing (H3/S2-style) over a grid bbox.

No h3/s2sphere in this environment, so the engine ships its own
deterministic quadtree cell scheme (public Morton/Z-order technique):
resolution ``r`` divides the grid bbox into ``2^r x 2^r`` cells;
``cell_id = (r << 58) | morton(cx, cy)`` with x counted from the left
and y from the *top* (same orientation as tile rows).  ``grid_disk``
(ring neighborhoods) supports the kNN candidate generation (SURVEY.md
J4).

Everything is vectorized uint64 bit arithmetic — zero-copy friendly for
``map_batches(batch_format="pyarrow")`` stages.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # 58 morton bits


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton_encode(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return _part1by1(cx) | (_part1by1(cy) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _compact1by1(code), _compact1by1(code >> np.uint64(1))


def cell_id(cx: np.ndarray, cy: np.ndarray, res: int) -> np.ndarray:
    """(cx, cy) integer cell coords at ``res`` -> packed cell id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    return (np.uint64(res) << np.uint64(58)) | morton_encode(cx, cy)


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, cx, cy)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    cx, cy = morton_decode(cell & ((np.uint64(1) << np.uint64(58)) - np.uint64(1)))
    return res, cx.astype(np.int64), cy.astype(np.int64)


def cell_for_micro(ux: np.ndarray, uy: np.ndarray, res: int) -> np.ndarray:
    """Micro-coordinates (uint32 fixed-point over the bbox) -> cell id.

    ``cx = ux >> (32 - res)`` — exact integer arithmetic, reproducible
    in the DuckDB oracle as ``ux // 2^(32-res)``.
    """
    shift = np.uint64(32 - res)
    cx = ux.astype(np.uint64) >> shift
    cy = uy.astype(np.uint64) >> shift
    return cell_id(cx, cy, res)


def cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    res, cx, cy = cell_decode(cell)
    if (res < parent_res).any():
        raise ValueError("parent_res must be <= cell res")
    shift = (res - parent_res).astype(np.uint64)
    return cell_id(
        cx.astype(np.uint64) >> shift, cy.astype(np.uint64) >> shift, parent_res
    )


def grid_disk(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 block),
    clamped to the matrix — h3.grid_disk analog for kNN candidate rings."""
    res, cx, cy = cell_decode(np.array([cell], dtype=np.uint64))
    res, cx, cy = int(res[0]), int(cx[0]), int(cy[0])
    size = 1 << res
    xs = np.arange(max(0, cx - k), min(size, cx + k + 1), dtype=np.uint64)
    ys = np.arange(max(0, cy - k), min(size, cy + k + 1), dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return cell_id(gx.ravel(), gy.ravel(), res)
