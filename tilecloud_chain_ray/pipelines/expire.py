"""Expire-tiles geometry union (G4).

The reference unions tile-extent polygons into a (Multi)Polygon for
cache invalidation (``/root/reference/tilecloud_chain/expiretiles.py:
118-147``, ``unary_union``).  Without shapely the engine provides the
two operations its pipelines actually consume:

* ``union_area_of_boxes`` — exact area of a union of axis-aligned
  boxes (coordinate-compression sweep; handles overlap, so it is a
  true union, not a sum).
* ``merge_tile_runs`` — tile set -> per-row merged x-interval boxes
  (the compact expire-geometry representation; row-merged rectangles).

Distributed shape: partial unions per block, then a final merge of the
(tiny) rectangle lists — a tree reduce like the reference's union.
"""

from __future__ import annotations

import numpy as np


def union_area_of_boxes(boxes: np.ndarray) -> float:
    """Exact union area of (n, 4) [minx, miny, maxx, maxy] boxes."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    if len(boxes) == 0:
        return 0.0
    xs = np.unique(np.concatenate([boxes[:, 0], boxes[:, 2]]))
    ys = np.unique(np.concatenate([boxes[:, 1], boxes[:, 3]]))
    if len(xs) < 2 or len(ys) < 2:
        return 0.0
    # coverage grid over compressed coordinates
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    x0 = np.searchsorted(xs, boxes[:, 0])
    x1 = np.searchsorted(xs, boxes[:, 2])
    y0 = np.searchsorted(ys, boxes[:, 1])
    y1 = np.searchsorted(ys, boxes[:, 3])
    for i in range(len(boxes)):
        covered[x0[i] : x1[i], y0[i] : y1[i]] = True
    wx = np.diff(xs)
    wy = np.diff(ys)
    return float((covered * np.outer(wx, wy)).sum())


def merge_tile_runs(tiles_xy: np.ndarray) -> list[tuple[int, int, int]]:
    """(n, 2) integer (x, y) tiles -> [(y, x_start, x_end)] merged runs
    per row — the compact union geometry for grid-aligned tiles."""
    tiles_xy = np.asarray(tiles_xy, dtype=np.int64).reshape(-1, 2)
    if len(tiles_xy) == 0:
        return []
    order = np.lexsort((tiles_xy[:, 0], tiles_xy[:, 1]))
    t = tiles_xy[order]
    runs: list[tuple[int, int, int]] = []
    cur_y, cur_start, cur_end = int(t[0, 1]), int(t[0, 0]), int(t[0, 0])
    for x, y in t[1:]:
        if y == cur_y and x == cur_end:
            continue  # duplicate
        if y == cur_y and x == cur_end + 1:
            cur_end = int(x)
        else:
            runs.append((cur_y, cur_start, cur_end))
            cur_y, cur_start, cur_end = int(y), int(x), int(x)
    runs.append((cur_y, cur_start, cur_end))
    return runs
