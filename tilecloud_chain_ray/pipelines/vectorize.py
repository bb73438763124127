"""Raster -> vector: decode stored raster tiles back into cells and
polygons — the inverse direction of the density/geometry renderers, so
the engine covers raster<->vector round-trips, not just vector->raster.

The reference ecosystem does this step with GDAL (``gdal_polygonize``)
outside tilecloud-chain proper; here it is a Ray Data stage chain over
the engine's own PNG codec:

* ``vectorize_tiles`` — tile rows (z, x, y, data=PNG) -> one row per
  non-background pixel with its reconstructed quadtree ``cell`` id at
  res z+8 (the same tile/pixel <-> cell alignment the density pyramid
  uses, pipelines/density.py).  Pixel *presence* is exact; ``shade``
  recovers the renderer's normalized intensity (lossy only by uint8
  rounding).
* ``polygonize_mask`` — boolean mask -> exact rectangle decomposition
  (greedy row-run + vertical merge; the classic RLE polygonization
  technique).  Pure numpy, no per-pixel Python loop.
* ``tiles_to_polygons`` — tile rows -> WKT rectangles in MAP
  coordinates (grid bbox + resolution), i.e. vector features a GIS can
  consume directly.

All stages are stateless ``map_batches`` transforms: at 10^12-page
scale the pyramid is read as partitioned parquet and each batch of
tiles decodes independently — no shuffle anywhere in this direction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from tilecloud_chain_ray.functions.cells import cell_id
from tilecloud_chain_ray.functions.png import decode_png
from tilecloud_chain_ray.grid import Grid
from tilecloud_chain_ray.stages.render import BACKGROUND
from tilecloud_chain_ray.util import binary_views


def _pixel_rows_for_tile(
    blob: bytes, background: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PNG blob -> (pcols, prows, shade_u8) of non-background pixels.

    ``shade`` is the max absolute channel deviation from the background
    (uint8) — proportional to the renderer's normalized intensity for
    single-color renders, and a useful feature magnitude in general.
    """
    img = decode_png(blob)
    if img.ndim != 3:  # pragma: no cover - codec always returns 3-d
        raise ValueError("expected (h, w, c) image")
    if img.shape[0] != img.shape[1] or img.shape[0] > 256:
        # cell reconstruction packs (tile << 8 | pixel): only square
        # <=256 px tiles map onto the quadtree; split metatiles first
        # (stages/split.py) before vectorizing
        raise ValueError(
            f"vectorize expects split (<=256 px square) tiles, got {img.shape[:2]}"
        )
    c = min(img.shape[2], 3)
    diff = np.abs(img[:, :, :c].astype(np.int16) - background[:c].astype(np.int16))
    shade = diff.max(axis=2)
    prows, pcols = np.nonzero(shade)
    return pcols.astype(np.int64), prows.astype(np.int64), shade[prows, pcols].astype(np.uint8)


def vectorize_tiles(
    tiles: ray.data.Dataset,
    background: np.ndarray = BACKGROUND,
    with_cells: bool = True,
) -> ray.data.Dataset:
    """Tile rows (z, x, y, data) -> non-background pixel rows.

    Output columns: z, x, y, pcol, prow, shade, and (``with_cells``)
    the quadtree ``cell`` id at res z+8 — the exact inverse of the
    density pyramid's cell->pixel rollup, so vectorized output can be
    re-aggregated, joined against geocoded pages, or re-rendered.
    """

    def decode_batch(batch: pa.Table) -> pa.Table:
        zs = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        xs = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = binary_views(batch["data"])  # zero-copy buffer slices
        out_z, out_x, out_y, out_pc, out_pr, out_sh = [], [], [], [], [], []
        for i, blob in enumerate(blobs):
            if blob is None:
                continue
            pcols, prows, shade = _pixel_rows_for_tile(blob, background)
            if len(pcols) == 0:
                continue
            out_z.append(np.full(len(pcols), zs[i], dtype=np.int64))
            out_x.append(np.full(len(pcols), xs[i], dtype=np.int64))
            out_y.append(np.full(len(pcols), ys[i], dtype=np.int64))
            out_pc.append(pcols)
            out_pr.append(prows)
            out_sh.append(shade.astype(np.int32))
        if not out_z:
            empty = {
                "z": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "pcol": pa.array([], pa.int64()),
                "prow": pa.array([], pa.int64()),
                "shade": pa.array([], pa.int32()),
            }
            if with_cells:
                empty["cell"] = pa.array([], pa.int64())
            return pa.Table.from_pydict(empty)
        z = np.concatenate(out_z)
        x = np.concatenate(out_x)
        y = np.concatenate(out_y)
        pc = np.concatenate(out_pc)
        pr = np.concatenate(out_pr)
        cols = {
            "z": pa.array(z, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "pcol": pa.array(pc, pa.int64()),
            "prow": pa.array(pr, pa.int64()),
            "shade": pa.array(np.concatenate(out_sh), pa.int32()),
        }
        if with_cells:
            # pixel at zoom z == cell at res z+8 (density.py alignment):
            # global pixel coords (x<<8 | pcol, y<<8 | prow), y from top
            px = ((x << 8) | pc).astype(np.uint64)
            py = ((y << 8) | pr).astype(np.uint64)
            # vectorize over mixed z: cell_id needs a scalar res, so
            # group by z (<= a handful of zooms per batch)
            cell = np.empty(len(px), dtype=np.uint64)
            for zz in np.unique(z):
                m = z == zz
                cell[m] = cell_id(px[m], py[m], int(zz) + 8)
            cols["cell"] = pa.array(cell.astype(np.int64), pa.int64())
        return pa.Table.from_pydict(cols)

    return tiles.map_batches(decode_batch, batch_format="pyarrow")


def polygonize_mask(mask: np.ndarray) -> np.ndarray:
    """Boolean (h, w) mask -> exact rectangle cover, shape (n, 4) of
    (row0, col0, row1, col1) half-open bounds.

    Greedy RLE decomposition: horizontal runs per row (one vectorized
    diff), then identical-span runs on consecutive rows merge
    vertically.  Rectangles are disjoint and cover exactly the mask.
    """
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask.astype(np.int8)
    d = np.diff(padded, axis=1)
    run_rows, starts = np.nonzero(d == 1)
    _, ends = np.nonzero(d == -1)
    # runs are emitted row-major by nonzero, so starts/ends pair up
    rects: list[tuple[int, int, int, int]] = []
    open_runs: dict[tuple[int, int], int] = {}  # (col0, col1) -> row0
    prev_row = -1
    i = 0
    n = len(run_rows)
    while i <= n:
        row = int(run_rows[i]) if i < n else h  # sentinel flush
        if row != prev_row:
            # close runs not continued on `prev_row + 1 .. row`
            if prev_row >= 0:
                keep: dict[tuple[int, int], int] = {}
                j = i
                spans_next = set()
                if row == prev_row + 1:
                    while j < n and int(run_rows[j]) == row:
                        spans_next.add((int(starts[j]), int(ends[j])))
                        j += 1
                for span, row0 in open_runs.items():
                    if span in spans_next:
                        keep[span] = row0
                    else:
                        rects.append((row0, span[0], prev_row + 1, span[1]))
                open_runs = keep
            prev_row = row
        if i == n:
            break
        span = (int(starts[i]), int(ends[i]))
        if span not in open_runs:
            open_runs[span] = row
        i += 1
    if not rects:
        return np.empty((0, 4), dtype=np.int64)
    return np.asarray(rects, dtype=np.int64)


def tiles_to_polygons(
    tiles: ray.data.Dataset,
    grid: Grid,
    background: np.ndarray = BACKGROUND,
) -> ray.data.Dataset:
    """Tile rows -> WKT rectangle polygons in map coordinates.

    One row per merged rectangle: (z, x, y, n_pixels, wkt).  Pixel
    (pcol, prow) of tile (x, y) at zoom z spans ``res`` map units where
    ``res = grid.span(z) / tile_size``; rows count from the grid's top
    (same orientation as the renderers).
    """
    ts = grid.tile_size
    minx, _, _, maxy = grid.bbox

    def poly_batch(batch: pa.Table) -> pa.Table:
        zs = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        xs = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = binary_views(batch["data"])  # zero-copy buffer slices
        rows: dict[str, list] = {"z": [], "x": [], "y": [], "n_pixels": [], "wkt": []}
        for i, blob in enumerate(blobs):
            if blob is None:
                continue
            pcols, prows, _ = _pixel_rows_for_tile(blob, background)
            if len(pcols) == 0:
                continue
            mask = np.zeros((ts, ts), dtype=bool)
            mask[prows, pcols] = True
            res = grid.span(int(zs[i])) / ts
            tile_left = minx + xs[i] * ts * res
            tile_top = maxy - ys[i] * ts * res
            for r0, c0, r1, c1 in polygonize_mask(mask):
                x0 = tile_left + c0 * res
                x1 = tile_left + c1 * res
                y0 = tile_top - r1 * res
                y1 = tile_top - r0 * res
                rows["z"].append(int(zs[i]))
                rows["x"].append(int(xs[i]))
                rows["y"].append(int(ys[i]))
                rows["n_pixels"].append(int((r1 - r0) * (c1 - c0)))
                rows["wkt"].append(
                    f"POLYGON (({x0:.17g} {y0:.17g}, {x1:.17g} {y0:.17g}, "
                    f"{x1:.17g} {y1:.17g}, {x0:.17g} {y1:.17g}, {x0:.17g} {y0:.17g}))"
                )
        return pa.Table.from_pydict(
            {
                "z": pa.array(rows["z"], pa.int64()),
                "x": pa.array(rows["x"], pa.int64()),
                "y": pa.array(rows["y"], pa.int64()),
                "n_pixels": pa.array(rows["n_pixels"], pa.int64()),
                "wkt": pa.array(rows["wkt"], pa.string()),
            }
        )

    return tiles.map_batches(poly_batch, batch_format="pyarrow")
