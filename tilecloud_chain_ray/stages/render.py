"""Deterministic metatile renderer (A1/A2 analog).

The reference fetches metatile images from WMS/Mapnik
(``/root/reference/tilecloud_chain/store/url.py:29-145``,
``store/mapnik_.py:16-114``); this environment has no network or map
server, so the engine renders deterministically itself:

* ``GeometryRenderer`` — rasterizes the layer geometries (points as
  single pixels, lines sampled, polygons PIP-filled over pixel
  centers).  Gives renderer-independent parity with the reference's
  structural goldens: a child tile is non-empty iff geometry touches it.
* ``DensityRenderer`` — shades per-pixel page counts (the graft's
  raster tile assembly; input rows carry pre-aggregated cell counts).

Both are actor classes for ``map_batches`` (state: decoded geometries /
color tables built once per actor).  Output column ``data`` holds PNG
bytes; ``content_type`` = image/png.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.functions.png import encode_png
from tilecloud_chain_ray.geom import Geometry, LineString, Point, Polygon
from tilecloud_chain_ray.geom.geometry import iter_leaves
from tilecloud_chain_ray.geom.ops import points_in_polygon

BACKGROUND = np.array([240, 240, 240, 255], dtype=np.uint8)


def layer_color(name: str) -> np.ndarray:
    h = zlib.crc32(name.encode())
    return np.array([(h >> 16) & 0xFF, (h >> 8) & 0xFF, h & 0xFF, 255], dtype=np.uint8)


def render_geometries(
    geoms: list[Geometry],
    extent: tuple[float, float, float, float],
    size: tuple[int, int],
    color: np.ndarray,
) -> np.ndarray:
    """Rasterize geometries into an RGBA image over ``extent``."""
    return render_leaves(list(iter_leaves_all(geoms)), extent, size, color)


def render_leaves(
    leaves: list[Geometry],
    extent: tuple[float, float, float, float],
    size: tuple[int, int],
    color: np.ndarray,
) -> np.ndarray:
    """Rasterize leaf geometries into an RGBA image over ``extent``.

    Pixel (row 0, col 0) is the top-left; pixel centers sample the map.
    """
    width, height = size
    minx, miny, maxx, maxy = extent
    resx = (maxx - minx) / width
    resy = (maxy - miny) / height
    img = np.empty((height, width, 4), dtype=np.uint8)
    img[:] = BACKGROUND

    def to_px(mx, my):
        col = np.floor((np.asarray(mx) - minx) / resx).astype(np.int64)
        row = np.floor((maxy - np.asarray(my)) / resy).astype(np.int64)
        return col, row

    for leaf in leaves:
        if isinstance(leaf, Point):
            col, row = to_px(leaf.x, leaf.y)
            if 0 <= col < width and 0 <= row < height:
                img[row, col] = color
        elif isinstance(leaf, LineString):
            c = leaf.coords
            for i in range(len(c) - 1):
                seg_len_px = (
                    abs(c[i + 1, 0] - c[i, 0]) / resx + abs(c[i + 1, 1] - c[i, 1]) / resy
                )
                steps = max(2, int(seg_len_px * 2) + 1)
                t = np.linspace(0.0, 1.0, steps)
                col, row = to_px(
                    c[i, 0] + t * (c[i + 1, 0] - c[i, 0]),
                    c[i, 1] + t * (c[i + 1, 1] - c[i, 1]),
                )
                ok = (col >= 0) & (col < width) & (row >= 0) & (row < height)
                img[row[ok], col[ok]] = color
        elif isinstance(leaf, Polygon):
            gminx, gminy, gmaxx, gmaxy = leaf.bounds
            c0 = max(0, int(np.floor((gminx - minx) / resx)))
            c1 = min(width, int(np.ceil((gmaxx - minx) / resx)) + 1)
            r0 = max(0, int(np.floor((maxy - gmaxy) / resy)))
            r1 = min(height, int(np.ceil((maxy - gminy) / resy)) + 1)
            if c0 >= c1 or r0 >= r1:
                continue
            cols = np.arange(c0, c1)
            rows = np.arange(r0, r1)
            px = minx + (cols + 0.5) * resx
            py = maxy - (rows + 0.5) * resy
            gx, gy = np.meshgrid(px, py)
            inside = points_in_polygon(gx.ravel(), gy.ravel(), leaf).reshape(len(rows), len(cols))
            img[r0:r1, c0:c1][inside] = color
    return img


def iter_leaves_all(geoms):
    for g in geoms:
        yield from iter_leaves(g)


class GeometryRenderer:
    """Render each (meta)tile coord row from the layer geometries."""

    def __init__(self, layer: Layer, geoms_ref=None) -> None:
        from tilecloud_chain_ray.geom.strtree import STRtree

        self.layer = layer
        geoms = ray.get(geoms_ref) if isinstance(geoms_ref, ray.ObjectRef) else geoms_ref
        raw = list(geoms) if geoms is not None else list(layer.geometries)
        # unwrap GeometrySource entries: the renderer draws every
        # source's data at every zoom (WMS renders all its layers; the
        # per-resolution bounds only steer seeding geometry)
        self.geoms = [getattr(g, "geometry", g) for g in raw]
        self.color = layer_color(layer.name)
        # per-actor STRtree over leaf bounds: each render touches only
        # the leaves intersecting its extent, not every source geometry
        self.leaves = list(iter_leaves_all(self.geoms))
        self.tree = STRtree(
            np.array([lf.bounds for lf in self.leaves], dtype=np.float64).reshape(-1, 4)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        grid = self.layer.grid
        buffer_px = self.layer.meta_buffer if self.layer.meta else 0
        z = batch["z"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        blobs = []
        for i in range(batch.num_rows):
            size_px = int(n[i]) * grid.tile_size + 2 * buffer_px
            extent = grid.extent(int(z[i]), int(x[i]), int(y[i]), int(n[i]), buffer_px)
            hit = [self.leaves[j] for j in self.tree.query(*extent)]
            img = render_leaves(hit, extent, (size_px, size_px), self.color)
            blobs.append(encode_png(img))
        out = batch.append_column("data", pa.array(blobs, pa.binary()))
        return out.append_column(
            "content_type", pa.array(["image/png"] * batch.num_rows, pa.string())
        )


def render_density_image(
    cols: np.ndarray,
    rows: np.ndarray,
    counts: np.ndarray,
    size_px: int,
    color: np.ndarray,
    log_scale: bool = True,
) -> np.ndarray:
    """Shade per-pixel counts into an RGBA image (shared by the
    row-oriented DensityRenderer stage and the bucket assembler)."""
    img = np.empty((size_px, size_px, 4), dtype=np.uint8)
    img[:] = BACKGROUND
    ok = (cols >= 0) & (cols < size_px) & (rows >= 0) & (rows < size_px)
    if ok.any():
        v = counts[ok].astype(np.float64)
        shade = (
            np.log1p(v) / np.log1p(max(v.max(), 1.0)) if log_scale else v / max(v.max(), 1.0)
        )
        px = np.empty((int(ok.sum()), 4), dtype=np.uint8)
        px[:, :3] = (
            BACKGROUND[:3].astype(np.float64) * (1 - shade[:, None])
            + color[:3].astype(np.float64) * shade[:, None]
        ).astype(np.uint8)
        px[:, 3] = 255
        img[rows[ok], cols[ok]] = px
    return img


class DensityRenderer:
    """Render page-density tiles from per-pixel cell counts.

    Input rows: one per (meta)tile, with ``pixel_cols``/``pixel_rows``/
    ``pixel_counts`` list columns (pre-aggregated upstream by the
    cell-count rollup — see pipelines.density).  Shades count -> alpha
    ramp in the layer color; zero-count pixels stay background.
    """

    def __init__(self, layer: Layer, log_scale: bool = True, png_level: int = 3) -> None:
        self.layer = layer
        self.color = layer_color(layer.name)
        self.log_scale = log_scale
        self.png_level = png_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        grid = self.layer.grid
        buffer_px = self.layer.meta_buffer if self.layer.meta else 0
        n_col = batch["n"].to_numpy(zero_copy_only=False)
        blobs = []
        for i in range(batch.num_rows):
            size_px = int(n_col[i]) * grid.tile_size + 2 * buffer_px
            cols = np.asarray(batch["pixel_cols"][i].as_py(), dtype=np.int64) + buffer_px
            rows = np.asarray(batch["pixel_rows"][i].as_py(), dtype=np.int64) + buffer_px
            counts = np.asarray(batch["pixel_counts"][i].as_py(), dtype=np.float64)
            img = render_density_image(cols, rows, counts, size_px, self.color, self.log_scale)
            blobs.append(encode_png(img, level=self.png_level))
        out = batch.drop_columns(["pixel_cols", "pixel_rows", "pixel_counts"])
        out = out.append_column("data", pa.array(blobs, pa.binary()))
        return out.append_column(
            "content_type", pa.array(["image/png"] * batch.num_rows, pa.string())
        )
