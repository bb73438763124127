"""Vector tile renderer: UTFGrid-style JSON output (A2, grid mode).

The reference's Mapnik store with ``output_format: grid`` encodes an
interactivity grid: the tile is sampled at ``tile_size / resolution``
cells; each cell holds the key of the feature under it, encoded with
the UTFGrid character scheme (id -> chr(id+32), skipping 34 and 92)
(``/root/reference/tilecloud_chain/store/mapnik_.py:60-114``, public
Mapbox UTFGrid spec).  ``drop_empty_utfgrid`` drops tiles whose grid
references no feature (``store/mapnik_.py:117-171``).

Here features are the layer's geometries, sampled by the same PIP /
distance tests as the raster renderer — deterministic, library-free.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.geom import Geometry, LineString, Point, Polygon
from tilecloud_chain_ray.geom.geometry import iter_leaves
from tilecloud_chain_ray.geom.ops import points_in_polygon


def _utf_char(index: int) -> str:
    """UTFGrid id encoding: codepoint = id + 32, skipping '"' and '\\'."""
    code = index + 32
    if code >= 34:
        code += 1
    if code >= 92:
        code += 1
    return chr(code)


def render_utfgrid(
    features: list[tuple[str, Geometry]],
    extent: tuple[float, float, float, float],
    tile_size: int = 256,
    resolution: int = 16,
) -> dict:
    """Sample features over the extent into a UTFGrid JSON dict."""
    n = tile_size // resolution
    minx, miny, maxx, maxy = extent
    step_x = (maxx - minx) / n
    step_y = (maxy - miny) / n
    cols = minx + (np.arange(n) + 0.5) * step_x
    rows = maxy - (np.arange(n) + 0.5) * step_y
    gx, gy = np.meshgrid(cols, rows)
    gx = gx.ravel()
    gy = gy.ravel()
    hit = np.full(gx.shape, -1, dtype=np.int64)
    # sampling reaches step/2 beyond a feature's bounds — prune with margin
    mx, my = step_x / 2, step_y / 2
    for fi, (_, geom) in enumerate(features):
        gb = geom.bounds
        if gb[0] > maxx + mx or gb[2] < minx - mx or gb[1] > maxy + my or gb[3] < miny - my:
            continue
        mask = np.zeros(len(gx), dtype=bool)
        for leaf in iter_leaves(geom):
            if isinstance(leaf, Polygon):
                mask |= points_in_polygon(gx, gy, leaf)
            elif isinstance(leaf, Point):
                mask |= (np.abs(gx - leaf.x) <= step_x / 2) & (
                    np.abs(gy - leaf.y) <= step_y / 2
                )
            elif isinstance(leaf, LineString):
                c = leaf.coords
                for i in range(len(c) - 1):
                    # distance from sample centers to the segment
                    dx, dy = c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1]
                    ll = dx * dx + dy * dy
                    if ll == 0:
                        continue
                    t = np.clip(((gx - c[i, 0]) * dx + (gy - c[i, 1]) * dy) / ll, 0, 1)
                    d2 = (gx - (c[i, 0] + t * dx)) ** 2 + (gy - (c[i, 1] + t * dy)) ** 2
                    mask |= d2 <= (min(step_x, step_y) / 2) ** 2
        hit[mask & (hit < 0)] = fi
    # compact: only referenced features get keys, in first-use order
    used: list[int] = []
    remap = {}
    for v in hit:
        if v >= 0 and v not in remap:
            remap[v] = len(used)
            used.append(int(v))
    grid_rows = []
    for r in range(n):
        row = hit[r * n : (r + 1) * n]
        grid_rows.append(
            "".join(_utf_char(remap[v] + 1) if v >= 0 else " " for v in row)
        )
    return {
        "grid": grid_rows,
        "keys": [""] + [str(u + 1) for u in used],
        "data": {str(u + 1): {"name": features[u][0]} for u in used},
    }


class UTFGridRenderer:
    """map_batches stage: one UTFGrid JSON per (meta)tile coord row.

    ``drop_empty``: tiles whose grid references nothing become
    ``status='dropped'`` rows with null data (the reference's
    ``drop_empty_utfgrid``)."""

    def __init__(
        self,
        layer: Layer,
        geoms_ref=None,
        resolution: int = 16,
        drop_empty: bool = False,
    ) -> None:
        self.layer = layer
        geoms = ray.get(geoms_ref) if isinstance(geoms_ref, ray.ObjectRef) else geoms_ref
        src = list(geoms) if geoms is not None else list(layer.geometries)
        self.features = [(f"{layer.name}_{i}", g) for i, g in enumerate(src)]
        self.resolution = resolution
        self.drop_empty = drop_empty

    def __call__(self, batch: pa.Table) -> pa.Table:
        grid = self.layer.grid
        z = batch["z"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        blobs: list[bytes | None] = []
        statuses: list[str] = []
        for i in range(batch.num_rows):
            extent = grid.extent(int(z[i]), int(x[i]), int(y[i]), int(n[i]))
            doc = render_utfgrid(
                self.features, extent, grid.tile_size * int(n[i]), self.resolution
            )
            if self.drop_empty and len(doc["keys"]) <= 1:
                blobs.append(None)
                statuses.append("dropped")
            else:
                blobs.append(json.dumps(doc, sort_keys=True).encode())
                statuses.append("generated")
        out = batch.append_column("data", pa.array(blobs, pa.binary()))
        out = out.append_column(
            "content_type", pa.array(["application/utfgrid"] * batch.num_rows, pa.string())
        )
        return out.append_column("status", pa.array(statuses, pa.string()))
