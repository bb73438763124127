"""STRtree pruning in the geometry renderer: identical pixels to the
linear scan, large speedup with many source geometries
(VERDICT r1 item: render.py looped every layer geometry per metatile)."""

import time

import numpy as np
import pyarrow as pa
import pytest

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.geom import MultiPolygon, Polygon
from tilecloud_chain_ray.grid import SWISSGRID_5
from tilecloud_chain_ray.stages.render import (
    GeometryRenderer,
    layer_color,
    render_geometries,
    render_leaves,
)


def many_polygon_layer(n_polys: int = 2000) -> Layer:
    rng = np.random.default_rng(42)
    g = SWISSGRID_5
    minx, miny, maxx, maxy = g.bbox
    polys = []
    for _ in range(n_polys):
        x = rng.uniform(minx, maxx - 2000)
        y = rng.uniform(miny, maxy - 2000)
        w, h = rng.uniform(200, 1500, 2)
        polys.append(Polygon([(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]))
    return Layer(
        name="many_polys", grid=g, geometries=(MultiPolygon(tuple(polys)),), meta=False
    )


def coord_batch(coords):
    z, x, y = zip(*coords)
    return pa.Table.from_pydict(
        {
            "z": pa.array(z, pa.int32()),
            "x": pa.array(list(x), pa.int64()),
            "y": pa.array(list(y), pa.int64()),
            "n": pa.array([1] * len(coords), pa.int32()),
        }
    )


def test_pruned_render_matches_linear_scan():
    layer = many_polygon_layer(300)
    r = GeometryRenderer(layer)
    grid = layer.grid
    for z, x, y in [(4, 10, 10), (4, 50, 30), (2, 5, 5), (0, 0, 0)]:
        extent = grid.extent(z, x, y, 1, 0)
        size = (grid.tile_size, grid.tile_size)
        linear = render_geometries(r.geoms, extent, size, r.color)
        hit = [r.leaves[j] for j in r.tree.query(*extent)]
        pruned = render_leaves(hit, extent, size, r.color)
        assert np.array_equal(linear, pruned), (z, x, y)


def test_pruned_render_is_faster_with_many_geometries():
    layer = many_polygon_layer(3000)
    r = GeometryRenderer(layer)
    grid = layer.grid
    coords = [(4, cx, cy) for cx in range(40, 48) for cy in range(40, 46)]
    batch = coord_batch(coords)

    t0 = time.perf_counter()
    out = r(batch)
    pruned_t = time.perf_counter() - t0
    assert out.num_rows == len(coords)

    t0 = time.perf_counter()
    for z, x, y in coords[:6]:
        extent = grid.extent(z, x, y, 1, 0)
        render_geometries(r.geoms, extent, (grid.tile_size, grid.tile_size), r.color)
    linear_6 = time.perf_counter() - t0
    linear_t = linear_6 * len(coords) / 6
    # generous 2x bar to stay robust on noisy CI-style hosts; the real
    # ratio is ~leaves_total / leaves_per_extent
    assert pruned_t < linear_t / 2, (pruned_t, linear_t)
