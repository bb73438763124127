"""Raster -> vector direction (pipelines/vectorize.py): polygonize
correctness properties and the density-pyramid round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tilecloud_chain_ray.pipelines.vectorize import polygonize_mask


def _rect_cover_ok(mask: np.ndarray, rects: np.ndarray) -> None:
    """Rectangles must be disjoint and cover exactly the mask."""
    cover = np.zeros_like(mask, dtype=np.int32)
    for r0, c0, r1, c1 in rects:
        assert 0 <= r0 < r1 <= mask.shape[0]
        assert 0 <= c0 < c1 <= mask.shape[1]
        cover[r0:r1, c0:c1] += 1
    assert cover.max(initial=0) <= 1, "overlapping rectangles"
    assert ((cover == 1) == mask).all(), "cover != mask"


def test_polygonize_shapes():
    # empty
    assert polygonize_mask(np.zeros((8, 8), dtype=bool)).shape == (0, 4)
    # full -> one rectangle
    full = np.ones((5, 7), dtype=bool)
    rects = polygonize_mask(full)
    assert rects.tolist() == [[0, 0, 5, 7]]
    # L-shape
    m = np.zeros((6, 6), dtype=bool)
    m[0:6, 0:2] = True
    m[4:6, 0:6] = True
    _rect_cover_ok(m, polygonize_mask(m))
    # diagonal (worst case: one rect per pixel)
    d = np.eye(9, dtype=bool)
    rects = polygonize_mask(d)
    assert len(rects) == 9
    _rect_cover_ok(d, rects)
    # checkerboard
    cb = np.indices((8, 8)).sum(axis=0) % 2 == 0
    _rect_cover_ok(cb, polygonize_mask(cb))


def test_polygonize_random_property():
    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = rng.integers(1, 40, 2)
        mask = rng.random((h, w)) < rng.uniform(0.05, 0.9)
        _rect_cover_ok(mask, polygonize_mask(mask))


def test_polygonize_vertical_merge():
    # identical spans on consecutive rows merge into ONE rectangle
    m = np.zeros((10, 10), dtype=bool)
    m[2:9, 3:7] = True
    rects = polygonize_mask(m)
    assert rects.tolist() == [[2, 3, 9, 7]]
    # interrupted by an empty row: two rectangles
    m[5, :] = False
    rects = polygonize_mask(m)
    assert sorted(rects.tolist()) == [[2, 3, 5, 7], [6, 3, 9, 7]]


@pytest.mark.usefixtures("ray_session")
def test_vectorize_density_roundtrip():
    """cells -> density_pyramid -> vectorize_tiles reconstructs the
    exact non-empty pixel set (and their cell ids) for every zoom."""
    import ray

    from tilecloud_chain_ray.config import Layer
    from tilecloud_chain_ray.functions.cells import cell_decode, cell_for_micro
    from tilecloud_chain_ray.grid import WEBMERC
    from tilecloud_chain_ray.pipelines.density import density_pyramid
    from tilecloud_chain_ray.pipelines.vectorize import vectorize_tiles

    rng = np.random.default_rng(3)
    n = 5000
    ux = rng.integers(0, 2**32, n, dtype=np.uint64)
    uy = rng.integers(0, 2**32, n, dtype=np.uint64)
    cells = cell_for_micro(ux, uy, 10)
    zooms = [0, 1, 2]
    ds = ray.data.from_arrow(pa.table({"cell": cells.astype(np.int64)}))
    lay = Layer(name="rt_density", grid=WEBMERC, meta=False)
    result = density_pyramid(ds, lay, zooms=zooms, with_summary=False)
    tiles = result.tiles

    vec = vectorize_tiles(tiles).take_all()

    # expected pixel set per zoom from the raw cells (res 10 -> pixel
    # res z+8 by right-shift)
    res, cx, cy = cell_decode(cells)
    for z in zooms:
        shift = 10 - (z + 8)
        px = (cx >> shift).astype(np.int64)
        py = (cy >> shift).astype(np.int64)
        expected = set(zip(px.tolist(), py.tolist()))
        got = {
            ((r["x"] << 8) | r["pcol"], (r["y"] << 8) | r["prow"])
            for r in vec
            if r["z"] == z
        }
        assert got == expected, f"zoom {z}: pixel set mismatch"

    # cell ids reconstruct the pixel rollup exactly
    from tilecloud_chain_ray.functions.cells import cell_id

    z = 2
    shift = 10 - (z + 8)
    expected_cells = set(
        cell_id((cx >> shift).astype(np.uint64), (cy >> shift).astype(np.uint64), z + 8)
        .astype(np.int64)
        .tolist()
    )
    got_cells = {r["cell"] for r in vec if r["z"] == z}
    assert got_cells == expected_cells

    # shade is positive everywhere (these are non-background pixels)
    assert all(r["shade"] > 0 for r in vec)


@pytest.mark.usefixtures("ray_session")
def test_tiles_to_polygons_map_coords():
    """Polygon WKT covers exactly the shaded pixels, in map units."""
    import ray

    from tilecloud_chain_ray.config import Layer
    from tilecloud_chain_ray.functions.cells import cell_for_micro
    from tilecloud_chain_ray.geom.wkt import geometry_from_wkt
    from tilecloud_chain_ray.grid import WEBMERC
    from tilecloud_chain_ray.pipelines.density import density_pyramid
    from tilecloud_chain_ray.pipelines.vectorize import (
        tiles_to_polygons,
        vectorize_tiles,
    )

    rng = np.random.default_rng(5)
    n = 400
    ux = rng.integers(0, 2**32, n, dtype=np.uint64)
    uy = rng.integers(0, 2**32, n, dtype=np.uint64)
    cells = cell_for_micro(ux, uy, 9)
    ds = ray.data.from_arrow(pa.table({"cell": cells.astype(np.int64)}))
    lay = Layer(name="rt_poly", grid=WEBMERC, meta=False)
    tiles = density_pyramid(ds, lay, zooms=[1], with_summary=False).tiles.materialize()

    n_pix = len(vectorize_tiles(tiles).take_all())
    polys = tiles_to_polygons(tiles, WEBMERC).take_all()
    assert sum(p["n_pixels"] for p in polys) == n_pix

    # every polygon parses, is a rectangle, and lies inside its tile
    res = WEBMERC.span(1) / WEBMERC.tile_size
    for p in polys:
        g = geometry_from_wkt(p["wkt"])
        minx, miny, maxx, maxy = g.bounds
        # area is an integer number of pixels
        n_from_area = (maxx - minx) * (maxy - miny) / (res * res)
        assert abs(n_from_area - p["n_pixels"]) < 1e-6
        tile_left = WEBMERC.bbox[0] + p["x"] * WEBMERC.span(1)
        tile_top = WEBMERC.bbox[3] - p["y"] * WEBMERC.span(1)
        assert tile_left - 1e-6 <= minx and maxx <= tile_left + WEBMERC.span(1) + 1e-6
        assert tile_top - WEBMERC.span(1) - 1e-6 <= miny and maxy <= tile_top + 1e-6


@pytest.mark.usefixtures("ray_session")
def test_density_pyramid_full_zoom_range_z14():
    """The north-rule zoom range (0-14) end-to-end on a small doc set:
    data-driven tiles only, exact per-zoom tile sets at the extremes,
    and the raster->vector round-trip at z14."""
    import ray

    from tilecloud_chain_ray.config import Layer
    from tilecloud_chain_ray.functions.cells import cell_decode, cell_for_micro
    from tilecloud_chain_ray.grid import WEBMERC
    from tilecloud_chain_ray.pipelines.density import density_pyramid
    from tilecloud_chain_ray.pipelines.vectorize import vectorize_tiles

    rng = np.random.default_rng(22)
    n = 200
    ux = rng.integers(0, 2**32, n, dtype=np.uint64)
    uy = rng.integers(0, 2**32, n, dtype=np.uint64)
    cells = cell_for_micro(ux, uy, 22)  # fine enough for z14 pixels
    zooms = list(range(15))
    ds = ray.data.from_arrow(pa.table({"cell": cells.astype(np.int64)}))
    lay = Layer(name="z14_density", grid=WEBMERC, meta=False)
    tiles = density_pyramid(ds, lay, zooms=zooms, with_summary=False).tiles.materialize()
    rows = tiles.select_columns(["z", "x", "y"]).take_all()
    by_zoom = {}
    for r in rows:
        by_zoom.setdefault(r["z"], set()).add((r["x"], r["y"]))
    assert sorted(by_zoom) == zooms

    _, cx, cy = cell_decode(cells)
    for z in (0, 7, 14):
        shift = 22 - (z + 8)
        expected = set(
            zip(((cx >> shift) >> 8).tolist(), ((cy >> shift) >> 8).tolist())
        )
        assert by_zoom[z] == expected, f"zoom {z}"

    # raster->vector at the deepest zoom: exact pixel reconstruction
    z14 = tiles.filter(lambda r: r["z"] == 14)
    vec = vectorize_tiles(z14).take_all()
    got = {((r["x"] << 8) | r["pcol"], (r["y"] << 8) | r["prow"]) for r in vec}
    shift = 22 - 22
    expected_px = set(zip(cx.tolist(), cy.tolist()))
    assert got == expected_px


@pytest.mark.usefixtures("ray_session")
def test_vectorize_rejects_metatiles():
    import ray

    from tilecloud_chain_ray.functions.png import encode_png
    from tilecloud_chain_ray.pipelines.vectorize import vectorize_tiles

    big = np.zeros((512, 512, 4), dtype=np.uint8)  # unsplit 2x2 metatile
    big[0, 0] = (1, 2, 3, 255)
    tiles = ray.data.from_arrow(
        pa.table(
            {
                "z": pa.array([1], pa.int64()),
                "x": pa.array([0], pa.int64()),
                "y": pa.array([0], pa.int64()),
                "data": pa.array([encode_png(big)], pa.binary()),
            }
        )
    )
    with pytest.raises(Exception, match="split"):
        vectorize_tiles(tiles).take_all()


@pytest.mark.usefixtures("ray_session")
def test_vectorize_null_data_rows_skipped():
    import ray

    from tilecloud_chain_ray.functions.png import encode_png
    from tilecloud_chain_ray.pipelines.vectorize import vectorize_tiles

    img = np.zeros((4, 4, 4), dtype=np.uint8)
    img[:] = (240, 240, 240, 255)
    img[1, 2] = (10, 20, 30, 255)
    tiles = ray.data.from_arrow(
        pa.table(
            {
                "z": pa.array([0, 0], pa.int64()),
                "x": pa.array([0, 1], pa.int64()),
                "y": pa.array([0, 0], pa.int64()),
                "data": pa.array([encode_png(img), None], pa.binary()),
            }
        )
    )
    rows = vectorize_tiles(tiles).take_all()
    assert len(rows) == 1 and (rows[0]["pcol"], rows[0]["prow"]) == (2, 1)
