"""Grid-math conformance against the reference's goldens.

Golden sources (in /root/reference/tilecloud_chain/tests/):
* ``--get-bbox`` exact bounds — test_generate.py:813-837
* stored-tile coordinates for the point fixtures — test_generate.py:1281-1316
* matrix identifier path segments — test_generate.py:1102-1184
"""

import math

import numpy as np
import pytest

from tilecloud_chain_ray.grid import (
    SWISSGRID_01,
    SWISSGRID_5,
    WEBMERC,
    Grid,
    lonlat_to_webmercator,
    resolution_scale,
)


def test_get_bbox_golden_tile():
    # reference: generate-controller --get-bbox 4/4/4 (test_generate.py:813-824)
    assert SWISSGRID_5.extent(4, 4, 4) == (425120, 343600, 426400, 344880)


def test_get_bbox_golden_metatile():
    # reference: --get-bbox 4/4/4:+2/+2 (test_generate.py:826-837)
    assert SWISSGRID_5.extent(4, 4, 4, n=2) == (425120, 342320, 427680, 344880)


def test_point_tile_indices_golden():
    # The two fixture points land on exactly the stored-tile coordinates
    # of the point_hash golden run (test_generate.py:1281-1316), rows
    # counted top-down (WMTS z/row/col path => (z, y, x)).
    expected = {
        0: [(7, 5), (4, 7)],  # (x=col, y=row) per zoom, point1 then point2
        1: [(14, 11), (8, 15)],
        2: [(35, 29), (21, 39)],
        3: [(70, 58), (42, 78)],
    }
    p1 = (600000, 200000)
    p2 = (530000, 150000)
    for z, ((x1, y1), (x2, y2)) in expected.items():
        assert SWISSGRID_5.tile_index(z, *p1) == (x1, y1)
        assert SWISSGRID_5.tile_index(z, *p2) == (x2, y2)


def test_extent_contains_point():
    for z in range(4):
        x, y = SWISSGRID_5.tile_index(z, 600000, 200000)
        minx, miny, maxx, maxy = SWISSGRID_5.extent(z, x, y)
        assert minx <= 600000 < maxx
        assert miny < 200000 <= maxy


def test_matrix_dims():
    # z0: 480000/25600 = 18.75 -> 19 wide; 320000/25600 = 12.5 -> 13 high
    # (matches the 247-tile dense golden, test_generate.py:1743-1774)
    assert SWISSGRID_5.matrix_dims(0) == (19, 13)
    assert SWISSGRID_5.matrix_dims(0)[0] * SWISSGRID_5.matrix_dims(0)[1] == 247
    # metatile matrix at z0, n=8
    assert SWISSGRID_5.matrix_dims(0, n=8) == (3, 2)


def test_matrix_identifier_resolution():
    # golden paths ".../1/x/y.png", ".../0_2/...", ".../0_1/..."
    # (test_generate.py:1102-1184)
    assert SWISSGRID_01.matrix_id(0) == "1"
    assert SWISSGRID_01.matrix_id(1) == "0_2"
    assert SWISSGRID_01.matrix_id(2) == "0_1"
    assert SWISSGRID_5.matrix_id(3) == "3"


def test_resolution_scale():
    assert resolution_scale([100, 50, 20, 10, 5]) == 1
    assert resolution_scale([1, 0.2, 0.1]) == 10
    assert resolution_scale([2.5]) == 2
    assert resolution_scale([0.25]) == 4


def test_scaled_span_exact():
    # 0.1 * 256 = 25.6 must be exact in scaled space
    g = SWISSGRID_01
    assert g.scale == 10
    assert g.span(2) == pytest.approx(25.6)
    # index math at a boundary: x = 420000 + 100 * 25.6 exactly
    x, y = g.tile_index(2, 420000 + 100 * 25.6, 350000)
    assert x == 100
    assert y == 0


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    mx = rng.uniform(420000, 900000, 1000)
    my = rng.uniform(30000, 350000, 1000)
    for z in range(5):
        xs, ys = SWISSGRID_5.tile_index_np(z, mx, my)
        for i in range(0, 1000, 97):
            assert (xs[i], ys[i]) == SWISSGRID_5.tile_index(z, mx[i], my[i])


def test_webmerc_grid():
    assert len(WEBMERC.resolutions) == 15
    w, h = WEBMERC.matrix_dims(14)
    assert (w, h) == (2**14, 2**14)
    # zoom 0 is a single tile covering the world
    assert WEBMERC.matrix_dims(0) == (1, 1)


def test_lonlat_to_webmercator():
    x, y = lonlat_to_webmercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert x[0] == 0 and y[0] == pytest.approx(0, abs=1e-6)
    assert x[1] == pytest.approx(20037508.342789244)
    # Greenwich / equator tile at z1 = (1, 1)
    assert WEBMERC.tile_index(1, 1.0, -1.0) == (1, 1)


def test_polygon_fixture_tiles():
    # polygon layer z0 golden: rows 5-7 x cols 4-7 (test_generate.py:1384-1406)
    corners = [(530000, 150000), (600000, 200000)]
    (x0, y0), (x1, y1) = [SWISSGRID_5.tile_index(0, *c) for c in corners]
    assert sorted([x0, x1]) == [4, 7]
    assert sorted([y0, y1]) == [5, 7]


def test_webmerc_slippy_tile_golden():
    """Known slippy-map tile addresses (public OSM formula)."""
    import math

    def slippy(lon, lat, z):
        n = 2**z
        x = int((lon + 180.0) / 360.0 * n)
        lat_rad = math.radians(lat)
        y = int((1.0 - math.asinh(math.tan(lat_rad)) / math.pi) / 2.0 * n)
        return x, y

    cases = [(13.4, 52.52, 10), (-74.006, 40.7128, 12), (151.2, -33.87, 8), (0.0, 0.0, 3)]
    for lon, lat, z in cases:
        mx, my = lonlat_to_webmercator(np.array([lon]), np.array([lat]))
        got = WEBMERC.tile_index(z, float(mx[0]), float(my[0]))
        assert got == slippy(lon, lat, z), (lon, lat, z)
