"""From-scratch CRS engine vs published anchors and roundtrips.

Anchors:
* Web Mercator world edge x(180 deg) = 20037508.342789244 (published).
* Swiss fundamental point: projecting (lon_0, lat_0) of EPSG:21781
  yields exactly (600000, 200000) by construction of the projection.
* EPSG:21781 -> EPSG:2056 differs by exactly (+2000000, +1000000)
  (same datum + projection, shifted false origin).
* WGS84 -> LV95 cross-checked against swisstopo's published
  approximate formulas (stated accuracy ~1 m within Switzerland).
* UTM: the central meridian maps to easting 500000 with scale 0.9996;
  Lambert-93: (lon_0, lat_0) -> (700000, 6600000) exactly.
"""

import math

import numpy as np
import pytest

from tilecloud_chain_ray.proj import (
    Transformer,
    get_proj4_literal,
    normalize_bbox,
    parse_proj4,
    transform_bbox,
    transform_geometry,
)

LL = get_proj4_literal(4326)
WM = get_proj4_literal(3857)
LV03 = get_proj4_literal(21781)
LV95 = get_proj4_literal(2056)


def test_parse_proj4_somerc():
    p = parse_proj4(LV03)
    assert p["proj"] == "somerc"
    assert p["x_0"] == 600000 and p["y_0"] == 200000
    assert p["towgs84"][:3] == (674.374, 15.056, 405.346)


def test_webmercator_published_edge():
    t = Transformer.from_proj4(LL, WM)
    x, y = t.transform(180.0, 0.0)
    assert abs(float(x) - 20037508.342789244) < 1e-6
    assert abs(float(y)) < 1e-9
    x, y = t.transform(8.0, 0.0)
    assert abs(float(x) - 6378137.0 * math.radians(8.0)) < 1e-6


def test_webmercator_roundtrip():
    t = Transformer.from_proj4(LL, WM)
    inv = Transformer.from_proj4(WM, LL)
    lon = np.array([-170.0, -8.5, 0.0, 7.44, 179.0])
    lat = np.array([-80.0, -45.0, 0.0, 46.95, 84.0])
    x, y = t.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_swiss_fundamental_point_exact():
    # the projection maps its own origin to the false origin exactly
    t = Transformer.from_proj4(LV03, LV03)
    p = parse_proj4(LV03)
    fwd = Transformer.from_proj4(
        "+proj=longlat +ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0 +no_defs",
        LV03,
    )
    x, y = fwd.transform(p["lon_0"], p["lat_0"])
    assert abs(float(x) - 600000.0) < 1e-6
    assert abs(float(y) - 200000.0) < 1e-6
    assert t.transform(1.0, 2.0)[0] == pytest.approx(1.0)


def test_lv03_to_lv95_exact_offset():
    t = Transformer.from_proj4(LV03, LV95)
    xs = np.array([600000.0, 530000.0, 700000.0])
    ys = np.array([200000.0, 150000.0, 250000.0])
    x2, y2 = t.transform(xs, ys)
    np.testing.assert_allclose(x2, xs + 2_000_000.0, atol=1e-9)
    np.testing.assert_allclose(y2, ys + 1_000_000.0, atol=1e-9)


def swisstopo_approx_wgs84_to_lv95(lon_deg: float, lat_deg: float):
    """swisstopo's published approximate formulas (~1 m accuracy)."""
    phi = (lat_deg * 3600.0 - 169028.66) / 10000.0
    lam = (lon_deg * 3600.0 - 26782.5) / 10000.0
    e = (
        2600072.37
        + 211455.93 * lam
        - 10938.51 * lam * phi
        - 0.36 * lam * phi * phi
        - 44.54 * lam**3
    )
    n = (
        1200147.07
        + 308807.95 * phi
        + 3745.25 * lam * lam
        + 76.63 * phi * phi
        - 194.56 * lam * lam * phi
        + 119.79 * phi**3
    )
    return e, n


@pytest.mark.parametrize(
    "lon,lat",
    [(7.438632, 46.951083), (8.0, 47.0), (6.6, 46.5), (9.5, 46.9), (7.0, 46.2)],
)
def test_wgs84_to_lv95_vs_swisstopo_approx(lon, lat):
    t = Transformer.from_proj4(LL, LV95)
    x, y = t.transform(lon, lat)
    ax, ay = swisstopo_approx_wgs84_to_lv95(lon, lat)
    # the approximate formulas are stated good to ~1 m; allow 2 m
    assert abs(float(x) - ax) < 2.0, (float(x), ax)
    assert abs(float(y) - ay) < 2.0, (float(y), ay)


def test_swiss_roundtrip_micrometer():
    t = Transformer.from_proj4(LL, LV03)
    inv = Transformer.from_proj4(LV03, LL)
    lon = np.array([6.2, 7.44, 8.9, 10.2])
    lat = np.array([45.9, 46.95, 47.6, 46.4])
    x, y = t.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-11)
    np.testing.assert_allclose(lat2, lat, atol=1e-11)


def test_utm_central_meridian():
    utm32 = get_proj4_literal(32632)
    t = Transformer.from_proj4(LL, utm32)
    x, y = t.transform(9.0, 0.0)
    assert abs(float(x) - 500000.0) < 1e-6
    assert abs(float(y)) < 1e-6
    # scale 0.9996 along the central meridian: 1 deg of lat near equator
    x1, y1 = t.transform(9.0, 1.0)
    arc = 110574.38855780  # meridian arc length 0->1 deg on WGS84 (published)
    assert abs(float(y1) - 0.9996 * arc) < 0.5


def test_utm_roundtrip():
    utm32 = get_proj4_literal(25832)
    t = Transformer.from_proj4(LL, utm32)
    inv = Transformer.from_proj4(utm32, LL)
    lon = np.array([6.1, 9.0, 11.9, 7.5])
    lat = np.array([0.0, 45.0, 60.0, 83.0])
    x, y = t.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_lcc_lambert93_origin():
    l93 = get_proj4_literal(2154)
    t = Transformer.from_proj4(LL, l93)
    x, y = t.transform(3.0, 46.5)
    # sub-mm: scalar (setup) vs numpy (transform) float paths differ ~1e-11 rel
    assert abs(float(x) - 700000.0) < 1e-3
    assert abs(float(y) - 6600000.0) < 1e-3
    inv = Transformer.from_proj4(l93, LL)
    lon = np.array([(-1.0), 2.5, 7.0])
    lat = np.array([43.2, 46.5, 49.9])
    x, y = t.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_normalize_bbox_reference_case():
    # reference test_normalize_bbox (tests/test_generate.py:534-535)
    assert normalize_bbox([6, 2, 1, 5]) == [1.0, 2.0, 6.0, 5.0]


def test_transform_bbox_normalizes_reversed_input():
    # reference test_transform_bbox_normalizes_reversed_input
    src = "+proj=longlat +datum=WGS84 +no_defs"
    dst = (
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +k=1 +units=m +no_defs"
    )
    out = transform_bbox(src, dst, [8.0, 47.0, 7.5, 46.5])
    assert out[0] < out[2] and out[1] < out[3]


def test_transform_bbox_same_crs_shortcut():
    out = transform_bbox(LV03, LV03, [600000, 200000, 530000, 150000])
    assert out == [530000.0, 150000.0, 600000.0, 200000.0]


def test_transform_bbox_swiss_to_wgs84_contains_points():
    out = transform_bbox(LV03, LL, [550000, 150000, 650000, 250000])
    # the box straddles Bern: lon ~7.44, lat ~46.95 inside
    assert out[0] < 7.44 < out[2]
    assert out[1] < 46.95 < out[3]
    # and inverse bbox covers the original
    back = transform_bbox(LL, LV03, out)
    assert back[0] <= 550000 + 1 and back[2] >= 650000 - 1
    assert back[1] <= 150000 + 1 and back[3] >= 250000 - 1


def test_transform_geometry_polygon():
    from tilecloud_chain_ray.geom import Point, Polygon

    t = Transformer.from_proj4(LV03, LV95)
    poly = Polygon([(530000, 150000), (600000, 150000), (600000, 200000), (530000, 150000)])
    out = transform_geometry(poly, t)
    assert out.bounds == pytest.approx((2530000, 1150000, 2600000, 1200000))
    p = transform_geometry(Point(600000, 200000), t)
    assert (p.x, p.y) == pytest.approx((2600000, 1200000))


# --- NTv2 grid shifts (tilecloud_chain_ray/ntv2.py) ---------------------


def _linear_grid(scale_lat=0.5, scale_lon=1.0):
    """Synthetic subgrid over lat 45..48N, lon 5..11E with shifts that
    vary linearly: bilinear interpolation reproduces a linear field
    EXACTLY, so off-node checks are closed-form."""
    import numpy as np

    from tilecloud_chain_ray.ntv2 import SubGrid

    s_lat, n_lat = 45 * 3600.0, 48 * 3600.0
    # NTv2 longitudes positive WEST: 5..11E = -11*3600..-5*3600 west
    e_long, w_long = -11 * 3600.0, -5 * 3600.0
    inc = 1800.0  # 0.5 degree
    nlat = int((n_lat - s_lat) / inc) + 1
    nlon = int((w_long - e_long) / inc) + 1
    lat_nodes = s_lat + inc * np.arange(nlat)
    lon_nodes = e_long + inc * np.arange(nlon)
    glat, glon = np.meshgrid(lat_nodes, lon_nodes, indexing="ij")
    lat_shift = scale_lat * (glat - s_lat) / 3600.0  # 0..1.5 arcsec
    lon_shift = scale_lon * (glon - e_long) / 3600.0
    return SubGrid("TESTGRID", "NONE", s_lat, n_lat, e_long, w_long,
                   inc, inc, lat_shift, lon_shift)


def test_ntv2_gsb_roundtrip_and_bilinear():
    import numpy as np

    from tilecloud_chain_ray.ntv2 import ARCSEC, GridShift, read_gsb, write_gsb

    sg = _linear_grid()
    grid = read_gsb(write_gsb([sg]))
    assert len(grid.subgrids) == 1
    g2 = grid.subgrids[0]
    np.testing.assert_allclose(g2.lat_shift, sg.lat_shift, atol=1e-4)  # f32 nodes
    # off-node points: linear field -> exact bilinear value
    lon = np.deg2rad(np.array([6.123, 9.876, 7.5]))
    lat = np.deg2rad(np.array([45.678, 47.201, 46.0]))
    lon2, lat2 = grid.shift(lon, lat)
    want_dlat = 0.5 * (np.rad2deg(lat) - 45.0)  # arcsec
    want_dlon_w = 1.0 * (-np.rad2deg(lon) + 11.0)
    np.testing.assert_allclose((lat2 - lat) / ARCSEC, want_dlat, atol=2e-3)
    np.testing.assert_allclose(-(lon2 - lon) / ARCSEC, want_dlon_w, atol=2e-3)
    # inverse round-trips to ~1e-11 rad
    lon3, lat3 = grid.shift(lon2, lat2, inverse=True)
    np.testing.assert_allclose(lon3, lon, atol=1e-11)
    np.testing.assert_allclose(lat3, lat, atol=1e-11)
    # points outside every subgrid pass through unchanged
    out_lon = np.deg2rad(np.array([0.0]))
    out_lat = np.deg2rad(np.array([10.0]))
    same = grid.shift(out_lon, out_lat)
    np.testing.assert_allclose(same[0], out_lon)
    np.testing.assert_allclose(same[1], out_lat)
    assert isinstance(grid, GridShift)


def test_ntv2_densest_subgrid_wins():
    import numpy as np

    from tilecloud_chain_ray.ntv2 import GridShift, SubGrid

    coarse = _linear_grid()
    # finer child over 46..47N, 7..9E with a CONSTANT 2" lat shift
    s_lat, n_lat = 46 * 3600.0, 47 * 3600.0
    e_long, w_long = -9 * 3600.0, -7 * 3600.0
    inc = 900.0
    nlat = int((n_lat - s_lat) / inc) + 1
    nlon = int((w_long - e_long) / inc) + 1
    child = SubGrid("CHILD", "TESTGRID", s_lat, n_lat, e_long, w_long, inc, inc,
                    np.full((nlat, nlon), 2.0), np.zeros((nlat, nlon)))
    grid = GridShift([coarse, child])
    from tilecloud_chain_ray.ntv2 import ARCSEC

    lon = np.deg2rad(np.array([8.0, 10.0]))  # inside child, outside child
    lat = np.deg2rad(np.array([46.5, 47.5]))
    _, lat2 = grid.shift(lon, lat)
    dlat = (lat2 - lat) / ARCSEC
    assert abs(dlat[0] - 2.0) < 1e-6  # child wins
    assert abs(dlat[1] - 0.5 * 2.5) < 1e-3  # coarse linear field


def test_transformer_nadgrids_applies_grid():
    import numpy as np

    from tilecloud_chain_ray.ntv2 import ARCSEC, GridShift, register_grid, write_gsb
    from tilecloud_chain_ray.proj import Transformer

    register_grid("test_shift.gsb", write_gsb([_linear_grid()]))
    t = Transformer.from_proj4(
        "+proj=longlat +ellps=WGS84 +nadgrids=test_shift.gsb +no_defs",
        "+proj=longlat +ellps=WGS84 +towgs84=0,0,0 +no_defs",
    )
    lon, lat = t.transform(np.array([7.5]), np.array([46.0]))
    # expected: lat += 0.5"*(46-45), lon(east) -= 1"*(11-7.5)
    assert abs(lat[0] - (46.0 + 0.5 * 1.0 / 3600.0)) < 1e-7
    assert abs(lon[0] - (7.5 - 3.5 / 3600.0)) < 1e-7
    # and through a projected CRS the shift survives the pipeline:
    # same grid into swiss LV95 vs plain WGS84->LV95 differs by ~30 m
    t_grid = Transformer.from_proj4(
        "+proj=longlat +ellps=WGS84 +nadgrids=test_shift.gsb +no_defs",
        LV95,
    )
    t_plain = Transformer.from_proj4("+proj=longlat +ellps=WGS84 +towgs84=0,0,0 +no_defs", LV95)
    xg, yg = t_grid.transform(np.array([7.44]), np.array([46.95]))
    xp, yp = t_plain.transform(np.array([7.44]), np.array([46.95]))
    assert 10 < abs(float(xg - xp)) < 200  # ~3.56" west shift ~ -75 m
    assert 1 < abs(float(yg - yp)) < 100   # ~0.98" lat shift ~ +30 m
