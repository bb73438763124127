"""Enumeration + geometry-filter conformance against reference goldens.

Golden sources (/root/reference/tilecloud_chain/tests/test_generate.py):
* sparse metatile walk on a toy grid — :252-276
* point_hash: 10 metatiles pass the geometry filter — :1281-1316
* point_px_buffer: 10 metatiles at zooms 0-2 — :1319-1344
* polygon dense z0: 12 tiles; CLI bbox: 2 tiles — :1384-1450
* empty bbox: nothing enumerated — :1187-1215
* master sparse seed: 6 metatile jobs — :1895-1930
* dense non-meta z0: 247 tiles — :1743-1774
"""

import pytest

from tilecloud_chain_ray.config import EmptyHash, Layer
from tilecloud_chain_ray.coords import (
    TileCoord,
    coord_passes_geom_filter,
    dense_intervals,
    merge_index_intervals,
    parse_tilecoord,
    sparse_metatilecoords,
)
from tilecloud_chain_ray.geom import MultiPoint, Point, Polygon, box
from tilecloud_chain_ray.grid import SWISSGRID_5, Grid

POINTS = MultiPoint((Point(600000, 200000), Point(530000, 150000)))
POLYGON = Polygon(
    [(600000, 200000), (600000, 150000), (530000, 150000), (530000, 200000), (600000, 200000)]
)


def make_point_layer(**kw) -> Layer:
    defaults = dict(
        name="point_hash",
        grid=SWISSGRID_5,
        geometries=(POINTS,),
        meta=True,
        meta_size=8,
        meta_buffer=128,
        min_resolution_seed=10,
    )
    defaults.update(kw)
    return Layer(**defaults)


def enumerate_filtered(layer, cli_bbox=None, zooms=None):
    zooms = zooms if zooms is not None else layer.seed_zooms()
    geoms = layer.geoms_per_zoom(cli_bbox=cli_bbox)
    coords = []
    for interval in dense_intervals(layer, geoms, zooms):
        coords.extend(interval.coords())
    return [c for c in coords if coord_passes_geom_filter(layer, geoms, c)]


def test_parse_tilecoord():
    assert parse_tilecoord("3/58/70") == TileCoord(3, 58, 70)
    assert parse_tilecoord("0/0/0:+8/+8") == TileCoord(0, 0, 0, 8)


def test_merge_index_intervals():
    # adjacent intervals coalesce (reference: __init__.py:493-505, golden :202-205)
    assert merge_index_intervals([(0, 1), (2, 3), (5, 6)]) == [(0, 3), (5, 6)]
    assert merge_index_intervals([(5, 6), (0, 1)]) == [(0, 1), (5, 6)]
    assert merge_index_intervals([]) == []


def test_sparse_toy_golden():
    # reference test_generate.py:252-276: 1px tiles, res [1], bbox 8x8,
    # three small boxes; expected metacoords (z, x, y, n=1):
    grid = Grid(name="toy", resolutions=(1,), bbox=(0, 0, 8, 8), tile_size=1)
    geom_boxes = (
        box(0.2, 4.2, 1.8, 4.8),
        box(3.2, 4.2, 3.8, 4.8),
        box(6.2, 2.2, 6.8, 2.8),
    )
    layer = Layer(name="toy", grid=grid, geometries=geom_boxes, meta=True, meta_size=1)
    geoms = layer.geoms_per_zoom()
    coords = list(sparse_metatilecoords(layer, geoms, [0]))
    assert coords == [
        TileCoord(0, 0, 3, 1),
        TileCoord(0, 1, 3, 1),
        TileCoord(0, 3, 3, 1),
        TileCoord(0, 6, 5, 1),
    ]


def test_point_hash_ten_metatiles():
    # dense enumeration + geometry filter => exactly 10 metatiles
    # (test_generate.py:1281-1316: "Nb generated metatiles: 10")
    layer = make_point_layer()
    kept = enumerate_filtered(layer)
    assert len(kept) == 10
    by_zoom = {}
    for c in kept:
        by_zoom.setdefault(c.z, []).append(c)
    assert {z: len(v) for z, v in by_zoom.items()} == {0: 1, 1: 1, 2: 6, 3: 2}
    # the 6 content metatiles (those whose unbuffered extent holds a point)
    # are the parents of the stored tiles
    content = [
        c
        for c in kept
        if any(
            TileCoord(c.z, x, y) in [TileCoord(c.z, cx, cy) for cx in range(c.x, c.x + 8) for cy in range(c.y, c.y + 8)]
            for x, y in [
                layer.grid.tile_index(c.z, 600000, 200000),
                layer.grid.tile_index(c.z, 530000, 150000),
            ]
        )
    ]
    assert len(content) == 6


def test_point_px_buffer_ten_metatiles():
    # point_px_buffer (px_buffer=100) zooms 0-2 => 10 metatiles
    # (test_generate.py:1319-1344)
    layer = make_point_layer(name="point_px_buffer", px_buffer=100, min_resolution_seed=None)
    kept = enumerate_filtered(layer, zooms=[0, 1, 2])
    assert len(kept) == 10
    by_zoom = {}
    for c in kept:
        by_zoom[c.z] = by_zoom.get(c.z, 0) + 1
    # reference pins only the total (10) and the 6 stored tiles; the
    # per-zoom split below is our enumeration's (px_buffer grows the z0
    # envelope across a metatile row boundary -> 2 metatiles at z0)
    assert by_zoom == {0: 2, 1: 2, 2: 6}


def test_polygon_dense_z0():
    # polygon layer (meta false): 12 tiles rows 5-7 x cols 4-7
    # (test_generate.py:1384-1406)
    layer = Layer(
        name="polygon", grid=SWISSGRID_5, geometries=(POLYGON,), meta=False
    )
    kept = enumerate_filtered(layer, zooms=[0])
    assert len(kept) == 12
    assert {(c.x, c.y) for c in kept} == {(x, y) for x in range(4, 8) for y in range(5, 8)}


def test_polygon_cli_bbox():
    # --bbox 550000 170000 560000 180000 => tiles (row 6, col 5), (row 7, col 5)
    # (test_generate.py:1408-1450)
    layer = Layer(name="polygon", grid=SWISSGRID_5, geometries=(POLYGON,), meta=False)
    kept = enumerate_filtered(layer, cli_bbox=(550000, 170000, 560000, 180000), zooms=[0])
    assert {(c.x, c.y) for c in kept} == {(5, 6), (5, 7)}


def test_empty_bbox():
    # --bbox 700000 250000 800000 300000 on point_hash => nothing
    # (test_generate.py:1187-1215)
    layer = make_point_layer()
    kept = enumerate_filtered(layer, cli_bbox=(700000, 250000, 800000, 300000))
    assert kept == []


def test_master_sparse_six_jobs():
    # master role seeds sparsely: 6 metatile jobs for layer point
    # (test_generate.py:1895-1930)
    layer = make_point_layer(name="point", empty_metatile=None, empty_tile=None)
    geoms = layer.geoms_per_zoom()
    coords = list(sparse_metatilecoords(layer, geoms, layer.seed_zooms()))
    assert len(coords) == 6
    assert {(c.z, c.x, c.y) for c in coords} == {
        (0, 0, 0),
        (1, 8, 8),
        (2, 32, 24),
        (2, 16, 32),
        (3, 64, 56),
        (3, 40, 72),
    }


def test_dense_no_meta_247():
    # point_hash_no_meta has no geoms: full z0 matrix 19x13 = 247 tiles
    # (test_generate.py:1743-1774)
    layer = Layer(name="point_hash_no_meta", grid=SWISSGRID_5, meta=False)
    kept = enumerate_filtered(layer, zooms=[0])
    assert len(kept) == 247


def test_sparse_matches_dense_filter_for_meta_layer():
    # sparse enumeration must be a subset of the filtered dense set and
    # must contain every content metatile
    layer = make_point_layer()
    geoms = layer.geoms_per_zoom()
    sparse = set(sparse_metatilecoords(layer, geoms, layer.seed_zooms()))
    dense_kept = set(enumerate_filtered(layer))
    assert sparse <= dense_kept


def test_near_bbox():
    from tilecloud_chain_ray.coords import near_bbox

    layer = make_point_layer()
    bbox = near_bbox(layer, (600000, 200000), zoom=2, nb_tiles=128)
    # 128 tiles / 64 per metatile = 2 metatiles -> sqrt ceil = 2 a side
    span_mt = 8 * 256 * 20
    assert bbox[2] - bbox[0] == pytest.approx(2 * span_mt)
    assert bbox[3] - bbox[1] == pytest.approx(2 * span_mt)
    # the window contains the position
    assert bbox[0] <= 600000 <= bbox[2]
    assert bbox[1] <= 200000 <= bbox[3]
    # --near skips geometry sources (reference __init__.py:1777: geoms
    # are not loaded when near is set) -> bbox-only layer: 2x2 metatiles
    bare = make_point_layer(geometries=())
    kept = enumerate_filtered(bare, cli_bbox=bbox, zooms=[2])
    # window edges sit exactly on metatile boundaries, and the floor
    # arithmetic includes the boundary tile (reference behavior): 3x3
    assert len(kept) == 9


def test_geom_filter_optout():
    layer = make_point_layer(geom_filter=False)
    zooms = [0]
    geoms = layer.geoms_per_zoom()
    coords = [
        c
        for interval in dense_intervals(layer, geoms, zooms)
        for c in interval.coords()
    ]
    kept = [c for c in coords if coord_passes_geom_filter(layer, geoms, c)]
    assert kept == coords  # geom_filter: false keeps everything


def test_layer_bbox_restricts_enumeration():
    """Layer-level bbox (like point_webp's bbox in test-nosns.yaml)
    clips the seeding geometry: only point2 remains inside."""
    layer = make_point_layer(bbox=(420000, 30000, 600000, 150000), min_resolution_seed=None)
    kept = enumerate_filtered(layer, zooms=[0])
    # point2 (530000, 150000) sits on the bbox top edge (included);
    # point1 (600000, 200000) is outside
    assert len(kept) == 1
    c = kept[0]
    px, py = SWISSGRID_5.tile_index(0, 530000, 150000)
    assert c.x <= px < c.x + 8 and c.y <= py < c.y + 8
