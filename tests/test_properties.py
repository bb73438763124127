"""Property-based tests (hypothesis) for the math core: grid
arithmetic, Morton cells, interval merging, geometry predicates."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.coords import merge_index_intervals, sparse_metatilecoords
from tilecloud_chain_ray.functions.cells import (
    cell_decode,
    cell_id,
    cell_parent,
    morton_decode,
    morton_encode,
)
from tilecloud_chain_ray.functions.hashing import micro_from_ids, micro_tile
from tilecloud_chain_ray.geom import MultiPoint, Point, box, box_intersects
from tilecloud_chain_ray.geom.ops import box_intersects_many, clip_to_box
from tilecloud_chain_ray.grid import SWISSGRID_5


@given(
    st.integers(0, 4),
    st.floats(420000, 899999, allow_nan=False),
    st.floats(30001, 350000, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_tile_index_extent_roundtrip(z, mx, my):
    """The tile containing a point has an extent containing the point."""
    x, y = SWISSGRID_5.tile_index(z, mx, my)
    minx, miny, maxx, maxy = SWISSGRID_5.extent(z, x, y)
    assert minx <= mx <= maxx + 1e-6
    assert miny - 1e-6 <= my <= maxy + 1e-6


@given(st.integers(0, 4), st.integers(0, 100), st.integers(0, 100))
@settings(max_examples=100, deadline=None)
def test_extent_tiles_adjacent(z, x, y):
    """Neighboring tile extents share edges exactly (no gaps/overlap)."""
    e1 = SWISSGRID_5.extent(z, x, y)
    e2 = SWISSGRID_5.extent(z, x + 1, y)
    e3 = SWISSGRID_5.extent(z, x, y + 1)
    assert e1[2] == e2[0]  # right edge == next left edge
    assert e1[1] == e3[3]  # bottom edge == next top edge


@given(st.integers(0, 2**29 - 1), st.integers(0, 2**29 - 1))
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip_prop(cx, cy):
    code = morton_encode(np.array([cx], np.uint64), np.array([cy], np.uint64))
    dx, dy = morton_decode(code)
    assert int(dx[0]) == cx and int(dy[0]) == cy


@given(st.integers(1, 15), st.integers(0, 10))
@settings(max_examples=100, deadline=None)
def test_cell_parent_containment(res, seed):
    rng = np.random.default_rng(seed)
    cx = rng.integers(0, 2**res, 10).astype(np.uint64)
    cy = rng.integers(0, 2**res, 10).astype(np.uint64)
    cells = cell_id(cx, cy, res)
    for parent_res in range(res + 1):
        parents = cell_parent(cells, parent_res)
        pres, pcx, pcy = cell_decode(parents)
        assert (pcx == (cx >> np.uint64(res - parent_res)).astype(np.int64)).all()


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 20)), max_size=20))
@settings(max_examples=200, deadline=None)
def test_merge_intervals_properties(raw):
    intervals = [(a, a + w) for a, w in raw]
    merged = merge_index_intervals(intervals)
    # sorted, disjoint with gaps > 1
    for (a1, b1), (a2, b2) in zip(merged, merged[1:]):
        assert b1 + 1 < a2
    # same covered index set
    covered = {i for a, b in intervals for i in range(a, b + 1)}
    covered_m = {i for a, b in merged for i in range(a, b + 1)}
    assert covered == covered_m


@given(
    st.floats(0, 900, allow_nan=False),
    st.floats(0, 900, allow_nan=False),
    st.floats(1, 100, allow_nan=False),
    st.floats(1, 100, allow_nan=False),
    st.integers(0, 6),
)
@settings(max_examples=200, deadline=None)
def test_box_intersects_many_matches_scalar_prop(bx, by, w, h, gi)  :
    geoms = [
        Point(450, 450),
        MultiPoint((Point(100, 100), Point(800, 800))),
        box(300, 300, 600, 600),
        box(0, 0, 50, 50),
        Point(bx, by),
        box(bx, by, bx + w, by + h),
        box(200, 0, 220, 900),
    ]
    geom = geoms[gi]
    qbox = np.array([[bx, by, bx + w, by + h]])
    vec = box_intersects_many(geom, qbox)[0]
    scalar = box_intersects(geom, (bx, by, bx + w, by + h))
    assert vec == scalar


@given(st.integers(1, 10**7))
@settings(max_examples=200, deadline=None)
def test_micro_tile_in_range(doc_id):
    ux, uy = micro_from_ids(np.array([doc_id], np.int64))
    for w, h in [(19, 13), (375, 250), (2**14, 2**14)]:
        tx, ty = micro_tile(ux, uy, w, h)
        assert 0 <= tx[0] < w and 0 <= ty[0] < h


@given(st.floats(0.5, 3, allow_nan=False))
@settings(max_examples=30, deadline=None)
def test_sparse_buffer_monotone(buffer_px):
    """Sparse enumeration with a px_buffer is a superset of without."""
    pts = MultiPoint((Point(600000, 200000), Point(530000, 150000)))
    base = Layer(name="p", grid=SWISSGRID_5, geometries=(pts,), meta=True, meta_size=8)
    buffered = Layer(
        name="p", grid=SWISSGRID_5, geometries=(pts,), meta=True, meta_size=8,
        px_buffer=buffer_px * 100,
    )
    g0 = base.geoms_per_zoom()
    g1 = buffered.geoms_per_zoom()
    s0 = set(sparse_metatilecoords(base, g0, [0, 1, 2]))
    s1 = set(sparse_metatilecoords(buffered, g1, [0, 1, 2]))
    assert s0 <= s1


@given(
    st.floats(100, 800, allow_nan=False),
    st.floats(100, 800, allow_nan=False),
    st.floats(10, 200, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_clip_bounds_within_box(cx, cy, half):
    poly = box(cx - half, cy - half, cx + half, cy + half)
    clipped = clip_to_box(poly, (300.0, 300.0, 600.0, 600.0))
    if not clipped.is_empty:
        b = clipped.bounds
        assert b[0] >= 300 - 1e-9 and b[2] <= 600 + 1e-9
        assert b[1] >= 300 - 1e-9 and b[3] <= 600 + 1e-9


# --- proj engine properties -------------------------------------------------

from tilecloud_chain_ray.proj import Transformer, get_proj4_literal  # noqa: E402

_LL = get_proj4_literal(4326)
_PAIRS = [
    (get_proj4_literal(3857), (-179.0, 179.0), (-80.0, 80.0)),
    (get_proj4_literal(21781), (5.5, 10.5), (45.5, 48.0)),
    (get_proj4_literal(2056), (5.5, 10.5), (45.5, 48.0)),
    (get_proj4_literal(25832), (6.0, 12.0), (-80.0, 84.0)),
    (get_proj4_literal(2154), (-4.5, 9.5), (41.0, 51.0)),
]


@given(st.integers(0, len(_PAIRS) - 1), st.floats(0, 1), st.floats(0, 1))
@settings(max_examples=150, deadline=None)
def test_proj_roundtrip_within_domain(idx, fx, fy):
    """inverse(forward(p)) == p to sub-micro-degree inside each CRS's
    domain of validity."""
    lit, (lo_x, hi_x), (lo_y, hi_y) = _PAIRS[idx]
    lon = lo_x + fx * (hi_x - lo_x)
    lat = lo_y + fy * (hi_y - lo_y)
    fwd = Transformer.from_proj4(_LL, lit)
    inv = Transformer.from_proj4(lit, _LL)
    x, y = fwd.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    # 2e-8 deg ~ 2 mm: a 2D datum shift assumes h=0 on EACH side of the
    # Helmert leg (as pyproj does for 2D transforms), which leaves a
    # ~1 mm roundtrip asymmetry wherever towgs84 is non-zero
    assert abs(float(lon2) - lon) < 2e-8
    assert abs(float(lat2) - lat) < 2e-8


@given(st.floats(5.5, 10.5), st.floats(45.5, 48.0))
@settings(max_examples=100, deadline=None)
def test_proj_lv03_lv95_consistency(lon, lat):
    """Going to LV03 vs LV95 from the same WGS84 point differs by the
    exact false-origin offset."""
    t03 = Transformer.from_proj4(_LL, get_proj4_literal(21781))
    t95 = Transformer.from_proj4(_LL, get_proj4_literal(2056))
    x3, y3 = t03.transform(lon, lat)
    x5, y5 = t95.transform(lon, lat)
    assert abs((float(x5) - float(x3)) - 2_000_000.0) < 1e-6
    assert abs((float(y5) - float(y3)) - 1_000_000.0) < 1e-6


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    budget=st.integers(min_value=1, max_value=5_000),
    bucket_size=st.sampled_from([1, 3, 64, 1 << 20]),
)
def test_pack_shards_property(ray_session, weights, budget, bucket_size):
    """pack_shards == sequential exclusive-cumsum // budget for ANY
    weights (incl. zeros and weights far above the budget), any bucket
    size, unordered input."""
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from tilecloud_chain_ray.stages.scan import pack_shards

    n = len(weights)
    rng = np.random.default_rng(1)
    order = rng.permutation(n)
    tbl = pa.Table.from_pydict(
        {
            "g": pa.array(["x"] * n),
            "o": pa.array(np.asarray(order, dtype=np.int64)),
            "w": pa.array(np.asarray(weights, dtype=np.int64)[order]),
        }
    )
    ds = _ray.data.from_arrow(tbl).repartition(min(4, n))
    got = (
        pack_shards(ds, "g", "o", "w", budget=budget, bucket_size=bucket_size)
        .to_pandas()
        .sort_values("o")
    )
    w_sorted = got["w"].to_numpy()
    excl = np.concatenate(([0], np.cumsum(w_sorted)[:-1]))
    assert (got["shard"].to_numpy() == excl // budget).all()
