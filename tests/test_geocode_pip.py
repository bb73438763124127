"""Geocode, cell index, PIP join: determinism + oracle-arithmetic parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from tilecloud_chain_ray.functions.cells import (
    cell_decode,
    cell_for_micro,
    cell_id,
    cell_parent,
    grid_disk,
    morton_decode,
    morton_encode,
)
from tilecloud_chain_ray.functions.hashing import (
    micro_from_ids,
    micro_from_strings,
    micro_tile,
    micro_to_map,
)
from tilecloud_chain_ray.geom import box
from tilecloud_chain_ray.stages.geocode import make_geocoder
from tilecloud_chain_ray.stages.pip_join import PIPJoin

BBOX = (420000.0, 30000.0, 900000.0, 350000.0)


def test_morton_roundtrip():
    rng = np.random.default_rng(1)
    cx = rng.integers(0, 2**29, 1000).astype(np.uint64)
    cy = rng.integers(0, 2**29, 1000).astype(np.uint64)
    code = morton_encode(cx, cy)
    dx, dy = morton_decode(code)
    assert (dx == cx).all() and (dy == cy).all()


def test_cell_roundtrip_and_parent():
    rng = np.random.default_rng(2)
    cx = rng.integers(0, 2**10, 500).astype(np.uint64)
    cy = rng.integers(0, 2**10, 500).astype(np.uint64)
    cells = cell_id(cx, cy, 10)
    res, dx, dy = cell_decode(cells)
    assert (res == 10).all() and (dx == cx.astype(np.int64)).all()
    parents = cell_parent(cells, 7)
    pres, pcx, pcy = cell_decode(parents)
    assert (pres == 7).all()
    assert (pcx == (cx >> np.uint64(3)).astype(np.int64)).all()


def test_grid_disk():
    c = cell_id(np.array([5], dtype=np.uint64), np.array([5], dtype=np.uint64), 4)[0]
    disk = grid_disk(int(c), 1)
    assert len(disk) == 9
    res, cx, cy = cell_decode(disk)
    assert set(cx.tolist()) == {4, 5, 6}
    # clamped at the matrix edge
    c0 = cell_id(np.array([0], dtype=np.uint64), np.array([0], dtype=np.uint64), 4)[0]
    assert len(grid_disk(int(c0), 1)) == 4


def test_micro_from_ids_matches_duckdb():
    ids = np.arange(0, 5000, dtype=np.int64)
    ux, uy = micro_from_ids(ids)
    got = duckdb.sql(
        "SELECT (i * 2654435761) % 4294967296 AS ux,"
        " (i * 2246822519 + 1013904223) % 4294967296 AS uy "
        "FROM range(0, 5000) t(i) ORDER BY i"
    ).fetchnumpy()
    assert (got["ux"].astype(np.uint64) == ux).all()
    assert (got["uy"].astype(np.uint64) == uy).all()


def test_micro_tile_matches_duckdb():
    ids = np.arange(0, 5000, dtype=np.int64)
    ux, uy = micro_from_ids(ids)
    tx, ty = micro_tile(ux, uy, 19, 13)
    got = duckdb.sql(
        "SELECT ((i * 2654435761) % 4294967296) * 19 // 4294967296 AS tx,"
        " ((i * 2246822519 + 1013904223) % 4294967296) * 13 // 4294967296 AS ty "
        "FROM range(0, 5000) t(i) ORDER BY i"
    ).fetchnumpy()
    assert (got["tx"] == tx).all() and (got["ty"] == ty).all()
    assert tx.min() >= 0 and tx.max() < 19 and ty.max() < 13


def test_micro_strings_deterministic():
    urls = [f"https://site{i}.example/p/{i}" for i in range(100)]
    a = micro_from_strings(urls)
    b = micro_from_strings(pa.array(urls))
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_geocoder_appends_without_touching_text():
    texts = ["hello wörld", "äöü", "plain"]
    batch = pa.Table.from_pydict({"doc_id": [1, 2, 3], "text": texts})
    out = make_geocoder(BBOX, "doc_id", cell_res=10)(batch)
    assert out["text"].to_pylist() == texts
    # text buffer is the same object (zero-copy append)
    assert (
        out.column("text").chunk(0).buffers()[2].address
        == batch.column("text").chunk(0).buffers()[2].address
    )
    assert set(out.schema.names) >= {"ux", "uy", "x", "y", "cell"}
    x = out["x"].to_numpy()
    y = out["y"].to_numpy()
    assert (x >= BBOX[0]).all() and (x <= BBOX[2]).all()
    assert (y >= BBOX[1]).all() and (y <= BBOX[3]).all()


def test_cell_consistent_with_micro():
    ids = np.arange(0, 1000, dtype=np.int64)
    ux, uy = micro_from_ids(ids)
    cells = cell_for_micro(ux, uy, 8)
    res, cx, cy = cell_decode(cells)
    assert (cx == (ux >> np.uint64(24)).astype(np.int64)).all()


def test_pip_join_modes():
    # two disjoint boxes + points hashed into the bbox
    layers = [
        ("west", box(420000, 30000, 660000, 350000)),
        ("east", box(660000, 30000, 900000, 350000)),
        ("north", box(420000, 190000, 900000, 350000)),  # overlaps both
    ]
    ids = np.arange(0, 2000, dtype=np.int64)
    ux, uy = micro_from_ids(ids)
    x, y = micro_to_map(ux, uy, BBOX)
    batch = pa.Table.from_pydict({"doc_id": ids, "x": x, "y": y})

    left = PIPJoin(layers, mode="left")(batch)
    assert left.num_rows == 2000
    names = left["layer"].to_pylist()
    expected_first = np.where(x < 660000, "west", "east")
    assert names == expected_first.tolist()  # west/east listed before north

    semi = PIPJoin(layers[:2], mode="semi")(batch)
    assert semi.num_rows == 2000  # boxes tile the bbox

    inner = PIPJoin(layers, mode="inner")(batch)
    expected_pairs = 2000 + int((y > 190000).sum())
    assert inner.num_rows == expected_pairs


def test_pip_join_many_polygons():
    """STRtree bucket path with 5k polygons stays correct (vs direct
    PIP check on a sample) and fast."""
    import time

    rng = np.random.default_rng(21)
    n_polys = 5000
    cx = rng.uniform(430000, 890000, n_polys)
    cy = rng.uniform(40000, 340000, n_polys)
    half = rng.uniform(500, 3000, n_polys)
    layers = [
        (f"p{i}", box(cx[i] - half[i], cy[i] - half[i], cx[i] + half[i], cy[i] + half[i]))
        for i in range(n_polys)
    ]
    ids = np.arange(0, 20000, dtype=np.int64)
    ux, uy = micro_from_ids(ids)
    x, y = micro_to_map(ux, uy, BBOX)
    batch = pa.Table.from_pydict({"doc_id": ids, "x": x, "y": y})

    t0 = time.perf_counter()
    join = PIPJoin(layers, mode="left")
    out = join(batch)
    dt = time.perf_counter() - t0
    assert dt < 20, f"PIP join too slow: {dt:.1f}s"

    names = out["layer"].to_pylist()
    # verify a sample against brute force (first matching polygon by index)
    for i in range(0, 20000, 1999):
        expected = None
        for name, poly in layers:
            b = poly.bounds
            if b[0] <= x[i] < b[2] and b[1] < y[i] <= b[3]:
                expected = name
                break
        # half-open boundary conventions differ at measure-zero edges;
        # random draws never hit them
        assert names[i] == expected, (i, names[i], expected)
