"""Tile-coordinate enumeration: dense bounding-pyramid and sparse
geometry-driven metatile walks.

Pure-Python/numpy core (no Ray) so it can run either on the driver (tiny
per-zoom interval lists) or inside ``map_batches`` workers (distributed
row-band walk).  The Ray Dataset wrappers live in
``tilecloud_chain_ray.sources.enumerate``.

Reference semantics reproduced:

* dense bounds from per-zoom geometry envelopes (+ px_buffer*res,
  clamped to the grid extent) —
  ``/root/reference/tilecloud_chain/__init__.py:2117-2161``
* metatile promotion of a dense pyramid (meta coords are multiples of
  ``n``, covering the bounds) — tilecloud ``BoundingPyramid
  .metatilecoords`` as exercised by ``tests/test_generate.py:1281-1316``
* sparse walk: buffer geometry by ``px_buffer*res`` (quad_segs=1), walk
  y row-bands top-down from ``bbox[3]``, clip, merge per-leaf x index
  intervals (adjacent intervals coalesce) —
  ``__init__.py:438-626``, golden ``tests/test_generate.py:252-276``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable, Iterator, Mapping

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.geom import Geometry, box_intersects, buffer_geometry, clip_to_box
from tilecloud_chain_ray.geom.geometry import iter_leaves


@dataclass(frozen=True)
class TileCoord:
    """z/x/y address with metatile span n (n=1: plain tile).

    Equivalent of tilecloud's TileCoord as used throughout the reference
    (parse: ``__init__.py:2735-2754``).  ``x`` = column from the left,
    ``y`` = row from the top (WMTS convention).
    """

    z: int
    x: int
    y: int
    n: int = 1

    def __str__(self) -> str:
        if self.n == 1:
            return f"{self.z}/{self.x}/{self.y}"
        return f"{self.z}/{self.x}/{self.y}:+{self.n}/+{self.n}"

    def children(self) -> Iterator["TileCoord"]:
        """The n*n child tiles of a metatile (row-major)."""
        for dy in range(self.n):
            for dx in range(self.n):
                yield TileCoord(self.z, self.x + dx, self.y + dy, 1)


def parse_tilecoord(text: str) -> TileCoord:
    """Parse ``"z/x/y"`` or ``"z/x/y:+n/+n"`` (``__init__.py:2735-2754``)."""
    parts = text.split(":")
    coords = [int(v) for v in parts[0].split("/")]
    if len(coords) != 3:
        raise ValueError("Wrong number of coordinates")
    z, x, y = coords
    if len(parts) == 1:
        return TileCoord(z, x, y)
    if len(parts) == 2:
        meta = parts[1].split("/")
        if len(meta) != 2:
            raise ValueError("No one '/' in meta coordinates")
        return TileCoord(z, x, y, int(meta[0].lstrip("+")))
    raise ValueError("More than one ':' in the tilecoord")


@dataclass(frozen=True)
class CoordInterval:
    """One enumeration unit: a run of x indices on one row of one zoom.

    ``x_start``/``x_end`` inclusive, in *tile* units already multiplied
    by ``n`` for metatiles (i.e. the TileCoord x of each metatile is
    ``x_start + i*n``).  This is the Dataset row type — a z=14 pyramid
    of 10^8 metatiles stays ~10^4 interval rows.
    """

    z: int
    y: int  # tile units (row * n for metatiles)
    x_start: int  # tile units, inclusive
    x_end: int  # tile units, inclusive
    n: int

    def count(self) -> int:
        return (self.x_end - self.x_start) // self.n + 1

    def coords(self) -> Iterator[TileCoord]:
        for x in range(self.x_start, self.x_end + 1, self.n):
            yield TileCoord(self.z, x, self.y, self.n)


# ---------------------------------------------------------------------------
# dense enumeration
# ---------------------------------------------------------------------------


def dense_zoom_bounds(
    layer: Layer,
    geoms: Mapping[int, Geometry],
    zooms: Iterable[int],
) -> dict[int, tuple[int, int, int, int]]:
    """Per-zoom (xmin, xmax, ymin, ymax) tile-index bounds (inclusive).

    ``_get_default_grid_tilecoords`` (``__init__.py:2117-2161``): the
    geometry envelope grown by ``px_buffer * resolution`` map units,
    clamped to the grid extent, floor-indexed at both corners.
    """
    grid = layer.grid
    bounds: dict[int, tuple[int, int, int, int]] = {}
    for zoom in zooms:
        geom = geoms.get(zoom)
        if geom is None or geom.is_empty:
            continue
        minx, miny, maxx, maxy = geom.bounds
        if math.isnan(minx):
            continue
        m_buffer = layer.px_buffer * grid.resolutions[zoom]
        minx -= m_buffer
        miny -= m_buffer
        maxx += m_buffer
        maxy += m_buffer
        x0, y0 = grid.tile_index(zoom, max(minx, grid.bbox[0]), max(miny, grid.bbox[1]))
        x1, y1 = grid.tile_index(zoom, min(maxx, grid.bbox[2]), min(maxy, grid.bbox[3]))
        bounds[zoom] = (min(x0, x1), max(x0, x1), min(y0, y1), max(y0, y1))
    return bounds


def dense_intervals(
    layer: Layer,
    geoms: Mapping[int, Geometry],
    zooms: Iterable[int],
) -> Iterator[CoordInterval]:
    """Dense enumeration as interval rows; metatile-promoted if meta."""
    zoom_bounds = dense_zoom_bounds(layer, geoms, zooms)
    n = layer.meta_size if layer.meta else 1
    for zoom, (xmin, xmax, ymin, ymax) in sorted(zoom_bounds.items()):
        x_start = (xmin // n) * n
        y_start = (ymin // n) * n
        for y in range(y_start, ymax + 1, n):
            yield CoordInterval(zoom, y, x_start, (xmax // n) * n, n)


# ---------------------------------------------------------------------------
# sparse enumeration
# ---------------------------------------------------------------------------


def _index_range(
    bounds_min: float, bounds_max: float, origin: float, span: float, max_index: int
) -> tuple[int, int] | None:
    """x variant of ``_bounds_to_index_range`` (``__init__.py:457-474``)."""
    if bounds_min > bounds_max:
        bounds_min, bounds_max = bounds_max, bounds_min
    start = math.floor((bounds_min - origin) / span)
    end = math.ceil((bounds_max - origin) / span) - 1
    start = max(0, min(max_index, start))
    end = max(0, min(max_index, end))
    if start > end:
        return None
    return start, end


def _y_index_range(
    bounds_min: float, bounds_max: float, origin_top: float, span: float, max_index: int
) -> tuple[int, int] | None:
    """Top-down y variant (``__init__.py:475-491``)."""
    if bounds_min > bounds_max:
        bounds_min, bounds_max = bounds_max, bounds_min
    start = math.floor((origin_top - bounds_max) / span)
    end = math.ceil((origin_top - bounds_min) / span) - 1
    start = max(0, min(max_index, start))
    end = max(0, min(max_index, end))
    if start > end:
        return None
    return start, end


def merge_index_intervals(intervals: Iterable[tuple[int, int]]) -> list[tuple[int, int]]:
    """Merge overlapping/adjacent index intervals (``__init__.py:493-505``)."""
    ordered = sorted(intervals)
    if not ordered:
        return []
    merged = [ordered[0]]
    for start, end in ordered[1:]:
        prev_start, prev_end = merged[-1]
        if start <= prev_end + 1:
            merged[-1] = (prev_start, max(prev_end, end))
        else:
            merged.append((start, end))
    return merged


def sparse_row_intervals(
    layer: Layer,
    geom: Geometry,
    zoom: int,
    rows: Iterable[int] | None = None,
) -> Iterator[CoordInterval]:
    """Sparse metatile intervals for one zoom (optionally a row subset).

    The row-subset parameter is what makes this distributable: a Ray
    stage can fan the (zoom, row) space out over workers, each holding
    the (broadcast) geometry and walking only its rows.
    """
    grid = layer.grid
    n = layer.meta_size if layer.meta else 1
    resolution = grid.resolutions[zoom]
    span = grid.span(zoom, n)
    width, height = grid.matrix_dims(zoom, n)
    max_x, max_y = width - 1, height - 1

    buffered = geom
    m_buffer = layer.px_buffer * resolution
    if m_buffer != 0:
        buffered = buffer_geometry(buffered, m_buffer)
    if buffered.is_empty:
        return
    gminx, gminy, gmaxx, gmaxy = buffered.bounds
    if math.isnan(gminx):
        return

    if rows is None:
        row_range = _y_index_range(gminy, gmaxy, grid.bbox[3], span, max_y)
        if row_range is None:
            return
        rows = range(row_range[0], row_range[1] + 1)

    for row in rows:
        band_max_y = grid.bbox[3] - row * span
        band_min_y = band_max_y - span
        band = (grid.bbox[0], band_min_y, grid.bbox[2], band_max_y)
        row_geom = clip_to_box(buffered, band)
        if row_geom.is_empty:
            continue
        intervals = []
        for leaf in iter_leaves(row_geom):
            if leaf.is_empty:
                continue
            lminx, _, lmaxx, _ = leaf.bounds
            if math.isnan(lminx):
                continue
            interval = _index_range(lminx, lmaxx, grid.bbox[0], span, max_x)
            if interval is not None:
                intervals.append(interval)
        for start, end in merge_index_intervals(intervals):
            yield CoordInterval(zoom, row * n, start * n, end * n, n)


def sparse_intervals(
    layer: Layer,
    geoms: Mapping[int, Geometry],
    zooms: Iterable[int],
) -> Iterator[CoordInterval]:
    for zoom in zooms:
        geom = geoms.get(zoom)
        if geom is None:
            continue
        yield from sparse_row_intervals(layer, geom, zoom)


def sparse_metatilecoords(
    layer: Layer, geoms: Mapping[int, Geometry], zooms: Iterable[int]
) -> Iterator[TileCoord]:
    """Driver-side full sparse walk (parity with ``metatilecoords``)."""
    for interval in sparse_intervals(layer, geoms, zooms):
        yield from interval.coords()


def near_bbox(
    layer: Layer,
    position: tuple[float, float],
    zoom: int,
    nb_tiles: int,
) -> tuple[float, float, float, float]:
    """``--near X Y`` window: a square of ~``nb_tiles`` tiles of
    metatiles centred on the position (``/root/reference/
    tilecloud_chain/__init__.py:1707-1742``): distances converted to
    metatile units, ``ceil(sqrt(nb_tiles / meta_size^2))`` metatiles a
    side, origin rounded to the nearest metatile."""
    grid = layer.grid
    resolution = grid.resolutions[zoom]
    mt_to_m = layer.meta_size * grid.tile_size * resolution
    mt_x = (position[0] - grid.bbox[0]) / mt_to_m
    mt_y = (position[1] - grid.bbox[1]) / mt_to_m
    nb_mt = nb_tiles / (layer.meta_size**2)
    nb_sqrt = math.ceil(math.sqrt(nb_mt))
    ox = round(mt_x - nb_sqrt / 2)
    oy = round(mt_y - nb_sqrt / 2)
    return (
        grid.bbox[0] + ox * mt_to_m,
        grid.bbox[1] + oy * mt_to_m,
        grid.bbox[0] + (ox + nb_sqrt) * mt_to_m,
        grid.bbox[1] + (oy + nb_sqrt) * mt_to_m,
    )


# ---------------------------------------------------------------------------
# geometry filter predicate (per-coord semantics; vectorized stage wraps it)
# ---------------------------------------------------------------------------


def coord_passes_geom_filter(
    layer: Layer, geoms: Mapping[int, Geometry], coord: TileCoord
) -> bool:
    """``IntersectGeometryFilter.filter_tilecoord``
    (``__init__.py:2643-2674``), including the reference's buffer quirk:
    the border passed to ``extent`` is ``resolution * px_buffer`` *in
    pixel units*, i.e. an effective map buffer of ``px_buffer * res**2``
    (verified against the 10-metatile golden,
    ``tests/test_generate.py:1281-1316``).
    """
    if not layer.geom_filter:
        return True
    geom = geoms.get(coord.z)
    if geom is None:
        return False
    border_px = layer.grid.resolutions[coord.z] * layer.filter_px_buffer()
    extent = layer.grid.extent(coord.z, coord.x, coord.y, coord.n, border_px)
    return box_intersects(geom, (extent[0], extent[1], extent[2], extent[3]))
