"""Geometry value types (immutable, numpy-backed coordinate arrays)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Sequence

import numpy as np

_EMPTY_BOUNDS = (float("nan"),) * 4


def _coords_array(coords) -> np.ndarray:
    arr = np.asarray(coords, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError(f"expected (n, 2) coordinates, got shape {arr.shape}")
    return arr


class Geometry:
    """Base class; subclasses define ``bounds`` and ``is_empty``."""

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        raise NotImplementedError

    @property
    def is_empty(self) -> bool:
        raise NotImplementedError

    @property
    def geom_type(self) -> str:
        return type(self).__name__


@dataclass(frozen=True)
class Point(Geometry):
    x: float
    y: float

    @property
    def bounds(self):
        return (self.x, self.y, self.x, self.y)

    @property
    def is_empty(self):
        return False


@dataclass(frozen=True)
class MultiPoint(Geometry):
    points: tuple[Point, ...]

    @property
    def geoms(self):
        return self.points

    @property
    def bounds(self):
        if not self.points:
            return _EMPTY_BOUNDS
        xs = [p.x for p in self.points]
        ys = [p.y for p in self.points]
        return (min(xs), min(ys), max(xs), max(ys))

    @property
    def is_empty(self):
        return not self.points


class LineString(Geometry):
    def __init__(self, coords: Sequence | np.ndarray) -> None:
        self.coords = _coords_array(coords)
        if len(self.coords) < 2:
            raise ValueError("LineString needs >= 2 points")

    @property
    def bounds(self):
        return (
            float(self.coords[:, 0].min()),
            float(self.coords[:, 1].min()),
            float(self.coords[:, 0].max()),
            float(self.coords[:, 1].max()),
        )

    @property
    def is_empty(self):
        return False

    def __eq__(self, other):
        return isinstance(other, LineString) and np.array_equal(self.coords, other.coords)

    def __repr__(self):
        return f"LineString({self.coords.tolist()})"


@dataclass(frozen=True)
class MultiLineString(Geometry):
    lines: tuple[LineString, ...]

    @property
    def geoms(self):
        return self.lines

    @property
    def bounds(self):
        if not self.lines:
            return _EMPTY_BOUNDS
        bs = [l.bounds for l in self.lines]
        return (
            min(b[0] for b in bs),
            min(b[1] for b in bs),
            max(b[2] for b in bs),
            max(b[3] for b in bs),
        )

    @property
    def is_empty(self):
        return not self.lines


class Polygon(Geometry):
    """Simple polygon: one shell ring + optional hole rings.

    Rings are stored closed (first point == last point) with n >= 4
    coordinates; orientation is not normalized (tests are orientation
    independent).
    """

    def __init__(self, shell: Sequence | np.ndarray, holes: Sequence = ()) -> None:
        self.shell = self._ring(shell)
        self.holes = tuple(self._ring(h) for h in holes)

    @staticmethod
    def _ring(coords) -> np.ndarray:
        arr = _coords_array(coords)
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        if len(arr) < 4:
            raise ValueError("ring needs >= 3 distinct points")
        return arr

    @property
    def rings(self) -> tuple[np.ndarray, ...]:
        return (self.shell, *self.holes)

    @property
    def bounds(self):
        return (
            float(self.shell[:, 0].min()),
            float(self.shell[:, 1].min()),
            float(self.shell[:, 0].max()),
            float(self.shell[:, 1].max()),
        )

    @property
    def is_empty(self):
        return False

    def __eq__(self, other):
        return (
            isinstance(other, Polygon)
            and np.array_equal(self.shell, other.shell)
            and len(self.holes) == len(other.holes)
            and all(np.array_equal(a, b) for a, b in zip(self.holes, other.holes))
        )

    def __repr__(self):
        return f"Polygon({self.shell.tolist()}, holes={len(self.holes)})"


@dataclass(frozen=True)
class MultiPolygon(Geometry):
    polygons: tuple[Polygon, ...]

    @property
    def geoms(self):
        return self.polygons

    @property
    def bounds(self):
        if not self.polygons:
            return _EMPTY_BOUNDS
        bs = [p.bounds for p in self.polygons]
        return (
            min(b[0] for b in bs),
            min(b[1] for b in bs),
            max(b[2] for b in bs),
            max(b[3] for b in bs),
        )

    @property
    def is_empty(self):
        return not self.polygons


@dataclass(frozen=True)
class GeometryCollection(Geometry):
    geometries: tuple[Geometry, ...] = field(default_factory=tuple)

    @property
    def geoms(self):
        return self.geometries

    @property
    def bounds(self):
        nonempty = [g for g in self.geometries if not g.is_empty]
        if not nonempty:
            return _EMPTY_BOUNDS
        bs = [g.bounds for g in nonempty]
        return (
            min(b[0] for b in bs),
            min(b[1] for b in bs),
            max(b[2] for b in bs),
            max(b[3] for b in bs),
        )

    @property
    def is_empty(self):
        return all(g.is_empty for g in self.geometries)


EMPTY = GeometryCollection(())


def box(minx: float, miny: float, maxx: float, maxy: float) -> Polygon:
    """Axis-aligned rectangle polygon (ccw), like ``shapely.geometry.box``."""
    return Polygon(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    )


def iter_leaves(geometry: Geometry) -> Iterator[Geometry]:
    """Depth-first iteration over non-multi leaf geometries.

    Mirrors ``SparseMetaTileBoundingPyramid._iter_leaf_geometries``
    (``/root/reference/tilecloud_chain/__init__.py:517-524``).
    """
    geoms = getattr(geometry, "geoms", None)
    if geoms is None:
        yield geometry
        return
    for sub in geoms:
        yield from iter_leaves(sub)
