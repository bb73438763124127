"""WKT parse/serialize for the geometry types (interchange surface)."""

from __future__ import annotations

import re

from tilecloud_chain_ray.geom.geometry import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def _parse_coords(text: str) -> list[tuple[float, float]]:
    pairs = []
    for chunk in text.split(","):
        xy = chunk.split()
        pairs.append((float(xy[0]), float(xy[1])))
    return pairs


def _split_groups(text: str) -> list[str]:
    """Split 'a, b', '(x),(y)' style top-level comma groups."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(text[start:i])
            start = i + 1
    groups.append(text[start:])
    return [g.strip() for g in groups]


def _strip_parens(text: str) -> str:
    text = text.strip()
    assert text.startswith("(") and text.endswith(")"), text
    return text[1:-1]


def geometry_from_wkt(wkt: str) -> Geometry:
    wkt = wkt.strip()
    m = re.match(r"^([A-Za-z ]+?)\s*\((.*)\)$", wkt, re.S)
    if not m:
        raise ValueError(f"invalid WKT: {wkt[:60]!r}")
    kind = m.group(1).strip().upper()
    body = m.group(2).strip()
    if kind == "POINT":
        (xy,) = _parse_coords(body)
        return Point(*xy)
    if kind == "LINESTRING":
        return LineString(_parse_coords(body))
    if kind == "POLYGON":
        rings = [_parse_coords(_strip_parens(g)) for g in _split_groups(body)]
        return Polygon(rings[0], rings[1:])
    if kind == "MULTIPOINT":
        pts = []
        for g in _split_groups(body):
            g = g.strip()
            if g.startswith("("):
                g = _strip_parens(g)
            (xy,) = _parse_coords(g)
            pts.append(Point(*xy))
        return MultiPoint(tuple(pts))
    if kind == "MULTILINESTRING":
        return MultiLineString(
            tuple(LineString(_parse_coords(_strip_parens(g))) for g in _split_groups(body))
        )
    if kind == "MULTIPOLYGON":
        polys = []
        for g in _split_groups(body):
            rings = [_parse_coords(_strip_parens(r)) for r in _split_groups(_strip_parens(g))]
            polys.append(Polygon(rings[0], rings[1:]))
        return MultiPolygon(tuple(polys))
    if kind == "GEOMETRYCOLLECTION":
        return GeometryCollection(tuple(geometry_from_wkt(g) for g in _split_groups(body)))
    raise ValueError(f"unsupported WKT type {kind}")


def geometry_to_wkt(geom: Geometry) -> str:
    def coords(arr) -> str:
        return ", ".join(f"{x:g} {y:g}" for x, y in arr)

    if isinstance(geom, Point):
        return f"POINT({geom.x:g} {geom.y:g})"
    if isinstance(geom, LineString):
        return f"LINESTRING({coords(geom.coords)})"
    if isinstance(geom, Polygon):
        rings = ", ".join(f"({coords(r)})" for r in geom.rings)
        return f"POLYGON({rings})"
    if isinstance(geom, MultiPoint):
        return "MULTIPOINT(" + ", ".join(f"({p.x:g} {p.y:g})" for p in geom.points) + ")"
    if isinstance(geom, MultiLineString):
        return (
            "MULTILINESTRING("
            + ", ".join(f"({coords(line.coords)})" for line in geom.lines)
            + ")"
        )
    if isinstance(geom, MultiPolygon):
        parts = []
        for p in geom.polygons:
            rings = ", ".join(f"({coords(r)})" for r in p.rings)
            parts.append(f"({rings})")
        return "MULTIPOLYGON(" + ", ".join(parts) + ")"
    if isinstance(geom, GeometryCollection):
        return (
            "GEOMETRYCOLLECTION("
            + ", ".join(geometry_to_wkt(g) for g in geom.geometries)
            + ")"
        )
    raise TypeError(type(geom))
