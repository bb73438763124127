"""Minimal computational-geometry kernel.

shapely is not available in this environment, so the engine ships its own
small, exact geometry library covering what the reference uses shapely
for (``/root/reference/tilecloud_chain/__init__.py:438-626,1757-1813,
2637-2697``):

* geometry types (point / line / polygon + multis) with WKB round-trip,
* rectangle-vs-geometry intersection tests (the geometry filter),
* band clipping + leaf x-bounds (the sparse metatile enumeration),
* vectorized point-in-polygon (the PIP join of the north rule),
* a packed STR bulk-loaded bounding-box tree for many-geometry layers.
"""

from tilecloud_chain_ray.geom.geometry import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
)
from tilecloud_chain_ray.geom.ops import (
    box_intersects,
    buffer_geometry,
    clip_to_box,
    leaf_geometries,
    points_in_polygon,
)
from tilecloud_chain_ray.geom.strtree import STRtree
from tilecloud_chain_ray.geom.wkb import geometry_from_wkb, geometry_to_wkb

__all__ = [
    "Geometry",
    "GeometryCollection",
    "LineString",
    "MultiLineString",
    "MultiPoint",
    "MultiPolygon",
    "Point",
    "Polygon",
    "STRtree",
    "box",
    "box_intersects",
    "buffer_geometry",
    "clip_to_box",
    "geometry_from_wkb",
    "geometry_to_wkb",
    "leaf_geometries",
    "points_in_polygon",
]
