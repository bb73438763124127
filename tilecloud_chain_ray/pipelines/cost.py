"""Cost estimator (G2): per-zoom tile/metatile counts, time and size.

Re-expresses ``generate-cost`` (``/root/reference/tilecloud_chain/
cost.py:113-265``): two algorithms —

* ``area``: geometry area / tile-span² (fast analytic estimate),
* ``count``: actually enumerate + geometry-filter (exact; distributed
  via the same interval Dataset the generation pipeline uses).

Cost-model defaults mirror ``configuration.py:2358,3137,3142,179``
(30 ms/metatile fetch, 30 ms/tile meta, 40 ms/tile non-meta, 20 KB).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Sequence

import numpy as np

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.geom import Geometry, Polygon
from tilecloud_chain_ray.geom.geometry import iter_leaves

METATILE_GENERATION_TIME_MS = 30.0
TILE_GENERATION_TIME_META_MS = 30.0
TILE_GENERATION_TIME_MS = 40.0
TILE_SIZE_KB = 20.0


def polygon_area(poly: Polygon) -> float:
    """Shoelace area of shell minus holes."""

    def ring_area(ring: np.ndarray) -> float:
        x, y = ring[:-1, 0], ring[:-1, 1]
        xn, yn = ring[1:, 0], ring[1:, 1]
        return abs(float((x * yn - xn * y).sum())) / 2.0

    return ring_area(poly.shell) - sum(ring_area(h) for h in poly.holes)


def geometry_area(geom: Geometry) -> float:
    return sum(polygon_area(g) for g in iter_leaves(geom) if isinstance(g, Polygon))


@dataclass
class ZoomCost:
    zoom: int
    n_tiles: int
    n_metatiles: int
    time_sec: float
    size_kb: float


def estimate_cost(
    layer: Layer,
    zooms: Sequence[int] | None = None,
    algo: str = "area",
    geoms: Mapping[int, Geometry] | None = None,
) -> list[ZoomCost]:
    zooms = list(zooms) if zooms is not None else layer.seed_zooms()
    geoms = geoms or layer.geoms_per_zoom()
    out: list[ZoomCost] = []
    n = layer.meta_size if layer.meta else 1
    for z in zooms:
        geom = geoms.get(z)
        if geom is None or geom.is_empty:
            continue
        if algo == "area":
            area = geometry_area(geom)
            span = layer.grid.span(z)
            n_tiles = int(round(area / (span * span)))
            n_meta = int(np.ceil(n_tiles / (n * n))) if layer.meta else 0
        else:  # exact count via enumeration + filter
            from tilecloud_chain_ray.coords import (
                coord_passes_geom_filter,
                dense_intervals,
            )

            coords = [
                c
                for interval in dense_intervals(layer, geoms, [z])
                for c in interval.coords()
                if coord_passes_geom_filter(layer, geoms, c)
            ]
            n_meta = len(coords) if layer.meta else 0
            n_tiles = len(coords) * n * n if layer.meta else len(coords)
        if layer.meta:
            time_sec = (
                n_meta * METATILE_GENERATION_TIME_MS + n_tiles * TILE_GENERATION_TIME_META_MS
            ) / 1000.0
        else:
            time_sec = n_tiles * TILE_GENERATION_TIME_MS / 1000.0
        out.append(
            ZoomCost(
                zoom=z,
                n_tiles=n_tiles,
                n_metatiles=n_meta,
                time_sec=time_sec,
                size_kb=n_tiles * TILE_SIZE_KB,
            )
        )
    return out
