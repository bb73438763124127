"""Engine configuration: grids, layers, caches — code-level dataclasses.

Replaces the reference's JSON-Schema-validated YAML config
(``/root/reference/tilecloud_chain/configuration.py``, validation at
``__init__.py:1218-1286``) with plain dataclasses: the engine is a
library driven from Python, so config-as-code is the natural Ray-Data
surface.  Defaults mirror the reference
(``configuration.py:1117-1132``): ``meta_size=5`` (*test fixtures use
8*), ``meta_buffer=128``, ``px_buffer=0``, ``tile_size=256``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from tilecloud_chain_ray.geom import Geometry, box
from tilecloud_chain_ray.grid import Grid

LAYER_META_SIZE_DEFAULT = 5
LAYER_META_BUFFER_DEFAULT = 128
LAYER_PIXEL_BUFFER_DEFAULT = 0


@dataclass(frozen=True)
class Dimension:
    """A WMTS dimension (``configuration.py`` dimensions; e.g. DATE)."""

    name: str
    default: str
    generate: tuple[str, ...]
    values: tuple[str, ...]


@dataclass(frozen=True)
class EmptyHash:
    """Constant empty-tile signature: drop when (size, sha1) match.

    Reference: ``empty_tile_detection`` / ``empty_metatile_detection``
    (``tests/tilegeneration/test-nosns.yaml:110-128``), applied by
    ``HashDropper`` (``__init__.py:2442-2493``).
    """

    size: int
    sha1: str  # 40-char hex


@dataclass(frozen=True)
class GeometrySource:
    """One geometry source with optional resolution bounds.

    Reference semantics (``__init__.py:1778-1806``): sources apply in
    order and *replace* the per-zoom geometry for every zoom whose
    resolution satisfies ``min_resolution <= r <= max_resolution``
    (either bound optional) — the mechanism behind the multigeom
    fixture (``tests/tilegeneration/test-multigeom.yaml``: polygon for
    coarse zooms, points for fine ones).
    """

    geometry: Geometry
    min_resolution: float | None = None
    max_resolution: float | None = None

    def matches(self, resolution: float) -> bool:
        return (self.min_resolution is None or self.min_resolution <= resolution) and (
            self.max_resolution is None or self.max_resolution >= resolution
        )


@dataclass(frozen=True)
class Layer:
    """A tile layer: grid(s) + geometry sources + metatile settings."""

    name: str
    grid: Grid
    # plain Geometry entries form one unlimited source (union);
    # GeometrySource entries apply in order with resolution bounds
    geometries: tuple = ()  # tuple[Geometry | GeometrySource, ...]
    bbox: tuple[float, float, float, float] | None = None
    meta: bool = True
    meta_size: int = LAYER_META_SIZE_DEFAULT
    meta_buffer: int = LAYER_META_BUFFER_DEFAULT
    px_buffer: float = LAYER_PIXEL_BUFFER_DEFAULT
    geom_filter: bool = True
    min_resolution_seed: float | None = None
    empty_metatile: EmptyHash | None = None
    empty_tile: EmptyHash | None = None
    dimensions: tuple[Dimension, ...] = ()
    wmts_style: str = "default"
    extension: str = "png"
    mime_type: str = "image/png"

    def seed_zooms(self) -> list[int]:
        """Zooms to seed: resolutions >= min_resolution_seed.

        Reference: ``_apply_min_resolution_seed_filter`` semantics —
        only zooms whose resolution is at least ``min_resolution_seed``
        are generated (``tests/test_generate.py:1281-1316``: swissgrid_5
        with min 10 -> zooms 0..3).
        """
        zooms = []
        for z, r in enumerate(self.grid.resolutions):
            if self.min_resolution_seed is None or r >= self.min_resolution_seed:
                zooms.append(z)
        return zooms

    def geoms_per_zoom(
        self,
        cli_bbox: tuple[float, float, float, float] | None = None,
        zooms: Sequence[int] | None = None,
    ) -> dict[int, Geometry]:
        """Per-zoom geometry dict — the reference's ``get_geoms``.

        Semantics (``/root/reference/tilecloud_chain/__init__.py:1744-1813``):
        the base extent is CLI bbox > layer bbox > grid bbox, as a bbox
        polygon for every zoom; configured geometry sources are clipped
        to that extent and override all zooms (we model neither
        min/max_resolution per source nor reprojection — same-SRS only).
        """
        from tilecloud_chain_ray.geom.geometry import GeometryCollection
        from tilecloud_chain_ray.geom.ops import clip_to_box

        extent = cli_bbox or self.bbox or self.grid.bbox
        base = box(*extent)
        all_zooms = list(zooms) if zooms is not None else list(range(len(self.grid.resolutions)))
        geoms: dict[int, Geometry] = {z: base for z in all_zooms}
        plain = tuple(g for g in self.geometries if isinstance(g, Geometry))
        sources = tuple(g for g in self.geometries if isinstance(g, GeometrySource))
        if plain:
            merged: Geometry = plain[0] if len(plain) == 1 else GeometryCollection(plain)
            clipped = clip_to_box(merged, extent)
            geoms = {z: clipped for z in all_zooms}
        for src in sources:
            clipped = clip_to_box(src.geometry, extent)
            for z in all_zooms:
                if src.matches(self.grid.resolutions[z]):
                    geoms[z] = clipped
        return geoms

    def filter_px_buffer(self) -> float:
        """Pixel buffer used by the geometry *filter*.

        Reference quirk preserved (``__init__.py:2663-2668``): for meta
        layers it is ``px_buffer + meta_buffer``; for non-meta layers the
        filter uses 0 (px_buffer only affects enumeration bounds).
        """
        return self.px_buffer + self.meta_buffer if self.meta else 0.0

    def dimension_combinations(self) -> list[dict[str, str]]:
        """Cross product of generated dimension values.

        ``get_all_dimensions`` (``__init__.py:1321-1338``).
        """
        from itertools import product

        if not self.dimensions:
            return [{}]
        lists = [[(d.name, v) for v in d.generate] for d in self.dimensions]
        return [dict(combo) for combo in product(*lists)]


@dataclass(frozen=True)
class EngineConfig:
    """Top-level config: named grids + layers (one YAML file analog)."""

    grids: Mapping[str, Grid] = field(default_factory=dict)
    layers: Mapping[str, Layer] = field(default_factory=dict)
