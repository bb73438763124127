"""YAML config loader: accepts reference-style tilecloud-chain YAML.

A thin constructor over ``config.Grid``/``Layer`` so an existing
``tilegeneration/config.yaml`` (grids / layers / defaults-with-anchors,
``/root/reference/tilecloud_chain/tests/tilegeneration/test-nosns.yaml``
shape) drives this engine directly.  Differences:

* geometry sources: ``geoms`` entries with ``wkt:`` are parsed inline;
  ``sql:``/``datasource:`` entries (PostGIS/OGR) need a live service —
  they are collected into ``Layer``-side warnings and skipped (pass
  decoded geometries programmatically instead).
* ``type: wms|mapnik`` and url/mapfile are recorded but rendering is
  the engine's deterministic renderer.
* caches: only the folder of a filesystem cache is used (``out_wmts``).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

import yaml

from tilecloud_chain_ray.config import Dimension, EmptyHash, EngineConfig, Layer
from tilecloud_chain_ray.geom.wkt import geometry_from_wkt
from tilecloud_chain_ray.grid import Grid


@dataclass
class LoadedConfig:
    engine: EngineConfig
    caches: dict[str, str] = field(default_factory=dict)  # name -> folder
    warnings_: list[str] = field(default_factory=list)


def load_config(path: str | None = None, text: str | None = None) -> LoadedConfig:
    if text is None:
        with open(path) as fh:
            text = fh.read()
    doc = yaml.safe_load(text)
    warns: list[str] = []

    grids: dict[str, Grid] = {}
    for name, g in (doc.get("grids") or {}).items():
        grids[name] = Grid(
            name=name,
            resolutions=tuple(g["resolutions"]),
            bbox=tuple(g["bbox"]),
            srs=g.get("srs", "EPSG:21781"),
            tile_size=g.get("tile_size", 256),
            matrix_identifier=g.get("matrix_identifier", "zoom"),
        )

    layers: dict[str, Layer] = {}
    for name, lay in (doc.get("layers") or {}).items():
        grid_names = lay.get("grids") or list(grids)
        grid = grids[grid_names[0]]
        if len(grid_names) > 1:
            warns.append(
                f"layer {name}: multiple grids {grid_names} — build one Layer per "
                "grid and use generate_tiles_multi_grid"
            )
        geometries = []
        for src in lay.get("geoms") or []:
            if "wkt" in src:
                from tilecloud_chain_ray.config import GeometrySource

                geometries.append(
                    GeometrySource(
                        geometry_from_wkt(src["wkt"]),
                        min_resolution=src.get("min_resolution"),
                        max_resolution=src.get("max_resolution"),
                    )
                )
            else:
                warns.append(
                    f"layer {name}: geometry source {sorted(src)} needs a live "
                    "service — pass decoded geometries to Layer(geometries=...)"
                )
        dims = tuple(
            Dimension(
                name=d["name"],
                default=str(d["default"]),
                generate=tuple(str(v) for v in d.get("generate", [d["default"]])),
                values=tuple(str(v) for v in d.get("values", [d["default"]])),
            )
            for d in lay.get("dimensions") or []
        )

        def empty(key: str) -> EmptyHash | None:
            e = lay.get(key)
            return EmptyHash(size=e["size"], sha1=e["hash"]) if e else None

        layers[name] = Layer(
            name=name,
            grid=grid,
            geometries=tuple(geometries),
            bbox=tuple(lay["bbox"]) if lay.get("bbox") else None,
            meta=lay.get("meta", False),
            meta_size=lay.get("meta_size", 5),
            meta_buffer=lay.get("meta_buffer", 128),
            px_buffer=lay.get("px_buffer", 0),
            geom_filter=lay.get("geom_filter", True),
            min_resolution_seed=lay.get("min_resolution_seed"),
            empty_metatile=empty("empty_metatile_detection"),
            empty_tile=empty("empty_tile_detection"),
            dimensions=dims,
            wmts_style=lay.get("wmts_style", "default"),
            extension=lay.get("extension", "png"),
            mime_type=lay.get("mime_type", "image/png"),
        )

    caches = {}
    for name, c in (doc.get("caches") or {}).items():
        if c.get("type") == "filesystem" and "folder" in c:
            caches[name] = c["folder"]
        else:
            warns.append(f"cache {name}: type {c.get('type')} not a local folder — skipped")

    for w in warns:
        warnings.warn(w, stacklevel=2)
    return LoadedConfig(
        engine=EngineConfig(grids=grids, layers=layers), caches=caches, warnings_=warns
    )
