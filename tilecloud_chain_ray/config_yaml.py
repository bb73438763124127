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


def _srs_literal(srs: str | int) -> str:
    from tilecloud_chain_ray.proj import get_proj4_literal

    return get_proj4_literal(srs)


class ConfigError(ValueError):
    """Invalid configuration; ``.errors`` holds one message per problem."""

    def __init__(self, errors: list[str]) -> None:
        super().__init__("invalid config:\n" + "\n".join(errors))
        self.errors = errors


_GRID_KEYS = {
    "resolutions", "bbox", "srs", "tile_size", "matrix_identifier",
    "proj4_literal", "resolution_scale", "unit",
}
_LAYER_KEYS = {
    "grids", "bbox", "meta", "meta_size", "meta_buffer", "px_buffer",
    "geom_filter", "min_resolution_seed", "empty_metatile_detection",
    "empty_tile_detection", "dimensions", "wmts_style", "extension",
    "mime_type", "geoms", "type", "url", "mapfile", "proj4_literal",
    "srs", "post_process", "pre_hash_post_process", "layers",
    "output_format", "headers", "cost",
}
_SHA1_HEX = set("0123456789abcdef")


def validate_config(doc: dict, file: str = "<config>") -> list[str]:
    """Structured validation mirroring the reference's ``validate_config``
    (``/root/reference/tilecloud_chain/__init__.py:1218-1286``):
    required keys, type checks, resolution/bbox sanity, empty-hash
    shape, grid references, unknown-key warnings.  Returns error
    messages (empty = valid); unknown keys warn instead of erroring.
    """
    errors: list[str] = []
    if not isinstance(doc, dict):
        return [f"{file}: top level must be a mapping"]

    def err(path: str, msg: str) -> None:
        errors.append(f"{file}: {path}: {msg}")

    grids = doc.get("grids") or {}
    if not isinstance(grids, dict):
        err("grids", "must be a mapping of name -> grid")
        grids = {}
    for gname, g in grids.items():
        p = f"grids.{gname}"
        if not isinstance(g, dict):
            err(p, "must be a mapping")
            continue
        res = g.get("resolutions")
        if not isinstance(res, (list, tuple)) or not res:
            err(p + ".resolutions", "required: non-empty list of numbers")
        else:
            if not all(isinstance(r, (int, float)) and r > 0 for r in res):
                err(p + ".resolutions", "must all be positive numbers")
            elif list(res) != sorted(res, reverse=True):
                err(p + ".resolutions", "must be descending (zoom 0 = coarsest)")
            scale = g.get("resolution_scale")
            if scale is not None:
                if not isinstance(scale, int) or scale < 1:
                    err(p + ".resolution_scale", "must be a positive integer")
                else:
                    for r in res:
                        if isinstance(r, (int, float)) and (r * scale) % 1 != 0.0:
                            err(
                                p + ".resolution_scale",
                                f"resolution {r} * resolution_scale {scale} is not an integer",
                            )
        bbox = g.get("bbox")
        if not isinstance(bbox, (list, tuple)) or len(bbox) != 4:
            err(p + ".bbox", "required: [minx, miny, maxx, maxy]")
        elif not all(isinstance(v, (int, float)) for v in bbox):
            err(p + ".bbox", "must be 4 numbers")
        elif bbox[0] >= bbox[2] or bbox[1] >= bbox[3]:
            err(p + ".bbox", "min must be < max on both axes")
        ts = g.get("tile_size", 256)
        if not isinstance(ts, int) or ts <= 0:
            err(p + ".tile_size", "must be a positive integer")
        if g.get("matrix_identifier", "zoom") not in ("zoom", "resolution"):
            err(p + ".matrix_identifier", "must be 'zoom' or 'resolution'")
        srs = g.get("srs", "EPSG:21781")
        if not (isinstance(srs, str) and srs.upper().startswith("EPSG:")
                and srs.split(":")[-1].isdigit()):
            err(p + ".srs", f"must look like 'EPSG:<code>', got {srs!r}")
        unknown = set(g) - _GRID_KEYS
        if unknown:
            warnings.warn(f"{file}: {p}: unknown keys {sorted(unknown)}", stacklevel=2)

    layers = doc.get("layers") or {}
    if not isinstance(layers, dict):
        err("layers", "must be a mapping of name -> layer")
        layers = {}
    for lname, lay in layers.items():
        p = f"layers.{lname}"
        if not isinstance(lay, dict):
            err(p, "must be a mapping")
            continue
        for gref in lay.get("grids") or []:
            if gref not in grids:
                err(p + ".grids", f"unknown grid {gref!r}")
        bbox = lay.get("bbox")
        if bbox is not None and (
            not isinstance(bbox, (list, tuple))
            or len(bbox) != 4
            or not all(isinstance(v, (int, float)) for v in bbox)
        ):
            err(p + ".bbox", "must be 4 numbers")
        if lay.get("meta"):
            ms = lay.get("meta_size", 5)
            if not isinstance(ms, int) or ms < 1:
                err(p + ".meta_size", "must be a positive integer")
            mb = lay.get("meta_buffer", 128)
            if not isinstance(mb, int) or mb < 0:
                err(p + ".meta_buffer", "must be a non-negative integer")
        for key in ("empty_metatile_detection", "empty_tile_detection"):
            e = lay.get(key)
            if e is None:
                continue
            if not isinstance(e, dict) or "size" in e and not isinstance(e["size"], int):
                err(p + f".{key}", "must be a mapping {size: int, hash: sha1-hex}")
                continue
            if "size" not in e or "hash" not in e:
                err(p + f".{key}", "requires both 'size' and 'hash'")
                continue
            h = e["hash"]
            if not (isinstance(h, str) and len(h) == 40 and set(h.lower()) <= _SHA1_HEX):
                err(p + f".{key}.hash", "must be a 40-char sha1 hex string")
        mrs = lay.get("min_resolution_seed")
        if mrs is not None and not isinstance(mrs, (int, float)):
            err(p + ".min_resolution_seed", "must be a number")
        for i, d in enumerate(lay.get("dimensions") or []):
            if not isinstance(d, dict) or "name" not in d or "default" not in d:
                err(p + f".dimensions[{i}]", "requires 'name' and 'default'")
        # the reference rejects Mapnik/Grid output with metatiles
        # (__init__.py:1277-1283)
        if (
            lay.get("type") == "mapnik"
            and lay.get("output_format", "png") == "grid"
            and lay.get("meta")
        ):
            err(p, "Mapnik/Grid layers cannot use metatiles")
        unknown = set(lay) - _LAYER_KEYS
        if unknown:
            warnings.warn(f"{file}: {p}: unknown keys {sorted(unknown)}", stacklevel=2)

    for lname, lay in layers.items():
        if isinstance(lay, dict) and not (lay.get("grids") or grids):
            errors.append(f"{file}: layers.{lname}: no grids defined anywhere")

    return errors


@dataclass
class LoadedConfig:
    engine: EngineConfig
    caches: dict[str, str] = field(default_factory=dict)  # name -> folder
    urls: dict[str, str] = field(default_factory=dict)  # layer -> WMS url
    warnings_: list[str] = field(default_factory=list)


def load_config(
    path: str | None = None, text: str | None = None, ignore_error: bool = False
) -> LoadedConfig:
    if text is None:
        with open(path) as fh:
            text = fh.read()
    doc = yaml.safe_load(text)
    errors = validate_config(doc, file=path or "<inline>")
    if errors and not ignore_error:
        raise ConfigError(errors)
    warns: list[str] = list(errors)

    grids: dict[str, Grid] = {}
    for name, g in (doc.get("grids") or {}).items():
        grids[name] = Grid(
            name=name,
            resolutions=tuple(g["resolutions"]),
            bbox=tuple(g["bbox"]),
            srs=g.get("srs", "EPSG:21781"),
            tile_size=g.get("tile_size", 256),
            matrix_identifier=g.get("matrix_identifier", "zoom"),
            proj4_literal=g.get("proj4_literal"),
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
        # layer-side CRS: a layer bbox / inline geometry may be declared
        # in another SRS and is reprojected into the grid CRS, mirroring
        # the reference's proj4_literal handling (__init__.py:798-802)
        # srs identical to the grid's needs no reprojection (and must
        # not fail just because the code is outside the literal table)
        layer_srs = lay.get("srs")
        if lay.get("proj4_literal"):
            layer_proj4 = lay["proj4_literal"]
        elif layer_srs and str(layer_srs) != str(grid.srs):
            try:
                layer_proj4 = _srs_literal(layer_srs)
            except ValueError as exc:
                raise ConfigError([f"layer {name}: srs {layer_srs!r}: {exc}"]) from exc
        else:
            layer_proj4 = None
        grid_proj4 = None
        if layer_proj4 is not None:
            try:
                grid_proj4 = grid.proj4()
            except ValueError as exc:
                raise ConfigError(
                    [f"layer {name}: grid srs {grid.srs!r}: {exc}"]
                ) from exc
            if layer_proj4 == grid_proj4:
                layer_proj4 = grid_proj4 = None

        layer_bbox = tuple(lay["bbox"]) if lay.get("bbox") else None
        if layer_bbox and layer_proj4 and layer_proj4 != grid_proj4:
            from tilecloud_chain_ray.proj import transform_bbox

            layer_bbox = tuple(transform_bbox(layer_proj4, grid_proj4, layer_bbox))

        geometries = []
        for src in lay.get("geoms") or []:
            if "wkt" in src:
                from tilecloud_chain_ray.config import GeometrySource

                geom = geometry_from_wkt(src["wkt"])
                try:
                    src_proj4 = src.get("proj4_literal") or (
                        _srs_literal(src["srs"]) if src.get("srs") else layer_proj4
                    )
                    if src.get("srs") and str(src["srs"]) == str(grid.srs):
                        src_proj4 = None  # same CRS: identity
                except ValueError as exc:
                    raise ConfigError(
                        [f"layer {name}: geom srs {src.get('srs')!r}: {exc}"]
                    ) from exc
                if src_proj4 and src_proj4 != (grid_proj4 or grid.proj4()):
                    from tilecloud_chain_ray.proj import Transformer, transform_geometry

                    geom = transform_geometry(
                        geom,
                        Transformer.from_proj4(src_proj4, grid_proj4 or grid.proj4()),
                    )
                geometries.append(
                    GeometrySource(
                        geom,
                        min_resolution=src.get("min_resolution"),
                        max_resolution=src.get("max_resolution"),
                    )
                )
            elif "file" in src:
                # parquet geometry table — the PostGIS/OGR substitute
                from tilecloud_chain_ray.sources.geoms_file import load_layer_geometries

                try:
                    grid_lit = grid.proj4()
                except ValueError:
                    grid_lit = None
                geometries.extend(
                    load_layer_geometries(
                        src["file"], src.get("layer", name), grid_proj4=grid_lit
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
            bbox=layer_bbox,
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

    # per-layer WMS backend URLs (type: wms) for the fetch/serve paths
    urls = {
        name: lay["url"]
        for name, lay in (doc.get("layers") or {}).items()
        if lay.get("url")
    }

    caches = {}
    for name, c in (doc.get("caches") or {}).items():
        # filesystem: WMTS layout under folder; mbtiles: single-file
        # sqlite store(s) under folder (sinks/mbtiles.write_mbtiles);
        # bsddb: single-file KV store(s) under folder — reproduced
        # from scratch (sinks/kvfile.write_kvfile; reference
        # __init__.py:1402-1430)
        if c.get("type") in ("filesystem", "mbtiles", "bsddb") and "folder" in c:
            caches[name] = c["folder"]
        else:
            warns.append(f"cache {name}: type {c.get('type')} not a local folder — skipped")

    for w in warns:
        warnings.warn(w, stacklevel=2)
    return LoadedConfig(
        engine=EngineConfig(grids=grids, layers=layers),
        caches=caches,
        urls=urls,
        warnings_=warns,
    )
