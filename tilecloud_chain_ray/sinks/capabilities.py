"""WMTS GetCapabilities XML sink.

The reference renders ``templates/wmts_get_capabilities.jinja`` over
its config (``/root/reference/tilecloud_chain/controller.py:318-378``,
serving goldens ``tests/test_controller.py:69-360``).  This module
produces the same document shape from the engine's ``Layer``/``Grid``
dataclasses — REST operations metadata, one ``<Layer>`` per layer with
style/format/dimensions/ResourceURL/TileMatrixSetLink (+ limits), one
``<TileMatrixSet>`` per grid — written next to the WMTS pyramid as
``1.0.0/WMTSCapabilities.xml``.
"""

from __future__ import annotations

import math
import os
from xml.sax.saxutils import escape

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.grid import Grid

# WMTS standard pixel size (OGC 07-057r7): scale = resolution / 0.28 mm
PIXEL_M = 0.00028


def _fmt(v: float) -> str:
    """Ints render without a trailing .0 (matches YAML-int configs)."""
    f = float(v)
    return str(int(f)) if f == int(f) else repr(f)


def tile_matrix_limits(layer: Layer) -> list[dict[str, int | str]]:
    """Per-zoom row/col limits from the layer bbox clamped to the grid
    (reference ``get_tile_matrix_limits`` ``__init__.py:776-835``):
    empty without a layer bbox or with a non-zero px_buffer."""
    if layer.bbox is None or layer.px_buffer != 0:
        return []
    grid = layer.grid
    gb = grid.bbox
    min_x = max(layer.bbox[0], gb[0])
    min_y = max(layer.bbox[1], gb[1])
    max_x = min(layer.bbox[2], gb[2])
    max_y = min(layer.bbox[3], gb[3])
    if min_x >= max_x or min_y >= max_y:
        return []
    limits: list[dict[str, int | str]] = []
    for zoom, resolution in enumerate(grid.resolutions):
        span = resolution * grid.tile_size
        width, height = grid.matrix_dims(zoom)
        min_col = math.floor((min_x - gb[0]) / span)
        max_col = math.ceil((max_x - gb[0]) / span) - 1
        min_row = math.floor((gb[3] - max_y) / span)
        max_row = math.ceil((gb[3] - min_y) / span) - 1
        limits.append(
            {
                "tile_matrix": grid.matrix_id(zoom),
                "min_tile_row": max(0, min(height - 1, min_row)),
                "max_tile_row": max(0, min(height - 1, max_row)),
                "min_tile_col": max(0, min(width - 1, min_col)),
                "max_tile_col": max(0, min(width - 1, max_col)),
            }
        )
    return limits


def _layer_xml(layer: Layer, base_urls: list[str], postfix: str) -> list[str]:
    out = [
        "    <Layer>",
        f"      <ows:Title>{escape(layer.name)}</ows:Title>",
        f"      <ows:Identifier>{escape(layer.name)}</ows:Identifier>",
        '      <Style isDefault="true">',
        f"        <ows:Identifier>{escape(layer.wmts_style)}</ows:Identifier>",
        "      </Style>",
        f"      <Format>{layer.mime_type}</Format>",
    ]
    for dim in layer.dimensions:
        out.append("      <Dimension>")
        out.append(f"        <ows:Identifier>{escape(dim.name)}</ows:Identifier>")
        out.append(f"        <Default>{escape(dim.default)}</Default>")
        for value in dim.values:
            out.append(f"        <Value>{escape(value)}</Value>")
        out.append("      </Dimension>")
    dim_path = "".join("/{%s}" % d.name for d in layer.dimensions)
    for base_url in base_urls:
        template = (
            f"{base_url}{postfix}1.0.0/{layer.name}/{layer.wmts_style}{dim_path}"
            "/{TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}." + layer.extension
        )
        out.append(
            f'      <ResourceURL format="{layer.mime_type}" resourceType="tile"\n'
            f'                   template="{template}" />'
        )
    out.append("      <TileMatrixSetLink>")
    out.append(f"        <TileMatrixSet>{escape(layer.grid.name)}</TileMatrixSet>")
    limits = tile_matrix_limits(layer)
    if limits:
        out.append("        <TileMatrixSetLimits>")
        for lim in limits:
            out.append("          <TileMatrixLimits>")
            out.append(f"            <TileMatrix>{lim['tile_matrix']}</TileMatrix>")
            out.append(f"            <MinTileRow>{lim['min_tile_row']}</MinTileRow>")
            out.append(f"            <MaxTileRow>{lim['max_tile_row']}</MaxTileRow>")
            out.append(f"            <MinTileCol>{lim['min_tile_col']}</MinTileCol>")
            out.append(f"            <MaxTileCol>{lim['max_tile_col']}</MaxTileCol>")
            out.append("          </TileMatrixLimits>")
        out.append("        </TileMatrixSetLimits>")
    out.append("      </TileMatrixSetLink>")
    out.append("    </Layer>")
    return out


def _grid_xml(grid: Grid) -> list[str]:
    out = [
        "    <TileMatrixSet>",
        f"      <ows:Identifier>{escape(grid.name)}</ows:Identifier>",
        "      <ows:SupportedCRS>urn:ogc:def:crs:{}</ows:SupportedCRS>".format(
            grid.srs.replace(":", "::")
        ),
    ]
    for zoom, resolution in enumerate(grid.resolutions):
        width, height = grid.matrix_dims(zoom)
        out.extend(
            [
                "      <TileMatrix>",
                f"        <ows:Identifier>{grid.matrix_id(zoom)}</ows:Identifier>",
                f"        <ScaleDenominator>{resolution / PIXEL_M}</ScaleDenominator>",
                f"        <TopLeftCorner>{_fmt(grid.bbox[0])} {_fmt(grid.bbox[3])}</TopLeftCorner>",
                f"        <TileWidth>{grid.tile_size}</TileWidth>",
                f"        <TileHeight>{grid.tile_size}</TileHeight>",
                f"        <MatrixWidth>{width}</MatrixWidth>",
                f"        <MatrixHeight>{height}</MatrixHeight>",
                "      </TileMatrix>",
            ]
        )
    out.append("    </TileMatrixSet>")
    return out


def wmts_capabilities_xml(
    layers: list[Layer],
    base_urls: list[str] | None = None,
    base_url_postfix: str = "",
) -> str:
    """Render the capabilities document for the given layers (grids are
    collected from the layers, deduplicated by name)."""
    base_urls = base_urls or ["http://wmts/"]
    postfix = base_url_postfix
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<Capabilities version="1.0.0"',
        '    xmlns="http://www.opengis.net/wmts/1.0"',
        '    xmlns:ows="http://www.opengis.net/ows/1.1"',
        '    xmlns:xlink="http://www.w3.org/1999/xlink"',
        '    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"',
        '    xmlns:gml="http://www.opengis.net/gml"',
        '    xsi:schemaLocation="http://schemas.opengis.net/wmts/1.0/wmtsGetCapabilities_response.xsd">',
        "  <ows:OperationsMetadata>",
        '    <ows:Operation name="GetCapabilities">',
        "      <ows:DCP>",
        "        <ows:HTTP>",
        f'          <ows:Get xlink:href="{base_urls[0]}{postfix}1.0.0/WMTSCapabilities.xml">',
        '            <ows:Constraint name="GetEncoding">',
        "              <ows:AllowedValues>",
        "                <ows:Value>REST</ows:Value>",
        "              </ows:AllowedValues>",
        "            </ows:Constraint>",
        "          </ows:Get>",
        "        </ows:HTTP>",
        "      </ows:DCP>",
        "    </ows:Operation>",
        '    <ows:Operation name="GetTile">',
        "      <ows:DCP>",
        "        <ows:HTTP>",
    ]
    for base_url in base_urls:
        lines.extend(
            [
                f'          <ows:Get xlink:href="{base_url}{postfix}">',
                '            <ows:Constraint name="GetEncoding">',
                "              <ows:AllowedValues>",
                "                <ows:Value>REST</ows:Value>",
                "              </ows:AllowedValues>",
                "            </ows:Constraint>",
                "          </ows:Get>",
            ]
        )
    lines.extend(
        [
            "        </ows:HTTP>",
            "      </ows:DCP>",
            "    </ows:Operation>",
            "  </ows:OperationsMetadata>",
            "  <Contents>",
        ]
    )
    for layer in sorted(layers, key=lambda l: l.name):
        lines.extend(_layer_xml(layer, base_urls, postfix))
    seen: dict[str, Grid] = {}
    for layer in layers:
        seen.setdefault(layer.grid.name, layer.grid)
    for name in sorted(seen):
        lines.extend(_grid_xml(seen[name]))
    lines.append("  </Contents>")
    lines.append("</Capabilities>")
    return "\n".join(lines) + "\n"


def write_capabilities(
    out_wmts: str,
    layers: list[Layer],
    base_urls: list[str] | None = None,
    base_url_postfix: str = "",
) -> str:
    """Write ``1.0.0/WMTSCapabilities.xml`` under the pyramid root;
    returns the file path."""
    xml = wmts_capabilities_xml(layers, base_urls, base_url_postfix)
    path = os.path.join(out_wmts, "1.0.0", "WMTSCapabilities.xml")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(xml)
    os.replace(tmp, path)
    return path
