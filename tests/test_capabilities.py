"""WMTS GetCapabilities XML golden (values mirrored from the reference
serving goldens, tests/test_controller.py:140-230: the 'all' layer with
bbox [550000,170000,560000,180000] on swissgrid_5)."""

import xml.etree.ElementTree as ET

from tilecloud_chain_ray.config import Dimension, Layer
from tilecloud_chain_ray.grid import SWISSGRID_5
from tilecloud_chain_ray.sinks.capabilities import (
    tile_matrix_limits,
    wmts_capabilities_xml,
    write_capabilities,
)

ALL_LAYER = Layer(
    name="all",
    grid=SWISSGRID_5,
    bbox=(550000.0, 170000.0, 560000.0, 180000.0),
    meta=False,
    dimensions=(
        Dimension(
            name="DATE",
            default="2012",
            generate=("2012",),
            values=("2005", "2010", "2012"),
        ),
    ),
)

# exact values from the reference capabilities golden
EXPECTED_LIMITS = [
    ("0", 6, 7, 5, 5),
    ("1", 13, 14, 10, 10),
    ("2", 33, 35, 25, 27),
    ("3", 66, 70, 50, 54),
    ("4", 132, 140, 101, 109),
]


def test_tile_matrix_limits_reference_golden():
    lims = tile_matrix_limits(ALL_LAYER)
    got = [
        (
            l["tile_matrix"],
            l["min_tile_row"],
            l["max_tile_row"],
            l["min_tile_col"],
            l["max_tile_col"],
        )
        for l in lims
    ]
    assert got == EXPECTED_LIMITS


def test_capabilities_xml_structure():
    xml = wmts_capabilities_xml([ALL_LAYER], base_urls=["http://wmts1/tiles/"])
    ns = {
        "wmts": "http://www.opengis.net/wmts/1.0",
        "ows": "http://www.opengis.net/ows/1.1",
    }
    root = ET.fromstring(xml)
    layer = root.find("wmts:Contents/wmts:Layer", ns)
    assert layer.find("ows:Identifier", ns).text == "all"
    assert layer.find("wmts:Style/ows:Identifier", ns).text == "default"
    assert layer.find("wmts:Format", ns).text == "image/png"
    dim = layer.find("wmts:Dimension", ns)
    assert dim.find("ows:Identifier", ns).text == "DATE"
    assert dim.find("wmts:Default", ns).text == "2012"
    assert [v.text for v in dim.findall("wmts:Value", ns)] == ["2005", "2010", "2012"]
    res_url = layer.find("wmts:ResourceURL", ns)
    assert res_url.get("template") == (
        "http://wmts1/tiles/1.0.0/all/default/{DATE}/{TileMatrixSet}"
        "/{TileMatrix}/{TileRow}/{TileCol}.png"
    )
    link = layer.find("wmts:TileMatrixSetLink", ns)
    assert link.find("wmts:TileMatrixSet", ns).text == "swissgrid_5"
    lims = link.findall("wmts:TileMatrixSetLimits/wmts:TileMatrixLimits", ns)
    assert len(lims) == 5
    assert lims[0].find("wmts:MinTileRow", ns).text == "6"
    assert lims[4].find("wmts:MaxTileCol", ns).text == "109"

    tms = root.find("wmts:Contents/wmts:TileMatrixSet", ns)
    assert tms.find("ows:Identifier", ns).text == "swissgrid_5"
    assert tms.find("ows:SupportedCRS", ns).text == "urn:ogc:def:crs:EPSG::21781"
    matrices = tms.findall("wmts:TileMatrix", ns)
    assert len(matrices) == 5
    m0 = matrices[0]
    # 100 m/px / 0.00028 (reference golden regex 357142.857142...)
    assert m0.find("wmts:ScaleDenominator", ns).text.startswith("357142.857142")
    assert m0.find("wmts:TopLeftCorner", ns).text == "420000 350000"
    assert m0.find("wmts:MatrixWidth", ns).text == "19"
    assert m0.find("wmts:MatrixHeight", ns).text == "13"
    m4 = matrices[4]
    assert m4.find("wmts:ScaleDenominator", ns).text.startswith("17857.142857")
    assert m4.find("wmts:MatrixWidth", ns).text == "375"
    assert m4.find("wmts:MatrixHeight", ns).text == "250"


def test_write_capabilities_file(tmp_path):
    path = write_capabilities(str(tmp_path / "wmts"), [ALL_LAYER])
    assert path.endswith("1.0.0/WMTSCapabilities.xml")
    ET.parse(path)  # well-formed


def test_limits_absent_without_bbox_or_with_px_buffer():
    from dataclasses import replace

    assert tile_matrix_limits(replace(ALL_LAYER, bbox=None)) == []
    assert tile_matrix_limits(replace(ALL_LAYER, px_buffer=10.0)) == []
