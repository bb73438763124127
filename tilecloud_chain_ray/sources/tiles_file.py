"""Tiles-file source (S3): re-run a saved coordinate list.

The reference's ``--tiles error.list`` path
(``/root/reference/tilecloud_chain/__init__.py:2842-2872``): a text
file of ``z/x/y[:+n/+n] k=v ...`` lines (the error-file format written
by ``log_tiles_error``) becomes the tile stream.  Here:
``read_text -> map_batches(parse)`` -> the standard coord schema, so the
same downstream pipeline re-runs exactly the failed coordinates.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from tilecloud_chain_ray.coords import parse_tilecoord
from tilecloud_chain_ray.sources.enumerate import COORD_SCHEMA


def parse_tiles_lines(batch: pa.Table, layer_name: str, grid_name: str) -> pa.Table:
    zs, xs, ys, ns = [], [], [], []
    for line in batch["text"].to_pylist():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        coord_part = line.split(" ", 1)[0]
        c = parse_tilecoord(coord_part)
        zs.append(c.z)
        xs.append(c.x)
        ys.append(c.y)
        ns.append(c.n)
    k = len(zs)
    return pa.Table.from_arrays(
        [
            pa.array([layer_name] * k, pa.string()),
            pa.array([grid_name] * k, pa.string()),
            pa.array(zs, pa.int32()),
            pa.array(xs, pa.int64()),
            pa.array(ys, pa.int64()),
            pa.array(ns, pa.int32()),
        ],
        schema=COORD_SCHEMA,
    )


def tiles_file_dataset(path: str, layer_name: str, grid_name: str) -> ray.data.Dataset:
    return ray.data.read_text(path).map_batches(
        lambda b: parse_tiles_lines(b, layer_name, grid_name), batch_format="pyarrow"
    )
