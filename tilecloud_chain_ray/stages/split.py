"""Metatile splitter (A3): one metatile row -> n*n child tile rows.

Reference semantics (``/root/reference/tilecloud_chain/__init__.py:
1483-1595``, splitter geometry ``cost.py:166-185``): crop ``tile_size``
windows offset by ``meta_buffer`` from the metatile image and re-encode
each child.  Rows already marked ``meta_dropped`` by the metatile hash
drop pass through unchanged as zero-child marker rows — preserving the
reference's "dropped metatile => children never materialize" ordering
(``generate.py:305-319``) while keeping drop counts in-band.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.functions.png import decode_png, encode_png

_PASSTHROUGH_EXCLUDE = {"x", "y", "n", "data", "status"}


class MetatileSplitter:
    def __init__(self, layer: Layer) -> None:
        self.layer = layer

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or not self.layer.meta:
            if "status" not in batch.schema.names:
                batch = batch.append_column(
                    "status", pa.array(["generated"] * batch.num_rows, pa.string())
                )
            return batch
        ts = self.layer.grid.tile_size
        buf = self.layer.meta_buffer
        has_status = "status" in batch.schema.names
        statuses = (
            batch["status"].to_pylist() if has_status else ["generated"] * batch.num_rows
        )
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        data = batch["data"]

        take_idx: list[int] = []
        out_x: list[int] = []
        out_y: list[int] = []
        out_n: list[int] = []
        out_data: list[bytes | None] = []
        out_status: list[str] = []
        for i in range(batch.num_rows):
            if statuses[i] == "meta_dropped" or data[i].as_py() is None:
                take_idx.append(i)
                out_x.append(int(x[i]))
                out_y.append(int(y[i]))
                out_n.append(int(n[i]))
                out_data.append(None)
                out_status.append(statuses[i])
                continue
            img = decode_png(data[i].as_py())
            ni = int(n[i])
            for dy in range(ni):
                for dx in range(ni):
                    crop = img[
                        buf + dy * ts : buf + (dy + 1) * ts,
                        buf + dx * ts : buf + (dx + 1) * ts,
                    ]
                    take_idx.append(i)
                    out_x.append(int(x[i]) + dx)
                    out_y.append(int(y[i]) + dy)
                    out_n.append(1)
                    out_data.append(encode_png(np.ascontiguousarray(crop)))
                    out_status.append("generated")

        carried = batch.select(
            [c for c in batch.schema.names if c not in _PASSTHROUGH_EXCLUDE]
        ).take(pa.array(take_idx, pa.int64()))
        out = carried.append_column("x", pa.array(out_x, pa.int64()))
        out = out.append_column("y", pa.array(out_y, pa.int64()))
        out = out.append_column("n", pa.array(out_n, pa.int32()))
        out = out.append_column("data", pa.array(out_data, pa.binary()))
        return out.append_column("status", pa.array(out_status, pa.string()))
