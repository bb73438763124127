"""Static modulo shard filter (M3) — reference-parity only.

``LocalProcessFilter``: keep a tile iff
``round(z + x/n + y/n) % nb_process == process_nb``
(``/root/reference/tilecloud_chain/__init__.py:2614-2634``).  Ray's
block scheduling makes static sharding unnecessary (and it load-balances
poorly); provided for exact behavioral parity when splitting work across
independent driver processes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def local_process_filter(nb_process: int, process_nb: int):
    def shard(batch: pa.Table) -> pa.Table:
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.round(z + x / n + y / n).astype(np.int64) % nb_process == process_nb
        return batch.filter(pa.array(keep))

    return shard


def add_shard_filter(ds: ray.data.Dataset, nb_process: int, process_nb: int) -> ray.data.Dataset:
    return ds.map_batches(local_process_filter(nb_process, process_nb), batch_format="pyarrow")
