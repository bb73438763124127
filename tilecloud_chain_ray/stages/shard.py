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


def drop_layerless(ds: ray.data.Dataset, layer_col: str = "layer") -> ray.data.Dataset:
    """Layer-presence filter (M4): drop coord rows without layer
    metadata — the reference slave skips queue messages missing the
    ``layer`` key (``/root/reference/tilecloud_chain/generate.py:278-283``);
    here the queue is the Dataset and the message key is a nullable
    column."""
    return ds.map_batches(
        lambda b: b.filter(b[layer_col].is_valid()), batch_format="pyarrow"
    )
