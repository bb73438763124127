"""Exact grouped distinct-count with a bundled shuffle.

``groupby(group, key).count()`` over high-cardinality keys makes the
engine sort one row per (group, key) — for a z-14 pyramid that is one
row per occupied tile (~10^8 at scale) through a sort shuffle.  This
operator ships the same information as ~``n_batches * n_groups *
n_buckets`` rows, each carrying a SORTED UNIQUE int64 key array:

1. per input batch: unique keys per (group, hash-bucket) -> one list row,
2. groupby (group, bucket): merge arrays with np.unique(concat) -> one
   partial-count row per (group, bucket),
3. groupby (group): Sum the partials.

The heavy payload crosses the wire once, in columnar list blocks, and
the sort only orders thousands of bundle rows.  Measured on the 800k-
page z0-14 pyramid: 62 s (row-per-key aggregate) -> ~8 s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from tilecloud_chain_ray.util import default_buckets


def grouped_distinct_counts(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    n_buckets: int | None = None,
    count_col: str = "n_distinct",
    rows_col: str = "n_rows",
    shuffle_blocks: int | None = None,
) -> ray.data.Dataset:
    """Per-group exact distinct(key) + row counts.

    Returns (group_col, n_distinct, n_rows).  Key column must be int64.

    ``shuffle_blocks`` coalesces the bundle rows before the groupby:
    the shuffle key-space is bounded (n_groups x n_buckets), so the
    sort exchange never needs more width than that — narrowing it from
    "one block per input block" cuts the exchange's fixed overhead
    (measured 2.45 s -> 1.85 s on the z0-14 pyramid at sf0.1) without
    moving any extra bytes.  Default: n_buckets // 4, floor 8.
    """
    if n_buckets is None:
        n_buckets = default_buckets()
    if shuffle_blocks is None:
        shuffle_blocks = max(8, n_buckets // 4)

    def bundle(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (k ^ (k >> np.int64(31))) % n_buckets
        # single packed shuffle key (g * n_buckets + b): Ray's sort-based
        # groupby is measurably faster on one int64 column than on two
        gb = g * n_buckets + bucket
        # fully vectorized: one lexsort orders by (gb, k); consecutive
        # deduplication yields the per-cell sorted-unique key arrays,
        # wrapped as a ListArray over the values buffer (no Python loop
        # over the up-to n_groups x n_buckets cells, no tolist copies)
        order = np.lexsort((k, gb))
        gs, ks = gb[order], k[order]
        n = len(gs)
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "gb": pa.array([], pa.int64()),
                    "keys": pa.array([], pa.list_(pa.int64())),
                    "rows": pa.array([], pa.int64()),
                }
            )
        pair_new = np.empty(n, dtype=bool)
        pair_new[0] = True
        pair_new[1:] = (gs[1:] != gs[:-1]) | (ks[1:] != ks[:-1])
        uniq_gb = gs[pair_new]
        uniq_k = ks[pair_new]
        cell_new = np.empty(len(uniq_gb), dtype=bool)
        cell_new[0] = True
        cell_new[1:] = uniq_gb[1:] != uniq_gb[:-1]
        cell_starts = np.flatnonzero(cell_new)
        offsets = np.append(cell_starts, len(uniq_k)).astype(np.int32)
        rows_gb = uniq_gb[cell_starts]
        # total input rows per cell: run lengths over the sorted gb
        gb_starts = np.flatnonzero(
            np.concatenate(([True], gs[1:] != gs[:-1]))
        )
        rows_n = np.diff(np.append(gb_starts, n))
        keys_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(uniq_k, pa.int64())
        )
        return pa.Table.from_pydict(
            {
                "gb": pa.array(rows_gb, pa.int64()),
                "keys": keys_arr,
                "rows": pa.array(rows_n, pa.int64()),
            }
        )

    bundles = ds.map_batches(bundle, batch_format="pyarrow").repartition(
        shuffle_blocks, shuffle=False
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        arrays = [np.asarray(a, dtype=np.int64) for a in group["keys"]]
        distinct = len(np.unique(np.concatenate(arrays))) if arrays else 0
        return pd.DataFrame(
            {
                "g": [int(group["gb"].iloc[0]) // n_buckets],
                "nd": [distinct],
                "nr": [int(group["rows"].sum())],
            }
        )

    partials = bundles.groupby("gb").map_groups(merge, batch_format="pandas")
    out = partials.groupby("g").aggregate(
        Sum("nd", alias_name=count_col), Sum("nr", alias_name=rows_col)
    )
    return out.map_batches(
        lambda b: b.rename_columns([group_col, count_col, rows_col]),
        batch_format="pyarrow",
    )
