"""Mergeable sketches: HyperLogLog approximate distinct count.

The guide's sketch pattern: each batch emits ONE serialized sketch row;
sketches merge associatively (register-wise max), so the reduce is a
tiny tree regardless of input size — the approximate companion to
``stages/distinct.grouped_distinct_counts`` for when exactness can be
traded for a fixed-size shuffle (standard HyperLogLog, Flajolet et al.,
public algorithm).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _hll_registers(keys: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL registers (2^p uint8) for int64 keys."""
    from tilecloud_chain_ray.functions.hashing import mix64

    m = 1 << p
    h = mix64(keys)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    # rank = position of first 1-bit in the remaining 64-p bits (1-based)
    bits = 64 - p
    rank = np.full(len(h), bits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for b in range(bits):
        hit = ~found & (((w >> np.uint64(b)) & np.uint64(1)) == 1)
        rank[hit] = b + 1
        found |= hit
    registers = np.zeros(m, dtype=np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def _hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) (int64 column), ±~1.04/sqrt(2^p).

    One fixed-size (2^p bytes) sketch row per block crosses the wire;
    the merge is register-wise max on the driver.
    """

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        regs = _hll_registers(keys, p)
        return pa.Table.from_pydict({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in sketches.iter_rows():
        merged = np.maximum(merged, np.asarray(row["regs"], dtype=np.uint8))
    return _hll_estimate(merged)


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT key) PER GROUP: one fixed-size sketch
    row per (block, group) crosses the wire, sketches merge by
    register-wise max inside a per-group ``map_groups`` — the scale
    path for distinct-user-style rollups where the exact bundled
    shuffle (stages/distinct.py) would move every key.
    """
    import pandas as pd

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pylist(),
                "k": batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        groups, regs = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            regs.append(_hll_registers(sub["k"].to_numpy(), p).tolist())
        return pa.Table.from_pydict(
            {
                group_col: pa.array(groups),
                "regs": pa.array(regs, pa.list_(pa.uint8())),
            }
        )

    def merge(group: "pd.DataFrame") -> "pd.DataFrame":
        merged = np.zeros(1 << p, dtype=np.uint8)
        for r in group["regs"]:
            merged = np.maximum(merged, np.asarray(r, dtype=np.uint8))
        return pd.DataFrame(
            {
                group_col: [group[group_col].iloc[0]],
                out_col: [int(round(_hll_estimate(merged)))],
            }
        )

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow")
    return sketches.groupby(group_col).map_groups(merge, batch_format="pandas")
