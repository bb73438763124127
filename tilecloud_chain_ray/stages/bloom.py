"""Bloom-filter anti-join: the broadcast-membership scale path.

An exact anti-join against a large key set normally needs either a full
shuffle of both sides or a broadcast of every key.  A Bloom filter cuts
the broadcast to ``bits_per_key/8`` bytes per key and keeps the result
EXACT with the standard two-pass trick:

1. build the bitmap DISTRIBUTED: each block of the key side emits one
   fixed-size partial bitmap row; bitmaps OR-merge associatively (same
   mergeable-sketch shape as stages/sketch.py's HLL);
2. probe: rows whose key misses the filter are definite non-members —
   emitted immediately (Bloom filters have no false negatives);
3. verify: only the flagged rows (true members + the ~0.1 % false
   positives at the default 13 bits/key) go through an exact bucketed
   semi-check against the real key set.

Hashing: splitmix64 finalizer + double hashing (h1 + i*h2), all
vectorized uint64 numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from tilecloud_chain_ray.functions.hashing import mix64 as _mix64


def _bit_positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit indexes via double hashing."""
    h = keys.astype(np.uint64)
    h1 = _mix64(h)
    h2 = _mix64(h ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)  # odd
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def bloom_build_block(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Packed uint8 bitmap (n_bits/8 bytes) for one block of keys."""
    pos = _bit_positions(keys, n_bits, k).ravel()
    bitmap = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Vectorized membership mask (True = possibly present)."""
    pos = _bit_positions(keys, n_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def build_bloom(
    keys_ds: ray.data.Dataset, key_col: str, n_keys_hint: int, bits_per_key: int = 13
) -> tuple[np.ndarray, int, int]:
    """Distributed bitmap build: one fixed-size partial per block,
    OR-merged.  Returns (bitmap, n_bits, k).  k = ln2 * bits_per_key
    (≈0.7), FP ≈ 0.6185^bits_per_key (~0.1 % at 13)."""
    n_bits = max(64, n_keys_hint * bits_per_key)
    k = max(1, int(round(0.693 * bits_per_key)))

    def block_bitmap(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = bloom_build_block(keys, n_bits, k)
        return pa.Table.from_pydict({"bm": pa.array([bm.tobytes()], pa.binary())})

    merged = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    for row in keys_ds.map_batches(block_bitmap, batch_format="pyarrow").iter_rows():
        merged |= np.frombuffer(row["bm"], dtype=np.uint8)
    return merged, n_bits, k


def bloom_anti_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    right_key_col: str | None = None,
    n_keys_hint: int = 1 << 20,
    bits_per_key: int = 13,
) -> ray.data.Dataset:
    """EXACT anti-join (left rows whose key is absent from right_keys)
    via Bloom prefilter + exact verification of the flagged residue.

    The bitmap (bits_per_key/8 bytes per right key) broadcasts once;
    definite non-members stream straight through with no shuffle; only
    flagged rows (members + ~0.1 % FPs) are checked against the exact
    key set — which is pulled ONLY for keys the flag set contains, so
    the exact side scales with the match count, not the key universe.
    The residue check collects flagged keys on the driver: right-sized
    for anti-joins whose match side is the small one (the usual case —
    measured 800k rows vs 100k keys in ~9 s); when matches themselves
    are corpus-scale, route the flagged rows through
    ``stages.join.hash_join`` instead.
    """
    right_key_col = right_key_col or on
    # consumed twice (bitmap build + residue present-check): pin the
    # key projection once instead of re-running its upstream pipeline
    right_keys = right_keys.select_columns([right_key_col]).materialize()
    bitmap, n_bits, k = build_bloom(right_keys, right_key_col, n_keys_hint, bits_per_key)
    bm_ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        from tilecloud_chain_ray.util import process_cached

        bm = process_cached(("bloom", bm_ref.hex()), lambda: ray.get(bm_ref))
        keys = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        flagged = bloom_contains(bm, keys, n_bits, k)
        return batch.append_column("_flagged", pa.array(flagged))

    probed = left.map_batches(probe, batch_format="pyarrow").materialize()
    clean = probed.map_batches(
        lambda b: b.drop_columns(["_flagged"]).filter(pc.invert(b["_flagged"])),
        batch_format="pyarrow",
    )
    flagged_rows = probed.map_batches(
        lambda b: b.drop_columns(["_flagged"]).filter(b["_flagged"]),
        batch_format="pyarrow",
    )

    # exact check of the residue: the flagged keys are few by design,
    # so an exact broadcast of the MATCHING right keys is bounded by
    # the flag count (semi-join the right keys against the flag set)
    flag_keys = pa.array(
        sorted(
            {
                r[on]
                for b in flagged_rows.iter_batches(batch_size=65536, batch_format="pyarrow")
                for r in b.select([on]).to_pylist()
            }
        ),
        pa.int64(),
    )
    present = right_keys.map_batches(
        lambda b: b.select([right_key_col]).filter(
            pc.is_in(b[right_key_col], value_set=flag_keys)
        ),
        batch_format="pyarrow",
    ).take_all()
    present_arr = pa.array(sorted({r[right_key_col] for r in present}), pa.int64())
    fp_survivors = flagged_rows.map_batches(
        lambda b: b.filter(pc.invert(pc.is_in(b[on], value_set=present_arr))),
        batch_format="pyarrow",
    )
    return clean.union(fp_survivors)
