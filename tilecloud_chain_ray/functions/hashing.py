"""Deterministic hashing for geocoding, sharding and dedup.

* ``micro_from_ids`` — integer multiplicative hash of an int64 key into
  two uint32 "micro coordinates" (fixed-point position in the grid
  bbox).  Pure int64 arithmetic so the DuckDB oracle can reproduce it
  exactly:  ``ux = (id * 2654435761) % 4294967296``.
* ``micro_from_strings`` — crc32-based (zlib, C speed) for string keys
  (urls); no SQL equivalent -> rows-only oracle checks.
* ``sha1_bytes`` — per-row sha1 of binary columns (the empty-tile hash
  drop, ``/root/reference/tilecloud_chain/__init__.py:2442-2493``).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

UX_MULT = 2654435761  # Knuth multiplicative constant (2^32 * phi)
UY_MULT = 2246822519  # xxhash prime2
UY_OFFSET = 1013904223  # Numerical Recipes LCG increment
MICRO = 4294967296  # 2^32


def micro_from_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 ids -> (ux, uy) uint32 micro coords, SQL-reproducible."""
    ids = ids.astype(np.int64)
    ux = (ids * UX_MULT) % MICRO
    uy = (ids * UY_MULT + UY_OFFSET) % MICRO
    return ux.astype(np.uint64), uy.astype(np.uint64)


def micro_from_strings(values: pa.Array | list[str]) -> tuple[np.ndarray, np.ndarray]:
    """utf8 strings -> (ux, uy) via crc32 (deterministic, C speed).

    The y hash prepends a salt to the *message* (a different crc INIT
    value is useless: crc is affine, so same-length inputs would give
    uy = ux ^ const and every point would land on a diagonal), and both
    axes get a multiplicative finalizer to break crc's linearity in the
    high bits.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    ux = np.empty(len(values), dtype=np.uint64)
    uy = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        ux[i] = zlib.crc32(b)
        uy[i] = zlib.crc32(b"\x9e\x37\x79\xb9" + b)
    ux = (ux * np.uint64(UX_MULT)) & np.uint64(0xFFFFFFFF)
    uy = (uy * np.uint64(UY_MULT) + np.uint64(UY_OFFSET)) & np.uint64(0xFFFFFFFF)
    return ux, uy


def micro_to_map(
    ux: np.ndarray, uy: np.ndarray, bbox: tuple[float, float, float, float]
) -> tuple[np.ndarray, np.ndarray]:
    """Micro coords -> map coords: x from the left, y from the *top*
    (y grows downward in micro space, matching tile rows)."""
    fx = ux.astype(np.float64) / MICRO
    fy = uy.astype(np.float64) / MICRO
    x = bbox[0] + fx * (bbox[2] - bbox[0])
    y = bbox[3] - fy * (bbox[3] - bbox[1])
    return x, y


def micro_tile(ux: np.ndarray, uy: np.ndarray, width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile (col, row) assignment in exact integer arithmetic.

    ``(ux * width) // 2^32`` — reproducible in SQL as integer division;
    equals ``floor(frac * width)`` without float rounding hazards.
    """
    tx = (ux.astype(np.int64) * width) // MICRO
    ty = (uy.astype(np.int64) * height) // MICRO
    return tx, ty


def sha1_bytes(data: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, list[bytes]]:
    """Per-row (size, sha1 hex) of a binary column."""
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    sizes = np.empty(len(data), dtype=np.int64)
    hashes: list[bytes] = []
    for i in range(len(data)):
        v = data[i].as_py()
        if v is None:
            sizes[i] = 0
            hashes.append(b"")
        else:
            sizes[i] = len(v)
            hashes.append(hashlib.sha1(v).hexdigest().encode())
    return sizes, hashes


def mix64(h: "np.ndarray") -> "np.ndarray":
    """splitmix64 finalizer (public-domain constants) — the engine's
    shared 64-bit scrambler (HLL sketches, Bloom filters)."""
    h = h.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))
