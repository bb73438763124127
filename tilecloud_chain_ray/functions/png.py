"""Minimal deterministic PNG codec (RGBA8, filter 0) — no PIL here.

Encoder output is byte-deterministic (fixed zlib level 6, no ancillary
chunks), which is what makes the constant empty-tile hash drop (M6)
well-defined for our renderer, the way MapServer's fixed output made the
reference's ``empty_tile_detection`` sha1 constants stable
(``/root/reference/tilecloud_chain/tests/tilegeneration/test-nosns.yaml:
110-128``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgba: np.ndarray) -> bytes:
    """(h, w, 4) uint8 -> PNG bytes (color type 6, bit depth 8)."""
    if rgba.dtype != np.uint8 or rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("expected (h, w, 4) uint8")
    h, w = rgba.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, w * 4 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rgba.reshape(h, w * 4)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (filters 0-2 tolerated)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 6:
                raise ValueError("only 8-bit RGBA supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 4 + 1
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    img = raw[:, 1:].astype(np.uint8).copy()
    if (filters == 0).all():
        return img.reshape(h, w, 4)
    # generic un-filtering (sub/up) for robustness
    px = img.reshape(h, w, 4).astype(np.int32)
    for row in range(h):
        f = filters[row]
        if f == 0:
            continue
        if f == 1:  # sub
            for col in range(1, w):
                px[row, col] = (px[row, col] + px[row, col - 1]) % 256
        elif f == 2:  # up
            if row > 0:
                px[row] = (px[row] + px[row - 1]) % 256
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return px.astype(np.uint8)


def is_uniform(rgba: np.ndarray) -> bool:
    """All pixels identical (the HashLogger uniformity check analog,
    ``/root/reference/tilecloud_chain/__init__.py:2590-2606``)."""
    flat = rgba.reshape(-1, rgba.shape[-1])
    return bool((flat == flat[0]).all())
