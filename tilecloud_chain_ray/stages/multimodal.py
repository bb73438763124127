"""Multimodal columns: decode / feature-extract / resize / frame-sample
stages over opaque ``binary`` payload columns.

The Ray-side plumbing (schemas, actor-pool batch signatures, bounded
batch sizes for wide binary rows, output layout) is real and tested;
the codec itself is stubbed: no image/audio libraries exist in this
container, so ``codec="raw"`` interprets payloads as our deterministic
synthetic format, and any other codec raises ``NotImplementedError``
with the intended library call named — swap in PIL/torchaudio on a
real cluster.

Synthetic payload format (matches ``sources.pages`` html bytes): the
first 8 bytes are (height uint16, width uint16, channels uint16,
reserved uint16) little-endian, followed by h*w*c uint8 samples
(truncated/zero-padded as needed) — enough structure to exercise
decode -> resize -> feature pipelines deterministically.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image | audio | video
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic opaque payloads with typed metadata."""
    rng = np.random.default_rng(seed)
    payloads, widths, heights, durations = [], [], [], []
    for i in range(n):
        h = int(rng.integers(8, 33))
        w = int(rng.integers(8, 33))
        c = 3
        body = rng.integers(0, 256, h * w * c, dtype=np.uint8).tobytes()
        payloads.append(struct.pack("<HHHH", h, w, c, 0) + body)
        widths.append(w)
        heights.append(h)
        durations.append(int(rng.integers(1000, 60000)) if kind != "image" else 0)
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array([kind] * n, pa.string()),
            "meta_width": pa.array(widths, pa.int32()),
            "meta_height": pa.array(heights, pa.int32()),
            "meta_duration_ms": pa.array(durations, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_raw(payload: bytes) -> np.ndarray:
    h, w, c, _ = struct.unpack_from("<HHHH", payload)
    body = np.frombuffer(payload, dtype=np.uint8, offset=8)
    need = h * w * c
    if len(body) < need:
        body = np.concatenate([body, np.zeros(need - len(body), dtype=np.uint8)])
    return body[:need].reshape(h, w, c)


class MediaDecoder:
    """Actor-pool decode stage.  State (codec tables / model weights in a
    real deployment) loads once per actor; batches stay SMALL because a
    decoded batch is ~batch_size * h * w * c bytes — callers pass
    ``batch_size`` explicitly (wide-binary guidance in the ray guide).
    """

    def __init__(self, codec: str = "raw") -> None:
        if codec != "raw":
            raise NotImplementedError(
                f"codec {codec!r}: this container has no image/audio libs; "
                "wire PIL.Image.open / soundfile.read here on a real cluster"
            )
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.empty(batch.num_rows, dtype=np.float64)
        shapes_h = np.empty(batch.num_rows, dtype=np.int32)
        shapes_w = np.empty(batch.num_rows, dtype=np.int32)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            arr = _decode_raw(payload)
            means[i] = float(arr.mean())
            shapes_h[i], shapes_w[i] = arr.shape[0], arr.shape[1]
        out = batch.drop_columns(["payload"])  # decoded features replace the blob
        out = out.append_column("decoded_h", pa.array(shapes_h, pa.int32()))
        out = out.append_column("decoded_w", pa.array(shapes_w, pa.int32()))
        return out.append_column("mean_intensity", pa.array(means, pa.float64()))


class MediaResizer:
    """Resize stage: nearest-neighbor to (target, target); re-encodes the
    synthetic format so downstream stages see the same schema."""

    def __init__(self, target: int = 16) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        out_payloads = []
        for payload in batch["payload"].to_pylist():
            arr = _decode_raw(payload)
            h, w, c = arr.shape
            yi = (np.arange(t) * h // t).clip(0, h - 1)
            xi = (np.arange(t) * w // t).clip(0, w - 1)
            resized = arr[yi][:, xi]
            out_payloads.append(struct.pack("<HHHH", t, t, c, 0) + resized.tobytes())
        cols = dict(zip(batch.schema.names, batch.columns))
        cols["payload"] = pa.array(out_payloads, pa.binary())
        cols["meta_width"] = pa.array([t] * batch.num_rows, pa.int32())
        cols["meta_height"] = pa.array([t] * batch.num_rows, pa.int32())
        return pa.Table.from_pydict(cols)


class FrameSampler:
    """Video frame-sample stage stub: emits ``n_frames`` rows per input
    (one per sampled timestamp) — the row-expansion plumbing is real."""

    def __init__(self, n_frames: int = 4) -> None:
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.n_frames
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), k)
        out = batch.take(pa.array(idx))
        frame_no = np.tile(np.arange(k, dtype=np.int64), batch.num_rows)
        durations = batch["meta_duration_ms"].to_numpy(zero_copy_only=False)
        ts = (durations[idx // k] * (frame_no + 1)) // (k + 1)
        out = out.append_column("frame_no", pa.array(frame_no, pa.int64()))
        return out.append_column("frame_ts_ms", pa.array(ts.astype(np.int64), pa.int64()))


def decode_media(
    ds: ray.data.Dataset,
    codec: str = "raw",
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
