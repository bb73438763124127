"""Real PNG/WAV codecs for the multimodal stages (public-spec
implementations, no media libraries)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from tilecloud_chain_ray.functions.png import decode_png, encode_png
from tilecloud_chain_ray.functions.wav import decode_wav, encode_wav
from tilecloud_chain_ray.stages.multimodal import (
    MediaDecoder,
    MediaResizer,
    synthesize_media,
)


def make_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Encode with arbitrary per-scanline filters (spec forward filter) —
    exercises the decoder paths our own encoder (filter 0 only) never
    produces."""
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    prev = np.zeros(w * c, dtype=np.int64)
    lines = []
    for row in range(h):
        raw = img[row].reshape(-1).astype(np.int64)
        f = filters[row % len(filters)]
        filt = raw.copy()
        for x in range(w * c):
            a = raw[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
            filt[x] = (raw[x] - pred) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = raw

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_png_all_filters_and_color_types(channels, filters):
    rng = np.random.default_rng(channels * 10 + filters[0])
    img = rng.integers(0, 256, (9, 7, channels), dtype=np.uint8)
    data = make_png(img, filters)
    out = decode_png(data)
    assert out.shape == img.shape
    assert (out == img).all()


def test_encode_decode_roundtrip_rgba():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 11, 4), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(6)
    mono = rng.integers(-30000, 30000, 500).astype(np.int16)
    rate, back = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (back == mono).all()
    stereo = rng.integers(-30000, 30000, (300, 2)).astype(np.int16)
    rate, back = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and back.shape == (300, 2) and (back == stereo).all()


@pytest.mark.usefixtures("ray_session")
def test_media_decoder_png_real():
    table = synthesize_media(20, codec="png")
    out = MediaDecoder(codec="png")(table)
    assert out.num_rows == 20
    h = out["decoded_h"].to_numpy(zero_copy_only=False)
    w = out["decoded_w"].to_numpy(zero_copy_only=False)
    assert (h == table["meta_height"].to_numpy(zero_copy_only=False)).all()
    assert (w == table["meta_width"].to_numpy(zero_copy_only=False)).all()


@pytest.mark.usefixtures("ray_session")
def test_media_decoder_wav_real():
    table = synthesize_media(10, kind="audio", codec="wav")
    out = MediaDecoder(codec="wav")(table)
    assert set(out.column_names) >= {"sample_rate", "n_samples", "rms"}
    assert (out["sample_rate"].to_numpy(zero_copy_only=False) == 16000).all()
    assert (out["rms"].to_numpy(zero_copy_only=False) > 0).all()


def test_media_resizer_png_bilinear():
    table = synthesize_media(5, codec="png")
    out = MediaResizer(target=12, codec="png", method="bilinear")(table)
    for payload in out["payload"].to_pylist():
        img = decode_png(payload)
        assert img.shape == (12, 12, 4)


def test_unavailable_codec_steps_raise():
    """Only the codec-proper decode steps (PCM, pixels) stay stubbed;
    metadata + frame demux for mp3/mp4 are real (tests below)."""
    with pytest.raises(NotImplementedError, match="PCM"):
        MediaDecoder(codec="mp3", to_pcm=True)
    with pytest.raises(NotImplementedError, match="pixel"):
        MediaDecoder(codec="mp4", to_pixels=True)
    with pytest.raises(NotImplementedError):
        MediaDecoder(codec="avif")


def test_mp3_metadata_decode_and_frame_sampling():
    from tilecloud_chain_ray.functions.mp3 import parse_mp3_frames
    from tilecloud_chain_ray.stages.multimodal import FrameSampler

    table = synthesize_media(6, kind="audio", codec="mp3", seed=3)
    out = MediaDecoder(codec="mp3")(table)
    assert (out["sample_rate"].to_numpy(zero_copy_only=False) == 44100).all()
    assert (out["bitrate_kbps"].to_numpy(zero_copy_only=False) == 128).all()
    # duration derived from the frame chain matches the synthesized meta
    assert (
        out["duration_ms"].to_numpy(zero_copy_only=False)
        == table["meta_duration_ms"].to_numpy(zero_copy_only=False)
    ).all()

    sampled = FrameSampler(n_frames=5, container="mp3")(table)
    payloads = table["payload"].to_pylist()
    n_frames = out["n_frames"].to_numpy(zero_copy_only=False)
    # row expansion: min(k, n_frames) rows per input
    assert sampled.num_rows == int(np.minimum(5, n_frames).sum())
    # each sampled frame is byte-identical to the frame in the stream
    by_media = {}
    for row in sampled.to_pylist():
        by_media.setdefault(row["media_id"], []).append(row)
    for mid, rows in by_media.items():
        frames = parse_mp3_frames(payloads[mid])
        for row in rows:
            f = frames[row["frame_no"]]
            assert row["frame_payload"] == payloads[mid][f.offset : f.offset + f.length]
            assert row["frame_payload"][:2] == b"\xff\xfb"


def test_mp4_metadata_decode_and_frame_sampling():
    from tilecloud_chain_ray.functions.mp4 import sample_mp4_frames
    from tilecloud_chain_ray.stages.multimodal import FrameSampler

    table = synthesize_media(6, kind="video", codec="mp4", seed=4)
    out = MediaDecoder(codec="mp4")(table)
    assert (
        out["decoded_w"].to_numpy(zero_copy_only=False)
        == table["meta_width"].to_numpy(zero_copy_only=False)
    ).all()
    assert (
        out["duration_ms"].to_numpy(zero_copy_only=False)
        == table["meta_duration_ms"].to_numpy(zero_copy_only=False)
    ).all()
    assert all(c == "raw " for c in out["sample_codec"].to_pylist())

    sampled = FrameSampler(n_frames=3, container="mp4")(table)
    payloads = table["payload"].to_pylist()
    for row in sampled.to_pylist():
        expected = dict(
            (i, (t, d)) for i, t, d in sample_mp4_frames(payloads[row["media_id"]], 3)
        )
        t, d = expected[row["frame_no"]]
        assert row["frame_ts_ms"] == t and row["frame_payload"] == d


# --- baseline JPEG (functions/jpeg.py, ITU-T.81 from scratch) -----------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [yy * 255 // max(h - 1, 1), xx * 255 // max(w - 1, 1),
         (yy + xx) * 255 // max(h + w - 2, 1)], axis=-1
    ).astype(np.uint8)


def test_jpeg_solid_color_exact():
    from tilecloud_chain_ray.functions.jpeg import decode_jpeg, encode_jpeg

    for sub in ("444", "420"):
        img = np.full((20, 28, 3), 77, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
        assert dec.shape == (20, 28, 3)
        assert np.abs(dec.astype(int) - 77).max() == 0, sub


def test_jpeg_gradient_roundtrip_within_idct_tolerance():
    from tilecloud_chain_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(33, 41)  # non-multiple-of-8/16 dims exercise padding
    for sub, tol in (("444", 4), ("420", 12)):
        dec = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert dec.shape == img.shape
        assert err.mean() < tol / 2 and err.max() <= tol, (sub, err.mean(), err.max())


def test_jpeg_noise_and_grayscale():
    from tilecloud_chain_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 95))
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8  # q95 noise bound
    gray = _gradient(32, 40)[..., 0]
    dg = decode_jpeg(encode_jpeg(gray, 90))
    assert dg.shape == (32, 40)
    assert np.abs(dg.astype(int) - gray.astype(int)).mean() < 1.0


def test_media_decoder_and_resizer_jpeg_real():
    table = synthesize_media(8, codec="jpeg")
    out = MediaDecoder(codec="jpeg")(table)
    assert out["decoded_h"].to_numpy(zero_copy_only=False).tolist() == table[
        "meta_height"
    ].to_numpy(zero_copy_only=False).tolist()
    resized = MediaResizer(target=12, codec="jpeg", method="bilinear")(table)
    from tilecloud_chain_ray.functions.jpeg import decode_jpeg

    for payload in resized["payload"].to_pylist():
        img = decode_jpeg(payload)
        assert img.shape == (12, 12, 3)
