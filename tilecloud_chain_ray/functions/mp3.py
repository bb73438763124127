"""MP3 (MPEG audio Layer III) frame-level demuxer + synthesizer, from
the public MPEG-1/2 audio frame-header layout.  No external media
libraries.

Scope: what a data pipeline needs without a PCM decoder — walk the
frame headers (sync + bitrate/samplerate tables + padding), skip ID3v2
tags, and derive duration / bitrate / frame boundaries; frame-accurate
sampling slices whole encoded frames by byte range.  Decoding frames
to PCM (Huffman + IMDCT + synthesis filterbank) stays stubbed — see
``stages/multimodal._STUBBED``.

``encode_mp3`` emits structurally valid frames (correct headers,
deterministic filler side-info/main data) so the demux path is
roundtrip-testable byte-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

# MPEG-1 Layer III bitrates (kbps), index 1..14; 0 = free, 15 = bad
_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
# MPEG-2 / 2.5 Layer III
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}


@dataclass
class Mp3Frame:
    offset: int
    length: int
    sample_rate: int
    bitrate_kbps: int
    samples: int  # samples per frame (1152 MPEG-1 L3, 576 MPEG-2/2.5)
    channels: int


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        size = (size << 7) | (b & 0x7F)
    return 10 + size


def _parse_header(payload: bytes, pos: int) -> Mp3Frame | None:
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3  # 3 = mono
    if version == 3:
        bitrate = _BITRATES_V1_L3[bitrate_idx]
        samples, coeff = 1152, 144
    else:
        bitrate = _BITRATES_V2_L3[bitrate_idx]
        samples, coeff = 576, 72
    sample_rate = _RATES[version][rate_idx]
    length = coeff * bitrate * 1000 // sample_rate + padding
    return Mp3Frame(pos, length, sample_rate, bitrate, samples, 1 if mode == 3 else 2)


def parse_mp3_frames(payload: bytes, max_frames: int | None = None) -> list[Mp3Frame]:
    """Walk the frame chain from the first valid header (after any
    ID3v2 tag).  A torn / garbage tail ends the walk — same tolerance
    real demuxers apply."""
    frames: list[Mp3Frame] = []
    pos = _id3v2_size(payload)
    # resync: scan forward to the first valid header
    while pos + 4 <= len(payload):
        frame = _parse_header(payload, pos)
        if frame is not None:
            break
        pos += 1
    while pos + 4 <= len(payload):
        frame = _parse_header(payload, pos)
        if frame is None or pos + frame.length > len(payload):
            break
        frames.append(frame)
        pos += frame.length
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames


def mp3_info(payload: bytes) -> dict:
    """Typed metadata: duration from the frame chain (sample-accurate
    for CBR and VBR alike), average bitrate, channel count."""
    frames = parse_mp3_frames(payload)
    if not frames:
        return {"duration_ms": 0, "sample_rate": 0, "bitrate_kbps": 0, "n_frames": 0, "channels": 0}
    total_samples = sum(f.samples for f in frames)
    sr = frames[0].sample_rate
    return {
        "duration_ms": int(total_samples * 1000 // sr),
        "sample_rate": sr,
        "bitrate_kbps": int(round(sum(f.bitrate_kbps for f in frames) / len(frames))),
        "n_frames": len(frames),
        "channels": frames[0].channels,
    }


def sample_mp3_frames(payload: bytes, k: int) -> list[tuple[int, int, bytes]]:
    """Evenly sample up to ``k`` whole encoded frames: returns
    (frame_index, timestamp_ms, frame_bytes) triples."""
    frames = parse_mp3_frames(payload)
    n = len(frames)
    if not n:
        return []
    k = min(k, n)
    picks = sorted({(i * n) // k for i in range(k)})
    out = []
    t = 0
    ts = []
    for f in frames:
        ts.append(t)
        t += f.samples * 1000 // f.sample_rate
    for i in picks:
        f = frames[i]
        out.append((i, ts[i], payload[f.offset : f.offset + f.length]))
    return out


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    seed: int = 0,
    id3_comment: bytes | None = None,
) -> bytes:
    """Structurally valid MPEG-1 Layer III CBR stream: correct headers,
    deterministic filler bytes as frame payload (silence-equivalent for
    demux purposes).  Optionally prefixed with a minimal ID3v2 tag."""
    try:
        bitrate_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    except ValueError as exc:
        raise ValueError(f"unsupported MPEG-1 L3 bitrate {bitrate_kbps}") from exc
    try:
        rate_idx = _RATES[3].index(sample_rate)
    except ValueError as exc:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}") from exc
    out = bytearray()
    if id3_comment is not None:
        body = b"COMM" + len(id3_comment).to_bytes(4, "big") + b"\x00\x00" + id3_comment
        size = len(body)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + syncsafe + body
    for i in range(n_frames):
        padding = 0  # CBR at table rates divides evenly for 44100 only via padding pattern; keep 0
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # sync, MPEG-1, Layer III, no CRC
        b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
        b3 = (0 << 6) | 0  # stereo
        header = bytes([0xFF, b1, b2, b3])
        length = 144 * bitrate_kbps * 1000 // sample_rate + padding
        filler = bytes(((seed + i + j) * 31 + 7) & 0xFF for j in range(length - 4))
        out += header + filler
    return bytes(out)
