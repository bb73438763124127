"""Minimal ISO-BMFF (MP4) demuxer + synthesizer, from the public
ISO/IEC 14496-12 box structure.  No external media libraries.

Scope: what a data pipeline's frame-sample stage needs — walk the box
tree, read track metadata (dimensions, timescale, duration, sample
codec fourcc) and the sample tables (stts/stsz/stsc/stco|co64), and
slice individual encoded samples ("frames") out of ``mdat`` by byte
range with their presentation timestamps.  Decoding the sliced sample
payloads to pixels would need a real video codec and stays out of
scope (see ``stages/multimodal._STUBBED``).

``encode_mp4`` writes a tiny but structurally valid single-track file
(ftyp + moov + mdat, one chunk per sample, fourcc ``raw ``) so the
demux path is roundtrip-testable byte-exactly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the sibling boxes in
    buf[start:end]; handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"mp4: bad box size at offset {pos}")
        yield btype.decode("latin1"), pos + header, pos + size
        pos += size


_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


@dataclass
class Mp4Track:
    width: int = 0
    height: int = 0
    timescale: int = 0
    duration: int = 0  # in timescale units (mdhd)
    codec: str = ""
    sample_sizes: list = field(default_factory=list)
    sample_deltas: list = field(default_factory=list)  # per-sample durations
    chunk_offsets: list = field(default_factory=list)
    # stsc rows: (first_chunk, samples_per_chunk)
    sample_to_chunk: list = field(default_factory=list)


@dataclass
class Mp4Info:
    movie_timescale: int = 0
    movie_duration: int = 0
    tracks: list = field(default_factory=list)

    @property
    def duration_ms(self) -> int:
        if not self.movie_timescale:
            return 0
        return int(self.movie_duration * 1000 // self.movie_timescale)


def parse_mp4(payload: bytes) -> Mp4Info:
    info = Mp4Info()

    def walk(start: int, end: int, track: Mp4Track | None):
        for btype, b0, b1 in _iter_boxes(payload, start, end):
            if btype in _CONTAINERS:
                sub = Mp4Track() if btype == "trak" else track
                walk(b0, b1, sub)
                if btype == "trak":
                    info.tracks.append(sub)
            elif btype == "mvhd":
                version = payload[b0]
                if version == 1:
                    info.movie_timescale, info.movie_duration = struct.unpack_from(
                        ">IQ", payload, b0 + 20
                    )
                else:
                    info.movie_timescale, info.movie_duration = struct.unpack_from(
                        ">II", payload, b0 + 12
                    )
            elif btype == "tkhd" and track is not None:
                version = payload[b0]
                off = b0 + (88 if version == 1 else 76)
                w16, h16 = struct.unpack_from(">II", payload, off)
                track.width, track.height = w16 >> 16, h16 >> 16
            elif btype == "mdhd" and track is not None:
                version = payload[b0]
                if version == 1:
                    track.timescale, track.duration = struct.unpack_from(
                        ">IQ", payload, b0 + 20
                    )
                else:
                    track.timescale, track.duration = struct.unpack_from(
                        ">II", payload, b0 + 12
                    )
            elif btype == "stsd" and track is not None:
                (count,) = struct.unpack_from(">I", payload, b0 + 4)
                if count >= 1:
                    track.codec = payload[b0 + 12 : b0 + 16].decode("latin1")
            elif btype == "stts" and track is not None:
                (count,) = struct.unpack_from(">I", payload, b0 + 4)
                for i in range(count):
                    n, delta = struct.unpack_from(">II", payload, b0 + 8 + 8 * i)
                    track.sample_deltas.extend([delta] * n)
            elif btype == "stsz" and track is not None:
                uniform, count = struct.unpack_from(">II", payload, b0 + 4)
                if uniform:
                    track.sample_sizes = [uniform] * count
                else:
                    track.sample_sizes = list(
                        struct.unpack_from(f">{count}I", payload, b0 + 12)
                    )
            elif btype == "stsc" and track is not None:
                (count,) = struct.unpack_from(">I", payload, b0 + 4)
                for i in range(count):
                    first, per, _desc = struct.unpack_from(">III", payload, b0 + 8 + 12 * i)
                    track.sample_to_chunk.append((first, per))
            elif btype == "stco" and track is not None:
                (count,) = struct.unpack_from(">I", payload, b0 + 4)
                track.chunk_offsets = list(struct.unpack_from(f">{count}I", payload, b0 + 8))
            elif btype == "co64" and track is not None:
                (count,) = struct.unpack_from(">I", payload, b0 + 4)
                track.chunk_offsets = list(struct.unpack_from(f">{count}Q", payload, b0 + 8))

    walk(0, len(payload), None)
    return info


def _sample_layout(track: Mp4Track) -> list[tuple[int, int]]:
    """Flatten stsc/stco/stsz into one (file_offset, size) per sample."""
    out: list[tuple[int, int]] = []
    n_chunks = len(track.chunk_offsets)
    if not n_chunks or not track.sample_sizes:
        return out
    # expand stsc runs to per-chunk sample counts
    per_chunk = []
    rows = track.sample_to_chunk or [(1, len(track.sample_sizes))]
    for i, (first, per) in enumerate(rows):
        last = rows[i + 1][0] - 1 if i + 1 < len(rows) else n_chunks
        per_chunk.extend([per] * (last - first + 1))
    si = 0
    for ci, chunk_off in enumerate(track.chunk_offsets):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(track.sample_sizes):
                return out
            size = track.sample_sizes[si]
            out.append((off, size))
            off += size
            si += 1
    return out


def mp4_info(payload: bytes) -> dict:
    """Typed metadata for the pipeline's media table."""
    info = parse_mp4(payload)
    video = next((t for t in info.tracks if t.width), None) or (
        info.tracks[0] if info.tracks else Mp4Track()
    )
    return {
        "duration_ms": info.duration_ms,
        "width": video.width,
        "height": video.height,
        "codec": video.codec,
        "n_samples": len(video.sample_sizes),
    }


def sample_mp4_frames(payload: bytes, k: int) -> list[tuple[int, int, bytes]]:
    """Evenly sample up to ``k`` encoded samples from the first video
    track: returns (sample_index, timestamp_ms, sample_bytes) triples.
    The bytes are the track's encoded sample payloads sliced straight
    out of ``mdat`` — real demux-level frame sampling."""
    info = parse_mp4(payload)
    track = next((t for t in info.tracks if t.width), None) or (
        info.tracks[0] if info.tracks else None
    )
    if track is None or not track.sample_sizes or not track.timescale:
        return []
    layout = _sample_layout(track)
    n = len(layout)
    k = min(k, n)
    # cumulative decode times from stts
    ts = [0]
    for d in track.sample_deltas[: n - 1]:
        ts.append(ts[-1] + d)
    picks = sorted({(i * n) // k for i in range(k)}) if k else []
    out = []
    for i in picks:
        off, size = layout[i]
        t_ms = int(ts[i] * 1000 // track.timescale) if i < len(ts) else 0
        out.append((i, t_ms, payload[off : off + size]))
    return out


# -- synthesizer -----------------------------------------------------------


def _box(btype: str, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype.encode("latin1")) + body


def encode_mp4(
    frames: list[bytes], width: int, height: int, fps: int = 10, timescale: int = 1000
) -> bytes:
    """Structurally valid single-track MP4 (fourcc ``raw ``): one chunk
    per sample, sample data in ``mdat``.  Deterministic; used by the
    synthesizer and the demux roundtrip tests."""
    n = len(frames)
    delta = timescale // fps
    duration = n * delta

    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    mvhd = _box(
        "mvhd",
        struct.pack(">BxxxII", 0, 0, 0)  # version/flags, ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        "tkhd",
        struct.pack(">BBBB", 0, 0, 0, 7)  # version, flags=enabled|in movie|preview
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)  # ctime mtime id rsvd dur
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer group volume rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        "mdhd",
        struct.pack(">BxxxII", 0, 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        "hdlr", struct.pack(">Bxxx", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"graft\x00"
    )
    sample_entry = (
        struct.pack(">I4s", 86, b"raw ")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table
    )
    stsd = _box("stsd", struct.pack(">BxxxI", 0, 1) + sample_entry)
    stts = _box("stts", struct.pack(">BxxxIII", 0, 1, n, delta))
    stsz = _box(
        "stsz",
        struct.pack(">BxxxII", 0, 0, n) + struct.pack(f">{n}I", *(len(f) for f in frames)),
    )
    stsc = _box("stsc", struct.pack(">BxxxIIII", 0, 1, 1, 1, 1))  # 1 sample/chunk

    # stco needs the absolute mdat payload offsets: compute the sizes of
    # everything before mdat with a placeholder, then rewrite
    def build(stco_offsets: list[int]) -> bytes:
        stco = _box("stco", struct.pack(f">BxxxI{n}I", 0, n, *stco_offsets))
        stbl = _box("stbl", stsd + stts + stsc + stsz + stco)
        dinf = _box(
            "dinf",
            _box("dref", struct.pack(">BxxxI", 0, 1) + _box("url ", struct.pack(">BBBB", 0, 0, 0, 1))),
        )
        vmhd = _box("vmhd", struct.pack(">BBBB", 0, 0, 0, 1) + b"\x00" * 8)
        minf = _box("minf", vmhd + dinf + stbl)
        mdia = _box("mdia", mdhd + hdlr + minf)
        trak = _box("trak", tkhd + mdia)
        moov = _box("moov", mvhd + trak)
        mdat = _box("mdat", b"".join(frames))
        return ftyp + moov + mdat

    tentative = build([0] * n)
    mdat_body_start = len(tentative) - (8 + sum(len(f) for f in frames)) + 8
    offsets = []
    pos = mdat_body_start
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    final = build(offsets)
    assert len(final) == len(tentative)
    return final
