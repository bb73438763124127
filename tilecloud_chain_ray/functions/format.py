"""Scalar formatters (M10): size / duration — reporting helpers.

Reference: ``/root/reference/tilecloud_chain/format.py:6-28``.
Same output contract (KiB-style units, H:MM:SS durations).
"""

from __future__ import annotations


def size_format(size: float) -> str:
    for unit in ("o", "Kio", "Mio", "Gio", "Tio"):
        if size < 1024:
            if unit == "o":
                return f"{int(size)} {unit}"
            return f"{size:.1f} {unit}"
        size /= 1024.0
    return f"{size:.1f} Pio"


def duration_format(seconds: float) -> str:
    seconds = int(round(seconds))
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    return f"{hours}:{minutes:02d}:{secs:02d}"


def default_int(values) -> tuple[int, ...]:
    """Round float tuples to ints when integral (bbox printing)."""
    return tuple(int(v) if float(v).is_integer() else v for v in values)
