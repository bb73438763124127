"""Error-list sink: persist failed tile coords for re-run (§3.1 #13).

The reference appends ``z/x/y[:+n/+n]# [time] message`` lines to a
per-layer error file (``/root/reference/tilecloud_chain/__init__.py:
1597-1654``); ``--tiles error.list`` re-runs exactly those coords.
Here the writer collects ``status == 'error'`` rows from a tile
Dataset into the same line format, and ``sources.tiles_file`` reads it
back — closing the failed-work re-run loop.
"""

from __future__ import annotations

import datetime
import os

import ray


def write_error_list(tiles: ray.data.Dataset, path: str) -> int:
    """Append error rows to ``path``; returns the number written.

    Small result contract: error rows are a tiny fraction (the error
    budget aborts runs beyond ~tens), so collecting them on the driver
    is bounded by design.
    """
    errors = tiles.map_batches(
        lambda b: b.filter(
            __import__("pyarrow").compute.equal(b["status"], "error")
        ).select([c for c in ("z", "x", "y", "n", "error") if c in b.schema.names]),
        batch_format="pyarrow",
    ).take_all()
    if not errors:
        return 0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat()
    with open(path, "a") as fh:
        for row in errors:
            n = row.get("n", 1)
            coord = (
                f"{row['z']}/{row['x']}/{row['y']}"
                + (f":+{n}/+{n}" if n and n > 1 else "")
            )
            message = (row.get("error") or "").replace("\n", " ")
            fh.write(f"{coord}# [{stamp}] {message}\n")
    return len(errors)
