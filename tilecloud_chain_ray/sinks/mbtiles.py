"""MBTiles (single-file sqlite) tile store.

Third cache format next to the WMTS filesystem layout and the tiles
Parquet table — the reference's ``mbtiles`` cache type
(``/root/reference/tilecloud_chain/__init__.py:1384-1399``) built on
the public MBTiles 1.3 spec.  Matching the reference's usage, rows are
stored **top-left** (``tilecoord_in_topleft=True``): ``tile_row`` is
the WMTS row as-is, no TMS bottom-up flip.  Set ``topleft=False`` for
spec-strict TMS files interoperable with other readers.

A single sqlite file is inherently single-writer, exactly as in the
reference; the Ray-native shape is therefore: run the (distributed)
pipeline into the tiles dataset, then stream ``iter_batches`` through
ONE writer connection with batched inserts.  Reads can fan back out:
``to_dataset`` re-emits the file as a Dataset (cache-as-source S5).
"""

from __future__ import annotations

import os
import sqlite3
from collections.abc import Iterator

import pyarrow as pa
import ray

_SCHEMA = """
CREATE TABLE IF NOT EXISTS metadata (name TEXT PRIMARY KEY, value TEXT);
CREATE TABLE IF NOT EXISTS tiles (
    zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_data BLOB
);
CREATE UNIQUE INDEX IF NOT EXISTS tiles_index
    ON tiles (zoom_level, tile_column, tile_row);
"""


class MBTilesStore:
    """Thin wrapper over one sqlite connection (single writer)."""

    def __init__(self, path: str, topleft: bool = True) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.topleft = topleft
        self.conn = sqlite3.connect(path)
        self.conn.executescript(_SCHEMA)

    # -- metadata ---------------------------------------------------------
    def set_metadata(self, **kv: str) -> None:
        self.conn.executemany(
            "INSERT OR REPLACE INTO metadata (name, value) VALUES (?, ?)",
            [(k, str(v)) for k, v in kv.items()],
        )
        self.conn.commit()

    def metadata(self) -> dict[str, str]:
        return dict(self.conn.execute("SELECT name, value FROM metadata"))

    # -- tiles ------------------------------------------------------------
    def _row(self, z: int, y: int) -> int:
        return y if self.topleft else (1 << z) - 1 - y

    def put_many(self, rows: list[tuple[int, int, int, bytes]]) -> None:
        """rows: (z, x, y_topleft, data)."""
        self.conn.executemany(
            "INSERT OR REPLACE INTO tiles "
            "(zoom_level, tile_column, tile_row, tile_data) VALUES (?, ?, ?, ?)",
            [(z, x, self._row(z, y), sqlite3.Binary(d)) for z, x, y, d in rows],
        )
        self.conn.commit()

    def get(self, z: int, x: int, y: int) -> bytes | None:
        cur = self.conn.execute(
            "SELECT tile_data FROM tiles "
            "WHERE zoom_level=? AND tile_column=? AND tile_row=?",
            (z, x, self._row(z, y)),
        )
        row = cur.fetchone()
        return bytes(row[0]) if row else None

    def iter_tiles(self, chunk: int = 8192) -> Iterator[pa.Table]:
        """Stream the file back as Arrow batches of (z, x, y, data)."""
        cur = self.conn.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
            "ORDER BY zoom_level, tile_column, tile_row"
        )
        while True:
            rows = cur.fetchmany(chunk)
            if not rows:
                return
            zs = [r[0] for r in rows]
            ys = [
                r[2] if self.topleft else (1 << r[0]) - 1 - r[2] for r in rows
            ]
            yield pa.Table.from_pydict(
                {
                    "z": pa.array(zs, pa.int32()),
                    "x": pa.array([r[1] for r in rows], pa.int64()),
                    "y": pa.array(ys, pa.int64()),
                    "data": pa.array([bytes(r[3]) for r in rows], pa.binary()),
                }
            )

    def count(self) -> int:
        return self.conn.execute("SELECT count(*) FROM tiles").fetchone()[0]

    def close(self) -> None:
        self.conn.close()


def write_mbtiles(
    tiles: ray.data.Dataset,
    path: str,
    layer=None,
    topleft: bool = True,
    batch_rows: int = 2048,
) -> int:
    """Stream stored tiles into one MBTiles file; returns rows written.

    The dataset pipeline upstream runs distributed; this sink is the
    single-writer funnel (bounded memory via ``iter_batches``)."""
    store = MBTilesStore(path, topleft=topleft)
    if layer is not None:
        meta = {
            "name": layer.name,
            "format": layer.extension,
            "type": "overlay",
            "version": "1",
        }
        for dim in layer.dimensions:
            meta["dimension_" + dim.name] = dim.default
        store.set_metadata(**meta)
    written = 0
    for batch in tiles.iter_batches(batch_size=batch_rows, batch_format="pyarrow"):
        if "status" in batch.column_names:
            batch = batch.filter(pa.compute.equal(batch["status"], "stored"))
        if batch.num_rows == 0:
            continue
        rows = list(
            zip(
                batch["z"].to_pylist(),
                batch["x"].to_pylist(),
                batch["y"].to_pylist(),
                batch["data"].to_pylist(),
            )
        )
        store.put_many(rows)
        written += len(rows)
    store.close()
    return written


def to_dataset(path: str, topleft: bool = True) -> ray.data.Dataset:
    """Cache-as-source: re-emit an MBTiles file as a Dataset."""
    store = MBTilesStore(path, topleft=topleft)
    tables = list(store.iter_tiles())
    store.close()
    if not tables:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "z": pa.array([], pa.int32()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "data": pa.array([], pa.binary()),
                }
            )
        )
    return ray.data.from_arrow(tables)
