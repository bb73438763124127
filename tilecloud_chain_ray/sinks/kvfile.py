"""Single-file key-value tile store (the ``bsddb`` cache-type analog).

The reference offers a single-file hash store next to MBTiles — cache
type ``bsddb`` backed by ``bsddb3.hashopen``
(``/root/reference/tilecloud_chain/__init__.py:1402-1430``), chosen for
write speed (``USAGE.rst:62-66``: "writing, the BSDDB is ~10 times
faster").  That library isn't available here, so this is a from-scratch
equivalent: an append-only record log with a persisted key index,
giving O(1) in-memory lookup, crash recovery by log scan, and
last-write-wins semantics — the same contract ``hashopen(..., "c")``
provides.

File layout::

    b"TCRKV1\\n"                                  header magic
    record*                                       append-only log
        flag u8 (0 = put, 1 = tombstone)
        klen u32-le | vlen u32-le | key | value
    index                                         written on close
        count u64-le
        (klen u32-le | key | off u64-le | vlen u32-le)*   live keys only
    index_off u64-le | b"TCRKVIX\\n"              footer

Opening a file whose footer is valid loads the index directly; a file
without one (writer crashed) is recovered by scanning the log, so a
kill mid-write never loses committed records.  Reopening for write
truncates the stale footer and appends — the "c" mode of the
reference's ``hashopen``.

Like MBTiles (``sinks/mbtiles.py``), a single file is inherently
single-writer: run the distributed pipeline into the tiles dataset,
then stream ``iter_batches`` through ONE writer.  Reads fan back out
via :func:`to_dataset` (cache-as-source S5).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pyarrow as pa
import ray

_MAGIC = b"TCRKV1\n"
_FOOTER_MAGIC = b"TCRKVIX\n"
_META_PREFIX = b"\xffmeta:"


class KVFile:
    """Append-only single-file KV store with a persisted hash index."""

    def __init__(self, path: str, read_only: bool = False) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.read_only = read_only
        self._index: dict[bytes, tuple[int, int]] = {}  # key -> (off, vlen)
        exists = os.path.exists(path) and os.path.getsize(path) > 0
        if not exists and read_only:
            raise FileNotFoundError(path)
        mode = "rb" if read_only else ("r+b" if exists else "w+b")
        self._fh = open(path, mode)
        if exists:
            self._load()
            if not read_only:
                # Invalidate the stale footer NOW, not lazily at close():
                # otherwise a crash after any put() leaves the old footer at
                # the tail with an index_off pointing into overwritten record
                # bytes, and the next open loads a garbage index instead of
                # falling back to the log scan.
                self._fh.truncate(self._append_at)
                self._fh.flush()
                os.fsync(self._fh.fileno())
        else:
            self._fh.write(_MAGIC)
            self._append_at = self._fh.tell()
        self._dirty = False

    # -- open/recover -------------------------------------------------

    def _load(self) -> None:
        fh = self._fh
        fh.seek(0)
        if fh.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f"{self.path}: not a TCRKV file")
        size = os.fstat(fh.fileno()).st_size
        footer_len = 8 + len(_FOOTER_MAGIC)
        if size >= len(_MAGIC) + footer_len:
            fh.seek(size - footer_len)
            blob = fh.read(footer_len)
            if blob[8:] == _FOOTER_MAGIC:
                self._load_index(struct.unpack("<Q", blob[:8])[0])
                return
        self._recover_scan(size)

    def _load_index(self, index_off: int) -> None:
        fh = self._fh
        fh.seek(index_off)
        (count,) = struct.unpack("<Q", fh.read(8))
        for _ in range(count):
            (klen,) = struct.unpack("<I", fh.read(4))
            key = fh.read(klen)
            off, vlen = struct.unpack("<QI", fh.read(12))
            self._index[key] = (off, vlen)
        self._append_at = index_off

    def _recover_scan(self, size: int) -> None:
        """No (valid) footer: rebuild the index from the log — committed
        records survive a writer crash; a torn tail record is dropped."""
        fh = self._fh
        pos = len(_MAGIC)
        while pos + 9 <= size:
            fh.seek(pos)
            head = fh.read(9)
            if len(head) < 9:
                break
            flag, klen, vlen = struct.unpack("<BII", head)
            if flag > 1 or pos + 9 + klen + vlen > size:
                break  # torn tail or footer remnant
            key = fh.read(klen)
            if flag == 1:
                self._index.pop(key, None)
            else:
                self._index[key] = (pos + 9 + klen, vlen)
            pos += 9 + klen + vlen
        self._append_at = pos

    # -- KV API ---------------------------------------------------------

    def put(self, key: bytes, value: bytes) -> None:
        if self.read_only:
            raise OSError("read-only store")
        fh = self._fh
        fh.seek(self._append_at)
        fh.write(struct.pack("<BII", 0, len(key), len(value)))
        fh.write(key)
        fh.write(value)
        self._index[key] = (self._append_at + 9 + len(key), len(value))
        self._append_at = fh.tell()
        self._dirty = True

    def get(self, key: bytes) -> bytes | None:
        entry = self._index.get(key)
        if entry is None:
            return None
        off, vlen = entry
        self._fh.seek(off)
        return self._fh.read(vlen)

    def delete(self, key: bytes) -> None:
        if self.read_only:
            raise OSError("read-only store")
        if key not in self._index:
            return
        fh = self._fh
        fh.seek(self._append_at)
        fh.write(struct.pack("<BII", 1, len(key), 0))
        fh.write(key)
        self._index.pop(key, None)
        self._append_at = fh.tell()
        self._dirty = True

    def __contains__(self, key: bytes) -> bool:
        return key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def keys(self) -> list[bytes]:
        return sorted(self._index)

    def close(self) -> None:
        if not self.read_only:
            fh = self._fh
            fh.seek(self._append_at)
            index_off = self._append_at
            fh.write(struct.pack("<Q", len(self._index)))
            for key in sorted(self._index):
                off, vlen = self._index[key]
                fh.write(struct.pack("<I", len(key)) + key)
                fh.write(struct.pack("<QI", off, vlen))
            fh.write(struct.pack("<Q", index_off) + _FOOTER_MAGIC)
            fh.truncate()
            fh.flush()
            os.fsync(fh.fileno())
        self._fh.close()


class KVFileStore:
    """Tile-store facade over :class:`KVFile` — same surface as
    :class:`~tilecloud_chain_ray.sinks.mbtiles.MBTilesStore` so the two
    single-file cache types are drop-in swaps.  Tile key = ``z/x/y``
    ASCII (the ``coords.parse_tilecoord`` text format); metadata lives
    under a reserved non-ASCII key prefix."""

    def __init__(self, path: str, read_only: bool = False) -> None:
        self.path = path
        self.kv = KVFile(path, read_only=read_only)

    @staticmethod
    def _key(z: int, x: int, y: int) -> bytes:
        return f"{z}/{x}/{y}".encode()

    # -- metadata -----------------------------------------------------
    def set_metadata(self, **kv: str) -> None:
        for k, v in kv.items():
            self.kv.put(_META_PREFIX + k.encode(), str(v).encode())

    def metadata(self) -> dict[str, str]:
        out = {}
        for key in self.kv.keys():
            if key.startswith(_META_PREFIX):
                out[key[len(_META_PREFIX) :].decode()] = (self.kv.get(key) or b"").decode()
        return out

    # -- tiles --------------------------------------------------------
    def put_many(self, rows: list[tuple[int, int, int, bytes]]) -> None:
        for z, x, y, data in rows:
            self.kv.put(self._key(z, x, y), data)

    def get(self, z: int, x: int, y: int) -> bytes | None:
        return self.kv.get(self._key(z, x, y))

    def delete(self, z: int, x: int, y: int) -> None:
        self.kv.delete(self._key(z, x, y))

    def iter_tiles(self, chunk: int = 8192) -> Iterator[pa.Table]:
        """Stream the file back as Arrow batches of (z, x, y, data),
        ordered by (z, x, y)."""
        coords = []
        for key in self.kv.keys():
            if key.startswith(_META_PREFIX):
                continue
            z, x, y = (int(p) for p in key.decode().split("/"))
            coords.append((z, x, y, key))
        coords.sort()
        for start in range(0, len(coords), chunk):
            part = coords[start : start + chunk]
            yield pa.Table.from_pydict(
                {
                    "z": pa.array([c[0] for c in part], pa.int32()),
                    "x": pa.array([c[1] for c in part], pa.int64()),
                    "y": pa.array([c[2] for c in part], pa.int64()),
                    "data": pa.array([self.kv.get(c[3]) for c in part], pa.binary()),
                }
            )

    def count(self) -> int:
        return sum(1 for k in self.kv.keys() if not k.startswith(_META_PREFIX))

    def close(self) -> None:
        self.kv.close()


def write_kvfile(
    tiles: ray.data.Dataset,
    path: str,
    layer=None,
    batch_rows: int = 2048,
) -> int:
    """Stream stored tiles into one KV file; returns rows written.

    Single-writer funnel over a distributed upstream, mirroring
    :func:`~tilecloud_chain_ray.sinks.mbtiles.write_mbtiles`."""
    store = KVFileStore(path)
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
        store.put_many(
            list(
                zip(
                    batch["z"].to_pylist(),
                    batch["x"].to_pylist(),
                    batch["y"].to_pylist(),
                    batch["data"].to_pylist(),
                )
            )
        )
        written += batch.num_rows
    store.close()
    return written


def to_dataset(path: str) -> ray.data.Dataset:
    """Cache-as-source: re-emit a KV file as a Dataset."""
    store = KVFileStore(path, read_only=True)
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
