"""Post-processing stages (M8): transform tile payloads.

The reference pipes tile bytes through an allow-listed external command
(optipng/jpegoptim/pngquant, ``/root/reference/tilecloud_chain/
__init__.py:2757-2833``, allow-list ``settings.py:152``).  Here:

* ``external_process_batch`` — the same temp-file + argument-template
  + allow-list contract, run via subprocess per row; errors set the
  row's ``status='error'``/``error`` column instead of raising (the
  reference sets ``tile.error``).  The binaries don't exist in this
  container, so tests exercise the template/allow-list/error paths.
* ``png_recompress`` — in-process deterministic processor (re-encode
  IDAT at a chosen zlib level), our native ``optipng`` stand-in.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import pyarrow as pa

from tilecloud_chain_ray.functions.png import decode_png, encode_png

ALLOWED_COMMANDS = {"optipng", "jpegoptim", "pngquant"}


def make_external_process(command_template: str, allow_list=ALLOWED_COMMANDS):
    """Per-batch external processor.

    ``command_template`` uses ``%(in)s %(out)s %(x)s %(y)s %(z)s``
    placeholders like the reference.  The executable (first token) must
    be in the allow-list.
    """
    exe = command_template.split()[0]
    if os.path.basename(exe) not in allow_list:
        raise ValueError(f"command {exe!r} not in allow-list {sorted(allow_list)}")

    def process(batch: pa.Table) -> pa.Table:
        data = batch["data"]
        statuses = (
            batch["status"].to_pylist()
            if "status" in batch.schema.names
            else ["generated"] * batch.num_rows
        )
        errors: list[str | None] = [None] * batch.num_rows
        out_data: list[bytes | None] = []
        z = batch["z"].to_pylist()
        x = batch["x"].to_pylist()
        y = batch["y"].to_pylist()
        for i in range(batch.num_rows):
            blob = data[i].as_py()
            if blob is None or statuses[i] not in ("generated", "stored"):
                out_data.append(blob)
                continue
            with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as fin:
                fin.write(blob)
                in_path = fin.name
            out_path = in_path + ".out"
            cmd = command_template % {
                "in": in_path,
                "out": out_path,
                "x": x[i],
                "y": y[i],
                "z": z[i],
            }
            try:
                subprocess.run(cmd, shell=True, check=True, capture_output=True, timeout=30)
                with open(out_path if os.path.exists(out_path) else in_path, "rb") as fh:
                    out_data.append(fh.read())
            except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as exc:
                # reference semantics: error tile keeps flowing with
                # error set and data dropped (__init__.py:2820-2830)
                out_data.append(None)
                statuses[i] = "error"
                errors[i] = str(exc)
            finally:
                for p in (in_path, out_path):
                    if os.path.exists(p):
                        os.unlink(p)
        cols = dict(zip(batch.schema.names, batch.columns))
        cols["data"] = pa.array(out_data, pa.binary())
        cols["status"] = pa.array(statuses, pa.string())
        cols["error"] = pa.array(errors, pa.string())
        return pa.Table.from_pydict(cols)

    return process


def png_recompress(level: int = 9):
    """In-process deterministic PNG re-encode (the optipng stand-in)."""
    import zlib

    def process(batch: pa.Table) -> pa.Table:
        data = batch["data"]
        out: list[bytes | None] = []
        for i in range(batch.num_rows):
            blob = data[i].as_py()
            if blob is None:
                out.append(None)
                continue
            img = decode_png(blob)
            # encode_png uses level 6; re-pack IDAT at the requested level
            raw = encode_png(img)
            if level != 6:
                import struct

                sig = raw[:8]
                pos = 8
                chunks = []
                while pos < len(raw):
                    (length,) = struct.unpack_from(">I", raw, pos)
                    tag = raw[pos + 4 : pos + 8]
                    payload = raw[pos + 8 : pos + 8 + length]
                    pos += 12 + length
                    if tag == b"IDAT":
                        payload = zlib.compress(zlib.decompress(payload), level)
                    chunks.append((tag, payload))
                out_bytes = sig
                for tag, payload in chunks:
                    out_bytes += (
                        struct.pack(">I", len(payload))
                        + tag
                        + payload
                        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
                    )
                out.append(out_bytes)
            else:
                out.append(raw)
        cols = dict(zip(batch.schema.names, batch.columns))
        cols["data"] = pa.array(out, pa.binary())
        return pa.Table.from_pydict(cols)

    return process
