"""Structured per-stage execution metrics (the A7 metrics wrapper).

The reference wraps stores/filters in timing decorators and exports
Prometheus/StatsD series (``tilecloud_chain/generate.py`` run wrapper;
c2cwsgiutils stats — reference ``metrics`` integration).  The
Ray-Data-native analog needs no per-operator instrumentation at all:
after a Dataset executes, ``ds.stats()`` already carries per-operator
task counts, wall/cpu/UDF time, rows and bytes.  This module turns
that report into *data*:

* ``collect_stage_metrics(ds, ...)`` — parse the executed Dataset's
  stats into one Arrow row per operator (plus a ``dataset`` total row).
* ``write_metrics(table, path)`` — append the rows as a parquet file
  next to the lineage output, so stage health is queryable with SQL
  exactly like run lineage (``sinks/lineage.py``).

Parsing a human-readable report is inherently best-effort: every field
is optional (None when the executor omits it) and unknown lines are
ignored, so a Ray upgrade degrades gracefully instead of breaking the
pipeline — metrics are observability, never control flow.
"""

from __future__ import annotations

import re
import time
from typing import Any

import pyarrow as pa
import ray

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (?:(\d+) tasks executed, )?(?:(\d+) blocks produced )?"
    r"(?:in|executed in) ([0-9.]+)s",
)
_TOTAL_RE = re.compile(r"([0-9.]+)(us|ms|s) total")
_ROWS_RE = re.compile(r"Output num rows per block: .*?([0-9]+) total")
_BYTES_RE = re.compile(r"Output size bytes per block: .*?([0-9]+) total")
_THROUGHPUT_RE = re.compile(r"Ray Data throughput: ([0-9.e+]+) rows/s")

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}

_SCHEMA = pa.schema(
    [
        ("job_id", pa.string()),
        ("pipeline", pa.string()),
        ("op_index", pa.int32()),
        ("operator", pa.string()),
        ("tasks", pa.int64()),
        ("blocks", pa.int64()),
        ("wall_s", pa.float64()),
        ("remote_wall_s", pa.float64()),
        ("remote_cpu_s", pa.float64()),
        ("udf_s", pa.float64()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("rows_per_s", pa.float64()),
        ("collected_at", pa.float64()),
    ]
)


def _seconds(line: str) -> float | None:
    m = _TOTAL_RE.search(line)
    if not m:
        return None
    return float(m.group(1)) * _UNIT[m.group(2)]


def parse_stats(stats_text: str) -> list[dict[str, Any]]:
    """``Dataset.stats()`` text -> one dict per operator."""
    ops: list[dict[str, Any]] = []
    cur: dict[str, Any] | None = None
    for raw in stats_text.splitlines():
        line = raw.strip()
        m = _OP_RE.match(line)
        if m:
            cur = {
                "op_index": int(m.group(1)),
                "operator": m.group(2),
                "tasks": int(m.group(3)) if m.group(3) else None,
                "blocks": int(m.group(4)) if m.group(4) else None,
                "wall_s": float(m.group(5)),
                "remote_wall_s": None,
                "remote_cpu_s": None,
                "udf_s": None,
                "rows": None,
                "bytes": None,
                "rows_per_s": None,
            }
            ops.append(cur)
            continue
        if cur is None:
            continue
        if line.startswith("* Remote wall time:"):
            cur["remote_wall_s"] = _seconds(line)
        elif line.startswith("* Remote cpu time:"):
            cur["remote_cpu_s"] = _seconds(line)
        elif line.startswith("* UDF time:"):
            cur["udf_s"] = _seconds(line)
        elif line.startswith("* Output num rows per block:"):
            m2 = _ROWS_RE.search(line)
            cur["rows"] = int(m2.group(1)) if m2 else None
        elif line.startswith("* Output size bytes per block:"):
            m2 = _BYTES_RE.search(line)
            cur["bytes"] = int(m2.group(1)) if m2 else None
        elif cur["rows_per_s"] is None and "Ray Data throughput:" in line:
            m2 = _THROUGHPUT_RE.search(line)
            cur["rows_per_s"] = float(m2.group(1)) if m2 else None
    return ops


def collect_stage_metrics(
    ds: ray.data.Dataset,
    job_id: str = "",
    pipeline: str = "",
) -> pa.Table:
    """Executed Dataset -> one metrics row per operator.

    Call on a handle that has executed — ``materialize()`` or a write.
    NOTE: ``ds.count()`` executes a *derived* plan (AggregateNumRows)
    and leaves ``ds`` itself without stats; materialize first, then
    count the materialized handle.  An unexecuted Dataset yields an
    empty table, never an error.
    """
    try:
        ops = parse_stats(ds.stats())
    except Exception:
        ops = []
    now = time.time()
    rows = {name: [] for name in _SCHEMA.names}
    for op in ops:
        rows["job_id"].append(job_id)
        rows["pipeline"].append(pipeline)
        rows["collected_at"].append(now)
        for k in (
            "op_index",
            "operator",
            "tasks",
            "blocks",
            "wall_s",
            "remote_wall_s",
            "remote_cpu_s",
            "udf_s",
            "rows",
            "bytes",
            "rows_per_s",
        ):
            rows[k].append(op[k])
    return pa.Table.from_pydict(rows, schema=_SCHEMA)


def write_metrics(table: pa.Table, out_dir: str, name: str = "metrics") -> str:
    """Append the metrics table as one parquet file under ``out_dir``.

    File-per-call (timestamp + job in the name): append-safe under
    retries the same way the lineage sink is — a re-run adds a new
    file instead of corrupting an existing one, and readers glob the
    directory.
    """
    import os

    import pyarrow.parquet as pq

    from tilecloud_chain_ray.sinks.wmts import resolve_fs

    fs, root = resolve_fs(out_dir)
    job = table["job_id"][0].as_py() if table.num_rows else "nojob"
    fname = f"{name}_{job or 'nojob'}_{int(time.time() * 1000)}.parquet"
    if fs is None:
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, fname)
        pq.write_table(table, path)
        return path
    fs.create_dir(root, recursive=True)
    path = f"{root}/{fname}"
    with fs.open_output_stream(path) as f:
        pq.write_table(table, f)
    return path
