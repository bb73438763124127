"""Per-partition lineage records: the checkpoint/resume substrate.

Replaces the reference's PostgreSQL job/queue state machine
(``/root/reference/tilecloud_chain/store/postgresql.py:73-89,143-194``,
retry semantics ``:443-477``): work is split into deterministic
partitions (coordinate-interval ranges); a partition's output parquet
is written to a temp name and atomically renamed, THEN its lineage
record is written (atomic rename too).  A resumed run skips partitions
with lineage records — "completed work is never redone", failed work
re-runs, and the at-least-once write is idempotent (same deterministic
output path per partition).

Lineage schema follows FIXTURES.md §6.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass


@dataclass
class LineageRecord:
    job_id: str
    partition_id: int
    zooms: list[int]
    input_rows: int
    tiles_generated: int
    tiles_dropped: int
    tiles_stored: int
    metatiles_generated: int
    metatiles_dropped: int
    status: str  # done | error
    started_at: float
    finished_at: float
    error: str | None = None
    cell_range: list[int] | None = None  # [min_cell, max_cell] of the input shard
    rows_out: int | None = None  # output rows of non-tile jobs (e.g. curation)


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def record_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(lineage_dir(out_dir), f"part_{partition_id:06d}.json")


def write_record(out_dir: str, record: LineageRecord) -> None:
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    path = record_path(out_dir, record.partition_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(record), fh)
    os.replace(tmp, path)  # commit point


def load_records(out_dir: str) -> dict[int, LineageRecord]:
    d = lineage_dir(out_dir)
    records: dict[int, LineageRecord] = {}
    if not os.path.isdir(d):
        return records
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as fh:
            data = json.load(fh)
        rec = LineageRecord(**data)
        records[rec.partition_id] = rec
    return records


def done_partitions(out_dir: str) -> set[int]:
    return {pid for pid, rec in load_records(out_dir).items() if rec.status == "done"}


def summarize_lineage(out_dir: str) -> dict[str, int | float]:
    recs = load_records(out_dir).values()
    done = [r for r in recs if r.status == "done"]
    return {
        "partitions_done": len(done),
        "partitions_error": len([r for r in recs if r.status != "done"]),
        "tiles_generated": sum(r.tiles_generated for r in done),
        "tiles_dropped": sum(r.tiles_dropped for r in done),
        "tiles_stored": sum(r.tiles_stored for r in done),
        "metatiles_generated": sum(r.metatiles_generated for r in done),
        "metatiles_dropped": sum(r.metatiles_dropped for r in done),
        "elapsed": sum(r.finished_at - r.started_at for r in done),
    }


def now() -> float:
    return time.time()


def status_rollup(out_dir: str, top_errors: int = 5) -> dict:
    """Queue/job status rollup (G3/J5): per-(status, zoom) partition
    counts + the most recent errors, the analog of the PostgreSQL
    ``GROUP BY job_id, zoom, status`` + row_number top-5 query
    (``/root/reference/tilecloud_chain/store/postgresql.py:536-606``).
    """
    recs = list(load_records(out_dir).values())
    by_key: dict[tuple[str, str, int], int] = {}
    for r in recs:
        for z in r.zooms:
            key = (r.job_id, r.status, z)
            by_key[key] = by_key.get(key, 0) + 1
    errors = sorted(
        (r for r in recs if r.status == "error"),
        key=lambda r: r.finished_at,
        reverse=True,
    )[:top_errors]
    done = [r for r in recs if r.status == "done"]
    elapsed = sum(r.finished_at - r.started_at for r in done)
    remaining = len([r for r in recs if r.status != "done"])
    eta = (elapsed / len(done) * remaining) if done else None
    return {
        "counts": [
            {"job_id": j, "status": s, "zoom": z, "partitions": c}
            for (j, s, z), c in sorted(by_key.items())
        ],
        "recent_errors": [
            {"partition_id": r.partition_id, "error": r.error, "finished_at": r.finished_at}
            for r in errors
        ],
        "eta_seconds": eta,
    }
