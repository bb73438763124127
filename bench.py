#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "num_cpus": N,
   "throughput": {...}}

``--scaling``: runs the full bench twice in fresh processes
(RAY_GRAFT_CPUS=8 then 32) on the same input and reports both
throughputs + scaling efficiency (the sandbox evidence for the
north rule's N -> 4N criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from tilecloud_chain_ray import queries as q

    # warm the OS page cache (untimed) so we measure compute + shuffle
    for name in ("documents", "embeddings", "lineitem", "orders", "events"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    def consume(result):
        import pyarrow as pa

        import ray.data

        if isinstance(result, ray.data.Dataset):
            # stream to completion without driver materialization
            total = 0
            for batch in result.iter_batches(batch_size=65536, batch_format="pyarrow"):
                total += batch.num_rows
            return total
        if isinstance(result, pa.Table):
            return result.num_rows
        return len(result)

    benches = {
        "geocode_pip": lambda: q.q_pip_layer_counts(sf_dir),
        "tile_counts": lambda: q.q_tile_counts_per_zoom(sf_dir),
        "cell_rollup": lambda: q.q_cell_counts_r8(sf_dir),
        "density_pyramid": lambda: q.q_density_tiles(sf_dir),
        "generate_point_hash": lambda: q.q_generate_point_hash(sf_dir),
        "dedup_exact": lambda: q.q_dedup_exact(sf_dir),
        "dedup_minhash": lambda: q.q_dedup_minhash(sf_dir),
        "knn_cosine": lambda: q.q_knn_cosine(sf_dir),
        "text_analysis": lambda: q.q_quality_hist(sf_dir),
        "sessionize": lambda: q.q_sessionize(sf_dir),
    }

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in benches.items():
        t0 = time.perf_counter()
        rows[name] = consume(fn())
        timings[name] = round(time.perf_counter() - t0, 3)

    # throughput metrics over the primary table
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    geo_secs = timings["geocode_pip"]
    tile_secs = timings["density_pyramid"]
    tiles_out = rows["density_pyramid"]
    result = {
        "metric": "graft_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0),
        "num_cpus": num_cpus,
        "throughput": {
            "docs_geocoded_per_sec": round(n_docs / geo_secs, 1) if geo_secs else None,
            "tiles_per_sec": round(tiles_out / tile_secs, 1) if tile_secs else None,
            "rows": rows,
        },
    }
    ray.shutdown()
    return result


def scaling_run(sf_dir: str) -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "queries_8": r_lo["queries"],
                "queries_32": r_hi["queries"],
                "sf": r_lo["sf"],
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        scaling_run(sf_dir)
        return
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(run_benchmarks(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
