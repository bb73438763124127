"""Per-stage metrics sink (sinks/metrics.py, the A7 analog)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilecloud_chain_ray.sinks.metrics import (
    collect_stage_metrics,
    parse_stats,
    write_metrics,
)

SAMPLE = """Operator 1 ReadRange->MapBatches(<lambda>): 8 tasks executed, 8 blocks produced in 0.6s
* Remote wall time: 1.23ms min, 8.49ms max, 4.34ms mean, 34.74ms total
* Remote cpu time: 1.4ms min, 8.71ms max, 4.52ms mean, 36.15ms total
* UDF time: 22.09us min, 196.97us max, 99.11us mean, 792.88us total
* Peak heap memory usage (MiB): 90.02 min, 90.31 max, 90 mean
* Output num rows per block: 125 min, 125 max, 125 mean, 1000 total
* Output size bytes per block: 1000 min, 1000 max, 1000 mean, 8000 total
* Output rows per task: 125 min, 125 max, 125 mean, 8 tasks used
* Tasks per node: 8 min, 8 max, 8 mean; 1 nodes used
* Operator throughput:
\t* Ray Data throughput: 1665.85 rows/s
\t* Estimated single node throughput: 28789.26 rows/s

Operator 2 Sort: executed in 2.72s

Dataset throughput:
\t* Ray Data throughput: 1665.85 rows/s
"""


def test_parse_stats_text():
    ops = parse_stats(SAMPLE)
    assert len(ops) == 2
    a = ops[0]
    assert a["op_index"] == 1
    assert a["operator"].startswith("ReadRange")
    assert a["tasks"] == 8 and a["blocks"] == 8
    assert abs(a["wall_s"] - 0.6) < 1e-9
    assert abs(a["remote_wall_s"] - 0.03474) < 1e-6
    assert abs(a["remote_cpu_s"] - 0.03615) < 1e-6
    assert abs(a["udf_s"] - 792.88e-6) < 1e-9
    assert a["rows"] == 1000 and a["bytes"] == 8000
    assert abs(a["rows_per_s"] - 1665.85) < 1e-6
    # all-to-all operator: only the wall time is known
    b = ops[1]
    assert b["operator"] == "Sort" and abs(b["wall_s"] - 2.72) < 1e-9
    assert b["tasks"] is None and b["rows"] is None


def test_parse_stats_garbage_is_empty():
    assert parse_stats("") == []
    assert parse_stats("not a stats report\nat all") == []


@pytest.mark.usefixtures("ray_session")
def test_collect_and_write_metrics(tmp_path):
    import ray

    ds = (
        ray.data.from_arrow(pa.table({"v": np.arange(10_000, dtype=np.int64)}))
        .map_batches(lambda b: b, batch_format="pyarrow")
        .groupby("v")
        .count()
        .materialize()
    )
    tbl = collect_stage_metrics(ds, job_id="job42", pipeline="unit")
    assert tbl.num_rows >= 2  # at least a map op and the aggregate
    names = tbl["operator"].to_pylist()
    assert any("MapBatches" in n or "Aggregate" in n or "Sort" in n for n in names)
    wall = tbl["wall_s"].to_pylist()
    assert all(w is None or w >= 0 for w in wall)
    assert set(tbl["job_id"].to_pylist()) == {"job42"}

    path = write_metrics(tbl, str(tmp_path / "metrics"))
    back = pq.read_table(path)
    assert back.num_rows == tbl.num_rows
    assert back.schema.names == tbl.schema.names

    # URI roots go through pyarrow.fs (the s3-style path)
    path2 = write_metrics(tbl, f"file://{tmp_path}/metrics_uri")
    back2 = pq.read_table(path2.replace("file://", ""))
    assert back2.num_rows == tbl.num_rows


@pytest.mark.usefixtures("ray_session")
def test_knn_ann_variants_run():
    """q_knn_ann (LSH + IVF in one result) still runs end-to-end after
    leaving the driver registry for the vectorize_pixels slot."""
    from tilecloud_chain_ray.queries import q_knn_ann

    res = q_knn_ann("/root/testdata/sf0.001")
    df = res.to_pandas()
    assert len(df) > 0
