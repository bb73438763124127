"""jobs/dedup.py — the unified dedup CLI over sf0.001: every method
runs in a fresh process, writes a parquet report, and the substring
--cut corpus matches the library's own cut."""

import json
import os
import subprocess
import sys

import pytest


def run_cli(tmp, *argv):
    out = subprocess.run(
        [sys.executable, "jobs/dedup.py", "--in", "/root/testdata/sf0.001",
         "--num-cpus", "4", *argv],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize(
    "method,extra,min_rows",
    [
        ("exact", (), 500),          # one row per distinct text
        ("minhash", ("--threshold", "0.8"), 1),
        ("simhash", ("--max-hamming", "3"), 1),
        ("substring", ("--k", "8", "--winnow", "0"), 1),
        ("semantic", ("--threshold", "0.95"), 500),  # verdict per row
        ("embedding", ("--threshold", "0.95"), 0),   # fixture max cos 0.48
    ],
)
def test_dedup_cli_methods(tmp_path, method, extra, min_rows):
    out = str(tmp_path / method)
    j = run_cli(tmp_path, "--method", method, "--out", out, *extra)
    assert j["method"] == method
    assert j["rows"] >= min_rows
    assert os.path.isdir(out)
    if j["rows"]:
        import duckdb

        n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
        assert n == j["rows"]


def test_dedup_cli_substring_cut(tmp_path):
    out, cut = str(tmp_path / "spans"), str(tmp_path / "cleaned")
    j = run_cli(tmp_path, "--method", "substring", "--k", "8", "--winnow", "0",
                "--out", out, "--cut", cut)
    assert j["cut"] == cut and j["rows"] > 0
    import duckdb

    con = duckdb.connect()
    cleaned = dict(con.sql(
        f"SELECT doc_id, text FROM '{cut}/*.parquet'").fetchall())
    raw = dict(con.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall())
    spans = con.sql(
        f"SELECT doc_id, span_start, span_end FROM '{out}/*.parquet'").fetchall()
    assert set(cleaned) == set(raw)
    flagged = {d for d, _, _ in spans}
    assert all(cleaned[d] != raw[d] for d in flagged)
    assert all(cleaned[d] == raw[d] for d in set(raw) - flagged)
