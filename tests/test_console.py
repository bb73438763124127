"""Operator console (console.py + `tcr jobs`): list / rollup / error
tail / re-queue over a killed run's lineage, via the Python API, the
CLI and the HTTP JSON surface — the admin-UI parity items (reference
views/admin.py:257-434)."""

import json
import subprocess
import sys
import threading
import urllib.request

import pytest

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.console import (
    ConsoleServer,
    job_status,
    list_jobs,
    requeue_errors,
    serve,
    tail_errors,
)
from tilecloud_chain_ray.geom import MultiPoint, Point
from tilecloud_chain_ray.grid import SWISSGRID_5


def _layer():
    return Layer(
        name="point_hash",
        grid=SWISSGRID_5,
        geometries=(MultiPoint((Point(600000, 200000), Point(530000, 150000))),),
        meta=True,
        meta_size=8,
        meta_buffer=128,
        min_resolution_seed=10,
    )


@pytest.fixture(scope="module")
def killed_run(ray_session, tmp_path_factory):
    """A resumable generation with one injected partition failure —
    the 'operator walks up to a broken run' fixture."""
    from tilecloud_chain_ray.pipelines.resumable import generate_resumable

    root = tmp_path_factory.mktemp("runs")
    out = str(root / "pyramid_a")
    summary = generate_resumable(
        _layer(), out, max_coords_per_partition=4, fail_partitions={1}
    )
    return str(root), out, summary


def test_list_and_status(killed_run):
    root, out, _ = killed_run
    jobs = list_jobs(root)
    assert len(jobs) == 1 and jobs[0]["dir"] == out
    assert jobs[0]["status"] == "error" and jobs[0]["partitions_error"] == 1
    assert jobs[0]["partitions_done"] >= 1

    st = job_status(out)
    assert st["summary"]["partitions_error"] == 1
    assert any(c["status"] == "done" for c in st["counts"])
    assert len(st["recent_errors"]) == 1
    assert st["eta_seconds"] is not None and st["eta_seconds"] >= 0


def test_errors_and_requeue_then_resume(killed_run):
    root, out, _ = killed_run
    errs = tail_errors(out)
    assert len(errs) == 1 and "injected" in errs[0]["error"]
    failed_pid = errs[0]["partition_id"]

    res = requeue_errors(out)
    assert res == {"requeued": [failed_pid], "count": 1}
    assert tail_errors(out) == []

    # the resume picks the re-queued partition up and completes the run
    from tilecloud_chain_ray.pipelines.resumable import generate_resumable

    summary = generate_resumable(_layer(), out, max_coords_per_partition=4)
    assert summary["partitions_error"] == 0
    assert summary["tiles_stored"] == 8  # the point_hash golden

    jobs = list_jobs(root)
    assert jobs[0]["status"] == "done"


def test_cli_surface(killed_run, tmp_path_factory):
    """`tcr jobs list/status/errors` print valid JSON for the run."""
    root, out, _ = killed_run
    env_dir = "/root/repo"

    def run(*argv):
        proc = subprocess.run(
            [sys.executable, "jobs/tcr.py", "jobs", *argv],
            capture_output=True,
            text=True,
            cwd=env_dir,
            timeout=60,
        )
        assert proc.returncode == 0, proc.stderr
        return json.loads(proc.stdout)

    listing = run("list", "--root", root)
    assert listing and listing[0]["dir"] == out
    status = run("status", "--dir", out)
    assert "summary" in status and "counts" in status
    errors = run("errors", "--dir", out)
    assert isinstance(errors, list)


def test_http_surface(ray_session, tmp_path_factory):
    """GET /jobs /status /errors and POST /requeue over real HTTP
    against a fresh killed run; path escapes are rejected."""
    from tilecloud_chain_ray.pipelines.resumable import generate_resumable

    root = tmp_path_factory.mktemp("http_runs")
    out = str(root / "pyramid_b")
    generate_resumable(_layer(), out, max_coords_per_partition=4, fail_partitions={0})

    srv = serve(str(root), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"

        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as resp:
                return resp.status, json.loads(resp.read())

        code, jobs = get("/jobs")
        assert code == 200 and jobs[0]["partitions_error"] == 1
        code, st = get(f"/status?dir={out}")
        assert code == 200 and st["summary"]["partitions_error"] == 1
        code, errs = get(f"/errors?dir={out}&n=5")
        assert code == 200 and len(errs) == 1

        # POST without the shared-secret token: rejected (CSRF defense)
        try:
            urllib.request.urlopen(
                urllib.request.Request(base + f"/requeue?dir={out}", method="POST"),
                timeout=10,
            )
            raise AssertionError("tokenless POST should 401")
        except urllib.error.HTTPError as exc:
            assert exc.code == 401

        token = srv.console.token
        req = urllib.request.Request(
            base + f"/requeue?dir={out}",
            method="POST",
            headers={"X-Console-Token": token},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            body = json.loads(resp.read())
        assert body["count"] == 1

        # a foreign Host header (DNS rebinding) is rejected even on GET
        try:
            urllib.request.urlopen(
                urllib.request.Request(
                    base + "/jobs", headers={"Host": "evil.example.com"}
                ),
                timeout=10,
            )
            raise AssertionError("foreign Host should 403")
        except urllib.error.HTTPError as exc:
            assert exc.code == 403

        # mutations require POST; GET on /requeue is not routed
        try:
            urllib.request.urlopen(base + f"/requeue?dir={out}", timeout=10)
            raise AssertionError("GET /requeue should 404")
        except urllib.error.HTTPError as exc:
            assert exc.code == 404

        # directory traversal outside the console root is rejected
        try:
            urllib.request.urlopen(base + "/status?dir=/etc", timeout=10)
            raise AssertionError("outside-root dir should 403")
        except urllib.error.HTTPError as exc:
            assert exc.code == 403
    finally:
        srv.shutdown()


def test_console_server_routes_unit():
    c = ConsoleServer("/tmp")
    code, payload = c.handle("GET", "/nope", {})
    assert code == 404
    code, payload = c.handle("GET", "/status", {})
    assert code == 400 and "missing" in payload["error"]


def test_predefined_commands(tmp_path):
    """Allow-listed command execution (the reference admin's run
    surface): only registered names run, by exact name."""
    cmds = {
        "echo-version": [sys.executable, "-c", "print('tcr 4.0')"],
        "fail": [sys.executable, "-c", "import sys; sys.exit(3)"],
    }
    c = ConsoleServer(str(tmp_path), commands=cmds)

    code, listing = c.handle("GET", "/commands", {})
    assert code == 200 and listing == {"commands": ["echo-version", "fail"]}

    tok = {"token": c.token}
    code, res = c.handle("POST", "/run", {"name": "echo-version", **tok})
    assert code == 200 and res["returncode"] == 0 and "tcr 4.0" in res["stdout"]

    code, res = c.handle("POST", "/run", {"name": "fail", **tok})
    assert code == 200 and res["returncode"] == 3

    # NOT in the allow-list: refused, never executed
    code, res = c.handle("POST", "/run", {"name": "rm -rf /", **tok})
    assert code == 403
    # no/wrong token: refused before the allow-list is even consulted
    code, res = c.handle("POST", "/run", {"name": "echo-version"})
    assert code == 401
    code, res = c.handle("POST", "/run", {"name": "echo-version", "token": "x"})
    assert code == 401
    # header auth works too
    code, res = c.handle(
        "POST", "/run", {"name": "echo-version"}, headers={"X-Console-Token": c.token}
    )
    assert code == 200
    # mutating route requires POST
    code, res = c.handle("GET", "/run", {"name": "echo-version"})
    assert code == 404
