"""Operator console over lineage + metrics parquet — the admin-UI
analog (reference ``tilecloud_chain/views/admin.py:257-434``: job
listing, status rollup, error tail, re-queue; job state machine
``store/postgresql.py:73-89,212-242``).

The reference operator watches a PostgreSQL-backed admin page; here
the same surfaces derive from the per-partition lineage JSON records
(``sinks/lineage.py``) and the per-stage metrics parquet
(``sinks/metrics.py``), exposed twice:

* **CLI** — ``python jobs/tcr.py jobs {list,status,errors,requeue}``
* **HTTP** — :class:`ConsoleServer`, a JSON API (``/jobs``,
  ``/status``, ``/errors``, ``/requeue``, ``/metrics``) for dashboards.

Re-queue semantics: a resumable run re-processes any partition whose
lineage is NOT ``done`` — so re-queuing = deleting the error records
(the next run picks those partitions up) and reporting which ones.
The reference's "re-queue errors" button does the same state flip
(error -> created, ``admin.py:257-307``).
"""

from __future__ import annotations

import json
import os
from typing import Any

from tilecloud_chain_ray.sinks import lineage as lin


def find_job_dirs(root: str, max_depth: int = 3) -> list[str]:
    """Directories under ``root`` holding a ``_lineage/`` folder (the
    out_dir of a resumable run), searched a few levels deep."""
    out: list[str] = []
    base_depth = root.rstrip(os.sep).count(os.sep)
    for dirpath, dirnames, _ in os.walk(root):
        if dirpath.count(os.sep) - base_depth > max_depth:
            dirnames.clear()
            continue
        if "_lineage" in dirnames:
            out.append(dirpath)
            dirnames.remove("_lineage")
    return sorted(out)


def list_jobs(root: str) -> list[dict[str, Any]]:
    """One row per run directory: job ids, partition counts, rollup
    counters, last activity — the admin job-listing table."""
    rows = []
    for d in find_job_dirs(root):
        recs = list(lin.load_records(d).values())
        if not recs:
            continue
        done = [r for r in recs if r.status == "done"]
        errors = [r for r in recs if r.status == "error"]
        rows.append(
            {
                "dir": d,
                "job_ids": sorted({r.job_id for r in recs}),
                "partitions": len(recs),
                "partitions_done": len(done),
                "partitions_error": len(errors),
                "tiles_stored": sum(r.tiles_stored for r in done)
                if any(r.tiles_generated for r in done)
                else sum(r.rows_out or 0 for r in done),
                "status": "error" if errors else "done",
                "last_activity": max(r.finished_at for r in recs),
            }
        )
    return rows


def job_status(out_dir: str, top_errors: int = 5) -> dict[str, Any]:
    """summarize + per-(status, zoom) rollup + recent errors + ETA."""
    return {
        "dir": out_dir,
        "summary": lin.summarize_lineage(out_dir),
        **lin.status_rollup(out_dir, top_errors=top_errors),
    }


def tail_errors(out_dir: str, n: int = 20) -> list[dict[str, Any]]:
    recs = [r for r in lin.load_records(out_dir).values() if r.status == "error"]
    recs.sort(key=lambda r: r.finished_at, reverse=True)
    return [
        {
            "partition_id": r.partition_id,
            "job_id": r.job_id,
            "error": r.error,
            "finished_at": r.finished_at,
            "zooms": r.zooms,
        }
        for r in recs[:n]
    ]


def requeue_errors(out_dir: str) -> dict[str, Any]:
    """Clear error lineage records so the next resumable run re-runs
    those partitions.  Returns the re-queued partition ids."""
    requeued = []
    for pid, rec in lin.load_records(out_dir).items():
        if rec.status == "error":
            os.remove(lin.record_path(out_dir, pid))
            requeued.append(pid)
    return {"requeued": sorted(requeued), "count": len(requeued)}


def metrics_summary(metrics_path: str) -> list[dict[str, Any]]:
    """Per-stage wall/cpu table from a metrics parquet written by
    ``sinks/metrics.write_metrics``."""
    import pyarrow.parquet as pq

    if os.path.isdir(metrics_path):
        files = [
            os.path.join(metrics_path, f)
            for f in sorted(os.listdir(metrics_path))
            if f.endswith(".parquet")
        ]
    else:
        files = [metrics_path]
    rows: list[dict[str, Any]] = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    return rows


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------


def run_predefined(
    commands: dict[str, list[str]], name: str, cwd: str, timeout: int = 300
) -> dict[str, Any]:
    """Execute ONE predefined command by exact name — the allow-listed
    command execution of the reference admin page
    (``views/admin.py:257-434`` + ``schema.json`` server.predefined_commands),
    tightened: only commands registered at server construction run, by
    name, never caller-supplied argv."""
    if name not in commands:
        raise KeyError(name)
    import subprocess

    proc = subprocess.run(
        commands[name],
        capture_output=True,
        text=True,
        cwd=cwd,
        timeout=timeout,
    )
    return {
        "name": name,
        "argv": commands[name],
        "returncode": proc.returncode,
        "stdout": proc.stdout[-65536:],
        "stderr": proc.stderr[-65536:],
    }


class ConsoleServer:
    """Minimal JSON API over the console functions.

    GET  /jobs                     -> list_jobs(root)
    GET  /status?dir=<out_dir>     -> job_status
    GET  /errors?dir=<out_dir>&n=N -> tail_errors
    POST /requeue?dir=<out_dir>    -> requeue_errors (mutating => POST)
    GET  /metrics?path=<parquet>   -> metrics_summary
    GET  /commands                 -> predefined command names
    POST /run?name=<command>       -> run_predefined (allow-listed only)

    ``dir``/``path`` are validated against ``root`` (realpath prefix)
    so the API can't be steered at arbitrary filesystem paths.

    State-changing routes (every POST) require a shared-secret token —
    ``?token=`` or an ``X-Console-Token`` header — generated at
    construction unless supplied.  Without it, any web page running in
    a browser on the same host could fire a no-cors cross-origin POST
    (CSRF) or use DNS rebinding to trigger allow-listed command
    execution even on a 127.0.0.1 bind; the reference admin UI this
    mirrors sits behind auth (``views/admin.py``)."""

    def __init__(
        self,
        root: str,
        commands: dict[str, list[str]] | None = None,
        token: str | None = None,
    ) -> None:
        import secrets

        self.root = os.path.realpath(root)
        self.commands = dict(commands or {})
        self.token = token if token is not None else secrets.token_hex(16)

    def _authorized(self, params: dict[str, str], headers: dict[str, str]) -> bool:
        import hmac

        supplied = params.get("token") or headers.get("x-console-token") or ""
        return hmac.compare_digest(supplied, self.token)

    def _check(self, path: str) -> str:
        real = os.path.realpath(path)
        if real != self.root and not real.startswith(self.root + os.sep):
            raise PermissionError(f"{path} outside console root")
        return real

    def handle(
        self,
        method: str,
        path: str,
        params: dict[str, str],
        headers: dict[str, str] | None = None,
    ) -> tuple[int, dict | list]:
        headers = {k.lower(): v for k, v in (headers or {}).items()}
        try:
            if method == "POST" and not self._authorized(params, headers):
                return 401, {"error": "missing or invalid console token"}
            if path == "/jobs" and method == "GET":
                return 200, list_jobs(self.root)
            if path == "/status" and method == "GET":
                return 200, job_status(self._check(params["dir"]))
            if path == "/errors" and method == "GET":
                return 200, tail_errors(self._check(params["dir"]), int(params.get("n", "20")))
            if path == "/requeue" and method == "POST":
                return 200, requeue_errors(self._check(params["dir"]))
            if path == "/metrics" and method == "GET":
                return 200, metrics_summary(self._check(params["path"]))
            if path == "/commands" and method == "GET":
                return 200, {"commands": sorted(self.commands)}
            if path == "/run" and method == "POST":
                name = params["name"]
                if name not in self.commands:
                    return 403, {"error": f"command {name!r} not in the allow-list"}
                return 200, run_predefined(self.commands, name, cwd=self.root)
            return 404, {"error": f"no route {method} {path}"}
        except PermissionError as exc:
            return 403, {"error": str(exc)}
        except KeyError as exc:
            return 400, {"error": f"missing parameter {exc}"}
        except OSError as exc:
            return 400, {"error": str(exc)}


def serve(
    root: str,
    port: int = 8081,
    host: str = "127.0.0.1",
    commands: dict[str, list[str]] | None = None,
    token: str | None = None,
):
    """Blocking HTTP server wrapping :class:`ConsoleServer`.  Returns
    the server object (``srv.console.token`` carries the POST token;
    ``port=0`` tests read the bound port).  Requests whose ``Host``
    header doesn't name the bind address are rejected (DNS-rebinding
    defense: a rebinding attack reaches the socket with the attacker's
    hostname in ``Host``)."""
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    console = ConsoleServer(root, commands=commands, token=token)
    allowed_hosts = {host, "localhost", "127.0.0.1", "::1"}

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, method: str) -> None:
            req_host = (self.headers.get("Host") or "").rsplit(":", 1)[0]
            if req_host not in allowed_hosts:
                status, payload = 403, {
                    "error": f"Host {req_host!r} does not match the bind address"
                }
            else:
                parsed = urllib.parse.urlsplit(self.path)
                params = dict(urllib.parse.parse_qsl(parsed.query))
                status, payload = console.handle(
                    method, parsed.path, params, headers=dict(self.headers)
                )
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            self._respond("GET")

        def do_POST(self):  # noqa: N802
            self._respond("POST")

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.console = console  # callers read srv.console.token for POSTs
    return srv
