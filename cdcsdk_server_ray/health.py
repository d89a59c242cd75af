"""Liveness/health surface (E10) — the /q/health analogue.

Reference: ``ConnectorLifecycle`` exposes a SmallRye health check named
"cdcsdk-server" whose status is UP while every engine task is live
(/root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/com/yugabyte/cdcsdk/server/ConnectorLifecycle.java:108-117),
served by Quarkus at /q/health (README.md:344-383).

Ray-Data form, two pieces:

1. a HEARTBEAT file the engine refreshes after every window
   (engine.py finish()) — the task-liveness signal, durable across the
   process so an external prober needs no RPC into the driver;
2. :class:`HealthServer` — a loopback ``http.server`` thread serving

       GET /q/health   → SmallRye-shaped JSON, status UP while the
                         heartbeat is fresher than ``stale_after_s``
       GET /q/metrics  → the Micrometer-counter analogue (lineage totals
                         from the committed manifest)

No network beyond loopback; in a real deployment the same process would
bind a routable interface.
"""

from __future__ import annotations

import json
import os
import threading
import time

HEARTBEAT_NAME = "HEARTBEAT.json"


def heartbeat_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_checkpoints", HEARTBEAT_NAME)


def write_heartbeat(lake_dir: str, *, epoch: int, committed_lsn: int,
                    windows_done: int) -> None:
    """Advisory liveness marker (atomic replace, NOT fsynced — losing a
    heartbeat on power loss is fine; the manifest is the durable truth)."""
    path = heartbeat_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"ts": time.time(), "pid": os.getpid(), "epoch": epoch,
                   "committed_lsn": committed_lsn,
                   "windows_done": windows_done}, f)
    os.replace(tmp, path)


def read_heartbeat(lake_dir: str) -> dict | None:
    try:
        with open(heartbeat_path(lake_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _load_manifest_any_backend(lake_dir: str):
    """Health probes are backend-agnostic readers: detect which offset
    backend committed state on disk ('log' vs 'file') instead of assuming
    'file' — a 'log' lake probed with the default backend would report
    zero counters and no epoch despite committed state."""
    from cdcsdk_server_ray.state.manifest import (detect_backend,
                                                  load_current_manifest)
    backend = detect_backend(lake_dir)
    if backend is None:
        return None
    return load_current_manifest(lake_dir, backend=backend)


def health_payload(lake_dir: str, stale_after_s: float = 300.0) -> dict:
    """SmallRye-shaped health document (≙ HealthCheckResponse.named(...))."""
    hb = read_heartbeat(lake_dir)
    age = (time.time() - hb["ts"]) if hb else None
    live = hb is not None and age <= stale_after_s
    m = _load_manifest_any_backend(lake_dir)
    data = {"heartbeat_age_s": round(age, 1) if age is not None else None}
    if m is not None:
        data.update({
            "epoch": m.epoch,
            "committed_lsn": m.committed_lsn,
            "events_applied": sum(p.events_applied
                                  for p in m.partitions.values()),
        })
    return {
        "status": "UP" if live else "DOWN",
        "checks": [{"name": "cdcsdk-server",
                    "status": "UP" if live else "DOWN",
                    "data": data}],
    }


def metrics_payload(lake_dir: str) -> dict:
    """≙ the Micrometer counters (Metrics.java:14-24), from the manifest."""
    m = _load_manifest_any_backend(lake_dir)
    if m is None:
        return {"cdcsdk.sink.total.recordsWritten": 0,
                "cdcsdk.sink.total.bytesWritten": 0}
    return {
        "cdcsdk.sink.total.recordsWritten": sum(
            p.events_applied for p in m.partitions.values()),
        "cdcsdk.sink.total.bytesWritten": sum(
            p.bytes_written for p in m.partitions.values()),
        "cdcsdk.engine.dedup_drops": sum(
            p.dedup_drops for p in m.partitions.values()),
        "cdcsdk.engine.epoch": m.epoch,
        "cdcsdk.engine.committed_lsn": m.committed_lsn,
    }


class HealthServer:
    """Loopback health endpoint; start() binds an ephemeral (or given)
    port on 127.0.0.1 and serves from a daemon thread."""

    def __init__(self, lake_dir: str, port: int = 0,
                 stale_after_s: float = 300.0):
        self.lake_dir = lake_dir
        self.stale_after_s = stale_after_s
        self._requested_port = port
        self._httpd = None
        self._thread = None

    @property
    def port(self) -> int:
        return self._httpd.server_port

    def start(self) -> "HealthServer":
        from http.server import BaseHTTPRequestHandler, HTTPServer

        lake_dir, stale = self.lake_dir, self.stale_after_s

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                # strip query string: probes commonly append ?verbose etc.
                # and must not 404; and NEVER let a payload-building error
                # drop the connection — a prober should see DOWN/503, not
                # a socket reset (SmallRye serves a DOWN document too)
                route = self.path.split("?", 1)[0].rstrip("/")
                try:
                    if route == "/q/health":
                        doc = health_payload(lake_dir, stale)
                        code = 200 if doc["status"] == "UP" else 503
                    elif route == "/q/metrics":
                        doc, code = metrics_payload(lake_dir), 200
                    else:
                        doc, code = {"error": "not found"}, 404
                except Exception as e:            # noqa: BLE001
                    doc, code = {"status": "DOWN", "error": repr(e)}, 503
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._httpd = HTTPServer(("127.0.0.1", self._requested_port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
