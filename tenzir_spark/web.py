"""Pipeline-management REST API — the reference `web` plugin's
`/api/v0` surface re-expressed over Spark.

Contract: /root/reference/web/openapi/openapi.yaml (paths /ping,
/pipeline/{create,delete,list,reset-ttl,update,launch}, /serve;
TenzirToken apiKey auth via the X-Tenzir-Token header) and the plugin's
rest handlers (plugins/web/src/restinio_server.cpp). Pipelines are TQL
strings managed by id: create parses (and optionally starts), update
drives the start/pause/stop state machine, list reports PipelineInfo
rows with per-operator entries, reset-ttl extends hidden pipelines'
lifetimes, launch appends a `serve` sink to open pipelines so clients
can page results over /serve.

Spark mapping (the honest divergences, each marked in place):

- **stop is real cancellation**: every pipeline runs in its own thread
  under a Spark job group named by the pipeline id (PySpark pins Python
  threads to JVM threads, so groups don't leak across pipelines);
  `action: stop` cancels the group, interrupting running stages.
- **pause is bookkeeping only**: Spark has no task-level suspend for
  batch jobs. `pause` transitions the state (and `start` resumes =
  restarts a finished/paused run), but an in-flight job runs on —
  documented divergence from the reference's suspendable pipelines.
- **metrics are egress-side**: an `Observation` on the frame feeding
  the sink counts delivered events (plus wall seconds); the reference's
  per-operator ingress/egress instrumentation has no per-operator
  boundary inside one fused Catalyst plan — by design, fusing is where
  the speed comes from.
"""
from __future__ import annotations

import json
import shlex
import threading
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tenzir_spark import __version__ as _pkg_version
from tenzir_spark.plans.tql import SINK_OPS


def _split_segments(text: str) -> list[str]:
    """Quote-aware top-level split on '|'."""
    out, cur, quote = [], [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "|":
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return [s for s in out if s]


def _parse_ttl(ttl) -> float | None:
    """'5.0m' / '30s' / '1h' / numeric seconds -> seconds."""
    if ttl is None:
        return None
    if isinstance(ttl, (int, float)):
        return float(ttl)
    s = str(ttl).strip()
    for suffix, mult in (("ms", 1e-3), ("s", 1.0), ("m", 60.0),
                         ("h", 3600.0), ("d", 86400.0)):
        if s.endswith(suffix) and s[:-len(suffix)].replace(
                ".", "", 1).lstrip("-").isdigit():
            return float(s[:-len(suffix)]) * mult
    return float(s)


class ManagedPipeline:
    def __init__(self, pid: str, definition: str, name: str,
                 hidden: bool = False, ttl: float | None = None,
                 restart_with_node: bool = False):
        self.id = pid
        self.definition = definition
        self.name = name or pid
        self.hidden = hidden
        self.ttl = ttl
        self.deadline = time.monotonic() + ttl if ttl else None
        self.restart_with_node = restart_with_node
        self.labels: list = []
        self.state = "created"
        self.error = ""
        self.metrics: dict = {}
        self.thread: threading.Thread | None = None

    def info(self) -> dict:
        segments = _split_segments(self.definition)
        return {
            "id": self.id,
            "name": self.name,
            "definition": self.definition,
            "state": self.state,
            "error": self.error,
            "restart_with_node": self.restart_with_node,
            "operators": [
                {"id": f"{self.id}-{i}", "definition": seg,
                 # per-operator instrumentation has no boundary inside a
                 # fused Catalyst plan (module docstring)
                 "instrumented": False}
                for i, seg in enumerate(segments)
            ],
            "diagnostics": [],
            "metrics": self.metrics,
            "labels": self.labels,
        }


class PipelineApi:
    """The node REST API: pipeline CRUD + /serve, one HTTP server."""

    def __init__(self, spark: SparkSession, serve_manager=None,
                 token: str | None = None, version: str | None = None):
        self.spark = spark
        self.serve_manager = serve_manager
        self.token = token
        self.version = version or f"tenzir-spark/{_pkg_version}"
        self.pipelines: dict[str, ManagedPipeline] = {}
        self._lock = threading.Lock()
        self._httpd = None
        self._reaper: threading.Thread | None = None
        self._stop = threading.Event()

    # ------------------------------------------------------------- core

    def create(self, params: dict) -> dict:
        definition = params.get("definition")
        if not definition or not isinstance(definition, str):
            raise ValueError("missing pipeline definition")
        hidden = bool(params.get("hidden", False))
        start = bool(params.get("start_when_created", False))
        ttl = _parse_ttl(params.get("ttl"))
        if hidden and not start:
            raise ValueError("hidden pipelines must set start_when_created")
        if hidden and ttl is None:
            raise ValueError("hidden pipelines must set a ttl")
        if hidden and params.get("restart_with_node"):
            raise ValueError("hidden pipelines cannot restart with the node")
        # parse now so /create surfaces diagnostics, not the first run
        from tenzir_spark.plans.tql import parse_pipeline
        try:
            parse_pipeline(definition, spark=self.spark)
        except Exception as exc:
            raise ValueError(f"invalid pipeline: {exc}") from exc
        pid = uuid.uuid4().hex[:12]
        mp = ManagedPipeline(
            pid, definition, params.get("name", ""), hidden=hidden,
            ttl=ttl, restart_with_node=bool(params.get(
                "restart_with_node", False)))
        with self._lock:
            self.pipelines[pid] = mp
        if start:
            self._start(mp)
        return {"id": pid}

    def launch(self, params: dict) -> dict:
        serve_id = params.get("serve_id")
        if not serve_id:
            raise ValueError("missing serve_id")
        definition = params.get("definition") or ""
        segments = _split_segments(definition)
        if segments and shlex.split(segments[-1])[0] in SINK_OPS:
            # ends with a predefined sink: deployable as-is
            return {"deployable": True}
        buf = params.get("serve_buffer_size")
        tail = f"serve {serve_id}" + (f" --buffer-size {buf}" if buf else "")
        created = self.create({**params,
                               "definition": f"{definition} | {tail}",
                               "start_when_created": True})
        # /create contract: "the response is only sent after the
        # pipeline was successfully started" — for launch that means the
        # serve buffer is registered, else the client's first /serve
        # poll races the pipeline thread and 404s
        if self.serve_manager is not None:
            deadline = time.monotonic() + 30
            while not self.serve_manager.has_buffer(serve_id):
                mp = self.pipelines.get(created["id"])
                if mp is not None and mp.state == "failed":
                    raise ValueError(f"pipeline failed to start: {mp.error}")
                if time.monotonic() > deadline:
                    raise ValueError("pipeline did not register its serve "
                                     "buffer within 30s")
                time.sleep(0.05)
        return {"id": created["id"]}

    def delete(self, pid: str) -> dict:
        with self._lock:
            mp = self.pipelines.pop(pid, None)
        if mp is None:
            raise KeyError(f"unknown pipeline {pid!r}")
        self._cancel(mp)
        return {}

    def list(self) -> dict:
        with self._lock:
            rows = [mp.info() for mp in self.pipelines.values()
                    if not mp.hidden]
        return {"pipelines": rows}

    def reset_ttl(self, ids: list[str]) -> dict:
        done = []
        with self._lock:
            for pid in ids:
                mp = self.pipelines.get(pid)
                if mp is not None and mp.ttl:
                    mp.deadline = time.monotonic() + mp.ttl
                    done.append(pid)
        return {"ids": done}

    def update(self, params: dict) -> dict:
        pid = params.get("id")
        with self._lock:
            mp = self.pipelines.get(pid)
        if mp is None:
            raise KeyError(f"unknown pipeline {pid!r}")
        if "name" in params:
            mp.name = params["name"]
        if "restart_with_node" in params:
            mp.restart_with_node = bool(params["restart_with_node"])
        if "labels" in params:
            mp.labels = params["labels"]
        action = params.get("action")
        if action == "start":
            if not (mp.thread and mp.thread.is_alive()):
                self._start(mp)
            else:
                mp.state = "running"
        elif action == "pause":
            # bookkeeping only — no task-level suspend in Spark batch
            # (module docstring divergence note)
            mp.state = "paused"
        elif action == "stop":
            self._cancel(mp)
            mp.state = "stopped"
        elif action is not None:
            raise ValueError(f"unknown action {action!r}")
        return {"pipeline": mp.info()}

    # -------------------------------------------------------- execution

    def _start(self, mp: ManagedPipeline) -> None:
        mp.state = "running"
        mp.error = ""
        mp.thread = threading.Thread(target=self._run, args=(mp,),
                                     daemon=True)
        mp.thread.start()

    def _cancel(self, mp: ManagedPipeline) -> None:
        if mp.thread and mp.thread.is_alive():
            mp.state = "stopped"
            try:
                self.spark.sparkContext.cancelJobGroup(mp.id)
            except Exception:
                pass

    def _run(self, mp: ManagedPipeline) -> None:
        from pyspark.sql import Observation

        from tenzir_spark.plans.tql import parse_pipeline
        sc = self.spark.sparkContext
        t0 = time.time()
        obs = None
        try:
            # job group names this thread's jobs so stop() can cancel
            # exactly this pipeline's stages
            sc.setJobGroup(mp.id, mp.definition, interruptOnCancel=True)
            p = parse_pipeline(mp.definition, spark=self.spark)
            if getattr(p, "_pending_sink", None) is None:
                raise ValueError("pipeline is not closed (missing sink)")
            if not p.df.isStreaming:
                obs = Observation(f"egress_{mp.id}_{int(t0)}")
                p._df = p._df.observe(obs, F.count(F.lit(1)).alias("rows"))
            p.run()
            if mp.state == "stopped":  # cancelled mid-run
                return
            if obs is not None:
                rows = int(obs.get.get("rows", 0))
                mp.metrics = {"total": {"egress": {
                    "unit": "events", "num_elements": rows,
                    "total_seconds": round(time.time() - t0, 3)}}}
            mp.state = "stopped"  # batch pipeline ran to completion
        except Exception as exc:
            if mp.state != "stopped":
                mp.state = "failed"
                mp.error = str(exc)
        finally:
            try:
                sc.setJobGroup(None, None)
            except Exception:
                pass

    # ------------------------------------------------------------- http

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if api.token is None:
                    return True
                return self.headers.get("X-Tenzir-Token") == api.token

            def _route(self) -> str:
                path = self.path.split("?", 1)[0].rstrip("/")
                if path.startswith("/api/v0"):
                    path = path[len("/api/v0"):] or "/"
                return path

            def do_GET(self):
                if not self._authed():
                    return self._reply(401, {"error": "Not authenticated."})
                if self._route() == "/ping":
                    return self._reply(200, {"version": api.version})
                return self._reply(404, {"error": "unknown endpoint"})

            def do_POST(self):
                if not self._authed():
                    return self._reply(401, {"error": "Not authenticated."})
                route = self._route()
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as exc:
                    return self._reply(400, {"error": f"bad JSON: {exc}"})
                try:
                    if route == "/ping":
                        return self._reply(200, {"version": api.version})
                    if route == "/pipeline/create":
                        return self._reply(200, api.create(req))
                    if route == "/pipeline/launch":
                        return self._reply(200, api.launch(req))
                    if route == "/pipeline/delete":
                        return self._reply(200, api.delete(req["id"]))
                    if route == "/pipeline/list":
                        return self._reply(200, api.list())
                    if route == "/pipeline/reset-ttl":
                        return self._reply(200, api.reset_ttl(req["ids"]))
                    if route == "/pipeline/update":
                        return self._reply(200, api.update(req))
                    if route == "/serve" and api.serve_manager is not None:
                        code, obj = api.serve_manager.serve_request(req)
                        return self._reply(code, obj)
                except (KeyError, ValueError) as exc:
                    return self._reply(400, {"error": str(exc)})
                return self._reply(404, {"error": "unknown endpoint"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        self._reaper = threading.Thread(target=self._reap, daemon=True)
        self._reaper.start()
        return self._httpd.server_address[1]

    def _reap(self) -> None:
        """TTL enforcement: expired pipelines are cancelled + removed
        (the /create `ttl` contract; /pipeline/reset-ttl extends)."""
        while not self._stop.wait(0.25):
            now = time.monotonic()
            with self._lock:
                dead = [pid for pid, mp in self.pipelines.items()
                        if mp.deadline is not None and now > mp.deadline]
                expired = [self.pipelines.pop(pid) for pid in dead]
            for mp in expired:
                self._cancel(mp)

    def shutdown(self) -> None:
        self._stop.set()
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
