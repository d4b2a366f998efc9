"""Pipeline-management REST API — the reference's `web` plugin surface.

Reference: ``web/openapi/openapi.yaml:270-560`` (paths /ping,
/pipeline/create, /pipeline/list, /pipeline/update, /pipeline/delete,
/pipeline/reset-ttl, /pipeline/launch, /serve, /status) and
``plugins/web/src/restinio_server.cpp`` (token auth via the
``X-Tenzir-Token`` header). This module serves the same contract from
stdlib ``ThreadingHTTPServer`` — managed TQL pipelines with the
OpenAPI state machine (created / running / paused / failed / stopped),
TTL expiry, labels, per-operator listing, and ingress/egress metrics —
with /serve delegated to the existing ServeManager buffers.

Spark notes on the state machine:
- ``start`` runs the TQL definition on a background thread inside a
  Spark job group named by the pipeline id, so ``stop`` is a real
  ``cancelJobGroup`` — not a cooperative flag.
- ``pause`` is supported for STREAMING pipelines (the query stops;
  restart resumes from the checkpoint). A batch pipeline cannot pause
  mid-job (Spark has no job-suspend), so pause returns 400 for batch —
  a documented divergence, the honest mapping of the reference's
  actor-runtime pause onto Spark's execution model.
- A batch pipeline that runs to completion transitions to ``stopped``
  (the OpenAPI enum has no terminal success state; the reference's
  pipelines are long-running by default).
"""

from __future__ import annotations

import itertools
import json
import threading
import time

from tenzir_spark.serve import ServeManager, default_manager

_STATES = ("created", "running", "paused", "failed", "stopped")


def _split_operators(definition: str) -> list[dict]:
    """Operator listing for PipelineInfo (openapi.yaml:246-258): the
    reference enumerates the pipeline's operators with per-operator ids.
    Split on top-level '|' (quote-aware — a pipe inside a string literal
    is payload, not an operator boundary)."""
    ops: list[str] = []
    cur: list[str] = []
    quote = None
    for ch in definition:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "|":
            ops.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    ops.append("".join(cur).strip())
    return [
        {"id": str(i), "definition": op, "instrumented": True}
        for i, op in enumerate(o for o in ops if o)
    ]


def _parse_ttl(v) -> float | None:
    if v is None:
        return None
    s = str(v).strip()
    for suffix, mult in (("ms", 1e-3), ("min", 60.0), ("h", 3600.0),
                        ("m", 60.0), ("s", 1.0)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    return float(s)


class ManagedPipeline:
    """One managed pipeline: definition + state machine + run thread."""

    def __init__(self, pid: str, definition: str, name: str,
                 hidden: bool = False, ttl: float | None = None,
                 restart_with_node: bool = False):
        self.id = pid
        self.name = name or pid
        self.definition = definition
        self.hidden = hidden
        self.ttl = ttl
        self.restart_with_node = restart_with_node
        self.labels: list[dict] = []
        self.state = "created"
        self.error: str | None = None
        self.metrics: dict = {}
        self._thread: threading.Thread | None = None
        self._stream_query = None
        self._ttl_timer: threading.Timer | None = None

    def info(self) -> dict:
        out = {
            "id": self.id,
            "name": self.name,
            "definition": self.definition,
            "state": self.state,
            "restart_with_node": self.restart_with_node,
            "operators": _split_operators(self.definition),
            "labels": self.labels,
        }
        if self.error is not None:
            out["error"] = self.error
        if self.metrics:
            out["metrics"] = self.metrics
        return out


class PipelineManager:
    """The /pipeline CRUD + lifecycle endpoint group."""

    def __init__(self, spark, serve_manager: ServeManager | None = None,
                 token: str | None = None):
        self.spark = spark
        self.serve_manager = serve_manager or default_manager()
        self.token = token
        self._pipelines: dict[str, ManagedPipeline] = {}
        self._lock = threading.Lock()
        self._ids = itertools.count(1)
        self._httpd = None
        self._thread = None

    # ------------------------------------------------------------- core

    def create(self, definition: str, name: str = "",
               start_when_created: bool = False, hidden: bool = False,
               ttl=None, restart_with_node: bool = False) -> ManagedPipeline:
        if not definition or not definition.strip():
            raise ValueError("definition must be a non-empty pipeline")
        ttl_s = _parse_ttl(ttl)
        if hidden and not start_when_created:
            raise ValueError(
                "hidden pipelines must set start_when_created")
        if hidden and ttl_s is None:
            raise ValueError("hidden pipelines must set a ttl")
        with self._lock:
            pid = str(next(self._ids))
            p = ManagedPipeline(pid, definition, name, hidden, ttl_s,
                                restart_with_node)
            self._pipelines[pid] = p
        if ttl_s is not None:
            self._arm_ttl(p)
        if start_when_created:
            self.start(pid)
            # surface an immediate failure the way the reference does
            # (the create response carries the diagnostics and the
            # pipeline is discarded) — but return promptly once the run
            # survives a startup grace window, so creating a streaming
            # pipeline doesn't block the response until the thread ends
            grace = time.time() + 2.0
            while time.time() < grace and p._thread.is_alive():
                time.sleep(0.05)
            if p.state == "failed":
                with self._lock:
                    self._pipelines.pop(pid, None)
                raise ValueError(p.error or "pipeline failed to start")
        return p

    def get(self, pid: str) -> ManagedPipeline:
        with self._lock:
            p = self._pipelines.get(str(pid))
        if p is None:
            raise KeyError(f"unknown pipeline id {pid!r}")
        return p

    def list(self) -> list[dict]:
        with self._lock:
            ps = [p for p in self._pipelines.values() if not p.hidden]
        return [p.info() for p in ps]

    def start(self, pid: str) -> ManagedPipeline:
        p = self.get(pid)
        if p.state == "running":
            return p
        p.state = "running"
        p.error = None

        def run():
            from tenzir_spark.plans.tql import exec_pipeline
            sc = self.spark.sparkContext
            sc.setJobGroup(f"pipeline-{p.id}",
                           f"managed pipeline {p.name}", True)
            t0 = time.time()
            try:
                result = exec_pipeline(p.definition, spark=self.spark)
                if result is not None and hasattr(result, "isStreaming") \
                        and result.isStreaming:
                    # definition produced an unsunk stream: hold it —
                    # stop/pause manage the query
                    q = (result.writeStream.format("noop")
                         .queryName(f"pipeline-{p.id}").start())
                    p._stream_query = q
                    q.awaitTermination()
                    n = None
                elif result is not None and hasattr(result, "count"):
                    # unsunk batch DataFrame: materialize for effect and
                    # report egress (the reference rejects sinkless
                    # definitions at /create; accepting them with an
                    # implicit count-sink keeps the API usable from
                    # tests and notebooks)
                    n = result.count()
                else:
                    n = result if isinstance(result, int) else None
                if p.state == "running":
                    p.state = "stopped"  # ran to completion
                if n is not None:
                    p.metrics = {"total": {"egress": {
                        "unit": "events", "num_elements": int(n),
                        "total_seconds": time.time() - t0}}}
            except Exception as exc:  # surfaced via PipelineInfo.error
                if p.state != "stopped":
                    p.state = "failed"
                    p.error = str(exc)
            finally:
                sc.setJobGroup("", "")

        p._thread = threading.Thread(target=run, daemon=True)
        p._thread.start()
        return p

    def stop(self, pid: str) -> ManagedPipeline:
        p = self.get(pid)
        if p.state == "running":
            p.state = "stopped"
            if p._stream_query is not None:
                p._stream_query.stop()
                p._stream_query = None
            else:
                self.spark.sparkContext.cancelJobGroup(f"pipeline-{p.id}")
        elif p.state == "paused":
            p.state = "stopped"
        return p

    def pause(self, pid: str) -> ManagedPipeline:
        p = self.get(pid)
        if p.state != "running":
            raise ValueError(f"cannot pause a pipeline in state {p.state!r}")
        if p._stream_query is None:
            raise ValueError(
                "cannot pause a batch pipeline mid-job (Spark has no "
                "job suspend); streaming pipelines pause by stopping "
                "the query and resume from the checkpoint")
        p._stream_query.stop()
        p._stream_query = None
        p.state = "paused"
        return p

    def delete(self, pid: str) -> None:
        p = self.get(pid)
        self.stop(pid) if p.state in ("running", "paused") else None
        with self._lock:
            self._pipelines.pop(str(pid), None)
        if p._ttl_timer:
            p._ttl_timer.cancel()

    def reset_ttl(self, ids: list[str]) -> list[str]:
        done = []
        for pid in ids:
            try:
                p = self.get(pid)
            except KeyError:
                continue
            if p.ttl is not None:
                self._arm_ttl(p)
                done.append(str(pid))
        return done

    def launch(self, definition: str, **kw) -> dict:
        """/pipeline/launch (openapi.yaml:512-522): a definition WITHOUT
        a sink gets a `serve <id>` sink appended and is created+started;
        one that already ends in a sink is reported deployable."""
        from tenzir_spark.plans.tql import parse_ends_with_sink
        if parse_ends_with_sink(definition):
            return {"deployable": True}
        with self._lock:
            pid = str(next(self._ids))
        served = f"{definition} | serve {pid}"
        p = ManagedPipeline(pid, served, kw.get("name", ""),
                            kw.get("hidden", False),
                            _parse_ttl(kw.get("ttl")),
                            kw.get("restart_with_node", False))
        with self._lock:
            self._pipelines[pid] = p
        if p.ttl is not None:
            self._arm_ttl(p)
        self.start(pid)
        return {"id": pid}

    def status(self, component: str | None = None,
               verbosity: str = "info") -> dict:
        """/status (openapi.yaml:656-698): current status of the whole
        node — catalog (the process-default node store), version, and
        this manager's pipelines; `component` filters to one key,
        `verbosity` detailed/debug adds per-state pipeline counts and
        the store root. The reference proxies its node status command;
        here the node IS the Spark session + node store + managers."""
        import glob
        import os

        from tenzir_spark import __version__
        from tenzir_spark.plans.registry import node_store

        store = node_store()
        num_parts = 0
        mem = 0
        if "://" not in store.root and os.path.isdir(store.root):
            for f in glob.glob(os.path.join(store.root, "**", "*.parquet"),
                               recursive=True) + \
                    glob.glob(os.path.join(store.root, "**", "part-*"),
                              recursive=True):
                if os.path.isfile(f):
                    num_parts += 1
                    mem += os.path.getsize(f)
        with self._lock:
            infos = [p.info() for p in self._pipelines.values()]
        status: dict = {
            "catalog": {"num-partitions": num_parts, "memory-usage": mem},
            "version": {"Tenzir": __version__},
            "pipeline-manager": {"num-pipelines": len(infos)},
        }
        if verbosity in ("detailed", "debug"):
            by_state: dict[str, int] = {}
            for i in infos:
                by_state[i["state"]] = by_state.get(i["state"], 0) + 1
            status["pipeline-manager"]["pipelines-by-state"] = by_state
            status["catalog"]["store-root"] = store.root
        if verbosity == "debug":
            status["system"] = {
                "spark-master": self.spark.sparkContext.master,
                "spark-version": self.spark.version,
            }
        if component is not None:
            if component not in status:
                raise ValueError(f"unknown component {component!r}")
            return {component: status[component]}
        return status

    def _arm_ttl(self, p: ManagedPipeline) -> None:
        if p._ttl_timer:
            p._ttl_timer.cancel()
        t = threading.Timer(p.ttl, lambda: self._expire(p.id))
        t.daemon = True
        t.start()
        p._ttl_timer = t

    def _expire(self, pid: str) -> None:
        try:
            self.delete(pid)
        except KeyError:
            pass

    # ------------------------------------------------------------- http

    def start_server(self, host: str = "127.0.0.1", port: int = 0) -> int:
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        mgr = self

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
                if mgr.token is None:
                    return True
                return self.headers.get("X-Tenzir-Token") == mgr.token

            def do_GET(self):
                if not self._authed():
                    return self._reply(401, {"error": "not authenticated"})
                path = self.path.rstrip("/")
                if path.endswith("/ping"):
                    from tenzir_spark import __version__
                    return self._reply(200, {"version": __version__})
                return self._reply(404, {"error": "unknown endpoint"})

            def do_POST(self):
                if not self._authed():
                    return self._reply(401, {"error": "not authenticated"})
                path = self.path.rstrip("/")
                if path.startswith("/api/v0"):
                    path = path[len("/api/v0"):]
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as exc:
                    return self._reply(400, {"error": f"bad json: {exc}"})
                try:
                    if path == "/pipeline/create":
                        p = mgr.create(
                            req.get("definition", ""),
                            name=req.get("name", ""),
                            start_when_created=req.get(
                                "start_when_created", False),
                            hidden=req.get("hidden", False),
                            ttl=req.get("ttl"),
                            restart_with_node=req.get(
                                "restart_with_node", False))
                        return self._reply(200, {"id": p.id})
                    if path == "/pipeline/list":
                        return self._reply(200, {"pipelines": mgr.list()})
                    if path == "/pipeline/delete":
                        mgr.delete(req["id"])
                        return self._reply(200, {})
                    if path == "/pipeline/reset-ttl":
                        return self._reply(
                            200, {"ids": mgr.reset_ttl(req["ids"])})
                    if path == "/pipeline/launch":
                        return self._reply(200, mgr.launch(
                            req.get("definition", ""), **{
                                k: v for k, v in req.items()
                                if k != "definition"}))
                    if path == "/pipeline/update":
                        p = mgr.get(req["id"])
                        action = req.get("action")
                        if action == "start":
                            p = mgr.start(p.id)
                        elif action == "stop":
                            p = mgr.stop(p.id)
                        elif action == "pause":
                            p = mgr.pause(p.id)
                        elif action is not None:
                            raise ValueError(f"unknown action {action!r}")
                        if "name" in req:
                            p.name = req["name"]
                        if "restart_with_node" in req:
                            p.restart_with_node = bool(
                                req["restart_with_node"])
                        if "labels" in req:
                            p.labels = req["labels"]
                        return self._reply(200, {"pipeline": p.info()})
                    if path == "/status":
                        return self._reply(200, mgr.status(
                            req.get("component"),
                            req.get("verbosity", "info")))
                    if path == "/serve":
                        # delegate to the serve buffers (serve.py owns
                        # the contract; reuse its handler logic)
                        serve_id = req["serve_id"]
                        with mgr.serve_manager._lock:
                            buf = mgr.serve_manager._buffers.get(serve_id)
                        if buf is None:
                            with mgr._lock:
                                managed = serve_id in mgr._pipelines
                            if managed:
                                # launch()'s pipeline may not have
                                # attached its sink yet: get-or-create
                                # converges on the same buffer object
                                buf = mgr.serve_manager.buffer(serve_id)
                            else:
                                return self._reply(404, {
                                    "error":
                                    f"unknown serve id {serve_id!r}"})
                        from tenzir_spark.serve import _parse_timeout
                        resp = buf.get(req.get("continuation_token"),
                                       req.get("max_events"),
                                       _parse_timeout(
                                           req.get("timeout", "100ms")))
                        return self._reply(200, resp)
                    return self._reply(404, {"error": "unknown endpoint"})
                except KeyError as exc:
                    return self._reply(400, {"error": f"missing/unknown: {exc}"})
                except ValueError as exc:
                    return self._reply(400, {"error": str(exc)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def shutdown(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
