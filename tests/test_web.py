"""Pipeline-management REST API tests (reference web plugin:
web/openapi/openapi.yaml paths /ping /pipeline/* /serve; token auth via
X-Tenzir-Token as in plugins/web/src/restinio_server.cpp)."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from tenzir_spark.plans.tql import parse_ends_with_sink
from tenzir_spark.web import PipelineManager, _split_operators


def _post(port, path, body=None, token=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json",
                 **({"X-Tenzir-Token": token} if token else {})},
        method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path, token=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        headers={**({"X-Tenzir-Token": token} if token else {})})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def mgr(spark):
    m = PipelineManager(spark)
    m.port = m.start_server()
    try:
        yield m
    finally:
        m.shutdown()


def test_split_operators_quote_aware():
    ops = _split_operators('from x | where a == "p|q" | select b')
    assert [o["definition"] for o in ops] == \
        ["from x", 'where a == "p|q"', "select b"]
    assert [o["id"] for o in ops] == ["0", "1", "2"]


def test_parse_ends_with_sink():
    assert parse_ends_with_sink("from x | to y.json")
    assert parse_ends_with_sink("from x | discard")
    assert parse_ends_with_sink("from x | serve abc")
    assert not parse_ends_with_sink("from x | where a > 1")
    assert not parse_ends_with_sink("from x | top serve_col")


def test_ping_and_auth(spark):
    m = PipelineManager(spark, token="sekrit")
    port = m.start_server()
    try:
        assert _get(port, "/api/v0/ping")[0] == 401
        code, body = _get(port, "/api/v0/ping", token="sekrit")
        assert code == 200 and "version" in body
        assert _post(port, "/api/v0/pipeline/list")[0] == 401
    finally:
        m.shutdown()


def test_create_list_update_delete(mgr, sf_dir):
    port = mgr.port
    code, body = _post(port, "/api/v0/pipeline/create", {
        "definition": f"from {sf_dir}/nation.parquet | head 5 | discard",
        "name": "nation-head"})
    assert code == 200
    pid = body["id"]
    code, body = _post(port, "/api/v0/pipeline/list")
    assert code == 200
    infos = {p["id"]: p for p in body["pipelines"]}
    assert infos[pid]["state"] == "created"
    assert infos[pid]["name"] == "nation-head"
    assert len(infos[pid]["operators"]) == 3
    # start it, wait for batch completion -> stopped
    code, body = _post(port, "/api/v0/pipeline/update",
                       {"id": pid, "action": "start"})
    assert code == 200
    deadline = time.time() + 60
    state = body["pipeline"]["state"]
    while state == "running" and time.time() < deadline:
        time.sleep(0.3)
        state = mgr.get(pid).state
    assert state == "stopped"
    assert mgr.get(pid).error is None
    # rename + labels via update
    code, body = _post(port, "/api/v0/pipeline/update", {
        "id": pid, "name": "renamed",
        "labels": [{"text": "prod", "color": "#ff0000"}]})
    assert body["pipeline"]["name"] == "renamed"
    assert body["pipeline"]["labels"][0]["text"] == "prod"
    # delete
    assert _post(port, "/api/v0/pipeline/delete", {"id": pid})[0] == 200
    assert _post(port, "/api/v0/pipeline/delete", {"id": pid})[0] == 400
    assert mgr.list() == []


def test_create_invalid_definition_rejected(mgr):
    code, body = _post(mgr.port, "/api/v0/pipeline/create", {
        "definition": "from /nonexistent.unknownformat | discard",
        "start_when_created": True})
    assert code == 400 and "error" in body


def test_launch_appends_serve_and_streams_results(mgr, sf_dir):
    """/pipeline/launch on a sinkless definition: a serve sink is
    appended and the results are retrievable via /serve (the reference's
    launch contract, openapi.yaml:512-522)."""
    port = mgr.port
    code, body = _post(port, "/api/v0/pipeline/launch", {
        "definition": f"from {sf_dir}/region.parquet | select r_name"
                      " | sort r_name"})
    assert code == 200 and "id" in body
    pid = body["id"]
    rows = []
    token = None
    for _ in range(100):
        code, resp = _post(port, "/api/v0/serve", {
            "serve_id": pid, "timeout": "1s", "max_events": 100,
            **({"continuation_token": token} if token else {})})
        assert code == 200
        for chunk in resp.get("data", []):
            rows.append(chunk["data"])  # one event per data entry
        token = resp.get("next_continuation_token")
        if token is None:
            break
    names = [r["r_name"] for r in rows]
    assert names == sorted(names) and len(names) == 5
    # a definition that already has a sink is deployable, not created
    code, body = _post(port, "/api/v0/pipeline/launch", {
        "definition": f"from {sf_dir}/region.parquet | discard"})
    assert code == 200 and body == {"deployable": True}


def test_ttl_expiry_and_reset(mgr, sf_dir):
    port = mgr.port
    code, body = _post(port, "/api/v0/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "ttl": "1.2s"})
    pid = body["id"]
    # reset keeps it alive past the original deadline
    time.sleep(0.8)
    code, body = _post(port, "/api/v0/pipeline/reset-ttl", {"ids": [pid]})
    assert body["ids"] == [pid]
    time.sleep(0.8)
    assert mgr.get(pid) is not None  # original ttl passed, reset held
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            mgr.get(pid)
            time.sleep(0.2)
        except KeyError:
            break
    with pytest.raises(KeyError):
        mgr.get(pid)


def test_pause_batch_rejected_stop_works(mgr, sf_dir):
    port = mgr.port
    code, body = _post(port, "/api/v0/pipeline/create", {
        "definition": f"from {sf_dir}/lineitem.parquet | summarize "
                      "n=count(.) by l_orderkey | discard"})
    pid = body["id"]
    _post(port, "/api/v0/pipeline/update", {"id": pid, "action": "start"})
    code, body = _post(port, "/api/v0/pipeline/update",
                       {"id": pid, "action": "pause"})
    # batch pipelines cannot pause (no Spark job suspend) — 400 while
    # running, or the job already finished (stopped) which is also 400
    assert code == 400
    code, body = _post(port, "/api/v0/pipeline/update",
                       {"id": pid, "action": "stop"})
    assert code == 200 and body["pipeline"]["state"] == "stopped"


def test_hidden_pipeline_not_listed(mgr, sf_dir):
    code, body = _post(mgr.port, "/api/v0/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "hidden": True, "start_when_created": True, "ttl": "60s"})
    assert code == 200
    assert all(p["id"] != body["id"] for p in mgr.list())
    # hidden requires start_when_created + ttl
    code, _ = _post(mgr.port, "/api/v0/pipeline/create", {
        "definition": "x | discard", "hidden": True})
    assert code == 400


def test_create_returns_promptly_for_long_running_pipeline(mgr):
    """create(start_when_created) must not block until the run thread
    ends: it waits only a short startup-grace window (to surface an
    immediate failure, as the reference does) and then returns with the
    pipeline still running. Regression: the old implementation joined
    the thread for up to 30 s, so creating a streaming/long pipeline
    stalled the create response."""
    t0 = time.time()
    code, body = _post(mgr.port, "/api/v0/pipeline/create", {
        "definition": 'shell "sleep 8; echo done" | read lines | discard',
        "start_when_created": True})
    elapsed = time.time() - t0
    assert code == 200
    p = mgr.get(body["id"])
    assert p.state == "running"
    assert elapsed < 6.0, f"create blocked {elapsed:.1f}s on a running pipeline"
    _post(mgr.port, "/api/v0/pipeline/update",
          {"id": body["id"], "action": "stop"})
    _post(mgr.port, "/api/v0/pipeline/delete", {"id": body["id"]})


def test_status_endpoint(mgr, sf_dir):
    """/status (openapi.yaml:656-698): whole-node status with component
    filter and verbosity levels."""
    port = mgr.port
    code, body = _post(port, "/api/v0/status")
    assert code == 200
    assert set(body) >= {"catalog", "version", "pipeline-manager"}
    assert "num-partitions" in body["catalog"]
    assert "memory-usage" in body["catalog"]
    assert "Tenzir" in body["version"]
    # component filter mirrors the reference's ?component=index form
    code, body = _post(port, "/api/v0/status", {"component": "catalog"})
    assert code == 200 and set(body) == {"catalog"}
    code, body = _post(port, "/api/v0/status", {"component": "nope"})
    assert code == 400
    # detailed adds per-state pipeline counts
    code, body = _post(port, "/api/v0/status",
                       {"verbosity": "detailed"})
    assert code == 200
    assert "pipelines-by-state" in body["pipeline-manager"]
    assert "store-root" in body["catalog"]
