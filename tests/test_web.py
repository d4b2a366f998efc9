"""Pipeline-management REST API (reference `web` plugin:
web/openapi/openapi.yaml /ping + /pipeline/* + /serve;
plugins/web/src/restinio_server.cpp). Driven over real HTTP against
the node API server, Spark underneath."""

import json
import time
import urllib.request

import pytest

from tenzir_spark.web import PipelineApi, _parse_ttl, _split_segments


def _post(port, path, body=None, token=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json",
                 **({"X-Tenzir-Token": token} if token else {})},
        method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path, token=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        headers={"X-Tenzir-Token": token} if token else {})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait_state(api, pid, want, timeout=60):
    dl = time.monotonic() + timeout
    while time.monotonic() < dl:
        mp = api.pipelines.get(pid)
        if mp is not None and mp.state == want:
            return mp
        time.sleep(0.1)
    raise AssertionError(
        f"pipeline {pid} never reached {want!r}: "
        f"{api.pipelines.get(pid) and api.pipelines[pid].info()}")


@pytest.fixture()
def api(spark):
    from tenzir_spark.serve import default_manager
    a = PipelineApi(spark, serve_manager=default_manager())
    port = a.start()
    a.port = port
    try:
        yield a
    finally:
        a.shutdown()


def test_split_and_ttl_helpers():
    assert _split_segments('from x | where a == "p|q" | to y') == \
        ['from x', 'where a == "p|q"', 'to y']
    assert _parse_ttl("5.0m") == 300.0
    assert _parse_ttl("30s") == 30.0
    assert _parse_ttl(None) is None
    assert _parse_ttl(12) == 12.0


def test_ping_and_auth(api, spark):
    code, body = _get(api.port, "/ping")
    assert code == 200 and "version" in body
    # /api/v0 prefix serves the same routes (openapi servers: /api/v0)
    code, body = _get(api.port, "/api/v0/ping")
    assert code == 200
    # with a token configured, requests without X-Tenzir-Token get 401
    guarded = PipelineApi(spark, token="s3cret")
    gport = guarded.start()
    try:
        assert _get(gport, "/ping")[0] == 401
        assert _get(gport, "/ping", token="s3cret")[0] == 200
        assert _post(gport, "/pipeline/list")[0] == 401
    finally:
        guarded.shutdown()


def test_create_validates_definition(api):
    code, body = _post(api.port, "/pipeline/create",
                       {"definition": "garbage_operator xyz"})
    assert code == 400 and "error" in body
    code, body = _post(api.port, "/pipeline/create", {})
    assert code == 400


def test_create_run_list_delete(api, sf_dir):
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/nation.parquet | head 3 | discard",
        "name": "nation-drain",
        "start_when_created": True,
    })
    assert code == 200
    pid = body["id"]
    mp = _wait_state(api, pid, "stopped")
    # egress metrics observed on the frame feeding the sink
    assert mp.metrics["total"]["egress"]["num_elements"] == 3
    assert mp.metrics["total"]["egress"]["unit"] == "events"
    code, body = _post(api.port, "/pipeline/list")
    assert code == 200
    row = next(p for p in body["pipelines"] if p["id"] == pid)
    assert row["name"] == "nation-drain"
    assert row["state"] == "stopped" and row["error"] == ""
    # operators reported in execution order, one per segment
    defs = [op["definition"] for op in row["operators"]]
    assert defs == [f"from {sf_dir}/nation.parquet", "head 3", "discard"]
    code, _ = _post(api.port, "/pipeline/delete", {"id": pid})
    assert code == 200
    assert pid not in api.pipelines
    code, body = _post(api.port, "/pipeline/delete", {"id": pid})
    assert code == 400


def test_open_pipeline_fails_at_start(api, sf_dir):
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/nation.parquet | head 2",
        "start_when_created": True,
    })
    assert code == 200
    mp = _wait_state(api, body["id"], "failed")
    assert "not closed" in mp.error


def test_update_state_machine_and_labels(api, sf_dir):
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard"})
    assert code == 200
    pid = body["id"]
    assert api.pipelines[pid].state == "created"
    code, body = _post(api.port, "/pipeline/update", {
        "id": pid, "name": "renamed", "action": "start",
        "labels": [{"text": "prod", "color": "#ff0000"}],
        "restart_with_node": True})
    assert code == 200
    _wait_state(api, pid, "stopped")
    code, body = _post(api.port, "/pipeline/update", {"id": pid})
    info = body["pipeline"]
    assert info["name"] == "renamed"
    assert info["restart_with_node"] is True
    assert info["labels"] == [{"text": "prod", "color": "#ff0000"}]
    # pause is bookkeeping (documented divergence), stop is terminal
    code, body = _post(api.port, "/pipeline/update",
                       {"id": pid, "action": "pause"})
    assert body["pipeline"]["state"] == "paused"
    code, body = _post(api.port, "/pipeline/update",
                       {"id": pid, "action": "stop"})
    assert body["pipeline"]["state"] == "stopped"
    code, body = _post(api.port, "/pipeline/update",
                       {"id": "nope", "action": "stop"})
    assert code == 400


def test_launch_serves_results(api, sf_dir):
    # open pipeline -> serve sink appended, events pageable over /serve
    code, body = _post(api.port, "/pipeline/launch", {
        "definition": f"from {sf_dir}/region.parquet | select r_name"
                      " | sort r_name",
        "serve_id": "launch-t1",
        "serve_buffer_size": 64,
    })
    assert code == 200 and "id" in body
    rows, token, deadline = [], None, time.monotonic() + 60
    while time.monotonic() < deadline:
        code, page = _post(api.port, "/api/v0/serve", {
            "serve_id": "launch-t1", "timeout": "500ms",
            "max_events": 10, "continuation_token": token})
        assert code == 200, page
        rows += [d["data"] for d in page["data"]]
        token = page.get("next_continuation_token")
        if token is None:
            break
    assert [r["r_name"] for r in rows] == \
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    # sink-terminated definition -> deployable, nothing created
    code, body = _post(api.port, "/pipeline/launch", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "serve_id": "launch-t2"})
    assert code == 200 and body == {"deployable": True}


def test_hidden_ttl_and_reset(api, sf_dir):
    # hidden requires start_when_created + ttl (openapi CreateParameters)
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "hidden": True})
    assert code == 400
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "hidden": True, "start_when_created": True, "ttl": "60s"})
    assert code == 200
    pid = body["id"]
    # hidden pipelines never appear in /pipeline/list
    code, listing = _post(api.port, "/pipeline/list")
    assert pid not in {p["id"] for p in listing["pipelines"]}
    code, body = _post(api.port, "/pipeline/reset-ttl", {"ids": [pid, "x"]})
    assert body["ids"] == [pid]
    # short-ttl pipeline is reaped
    code, body = _post(api.port, "/pipeline/create", {
        "definition": f"from {sf_dir}/region.parquet | discard",
        "hidden": True, "start_when_created": True, "ttl": "0.5s"})
    pid2 = body["id"]
    deadline = time.monotonic() + 10
    while pid2 in api.pipelines and time.monotonic() < deadline:
        time.sleep(0.2)
    assert pid2 not in api.pipelines
