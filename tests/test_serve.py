"""serve operator: REST results endpoint (serve.cpp:733 + its OpenAPI
contract — continuation-token paging, last-token replay, max_events,
timeout, completion with null token)."""

import json
import time
import urllib.request

import pytest

from tenzir_spark.serve import ServeManager, serve


@pytest.fixture()
def manager():
    m = ServeManager()
    port = m.start()
    yield m, port
    m.shutdown()


def _post(port, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/serve",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _drain(port, serve_id, max_events=None):
    token, out, schemas = None, [], None
    for _ in range(100):
        body = {"serve_id": serve_id, "continuation_token": token,
                "timeout": "2s"}
        if max_events is not None:
            body["max_events"] = max_events
        status, resp = _post(port, body)
        assert status == 200, resp
        out.extend(d["data"] for d in resp["data"])
        schemas = resp["schemas"]
        token = resp["next_continuation_token"]
        if token is None:
            return out, schemas
    raise AssertionError("never completed")


def test_serve_batch_roundtrip(spark, manager):
    m, port = manager
    df = spark.range(7).selectExpr("id", "id * id AS sq")
    serve(df, "q1", m)
    rows, schemas = _drain(port, "q1")
    assert sorted(r["id"] for r in rows) == list(range(7))
    assert {r["id"]: r["sq"] for r in rows}[3] == 9
    assert schemas[0]["definition"]["fields"][0]["name"] == "id"


def test_serve_max_events_paging(spark, manager):
    m, port = manager
    df = spark.range(10).selectExpr("id")
    serve(df, "q2", m)
    token, chunks = None, []
    for _ in range(50):
        status, resp = _post(port, {"serve_id": "q2", "max_events": 3,
                                    "continuation_token": token,
                                    "timeout": "2s"})
        assert status == 200
        chunks.append(len(resp["data"]))
        token = resp["next_continuation_token"]
        if token is None:
            break
    assert sum(chunks) == 10
    assert max(chunks) <= 3


def test_serve_token_replay_returns_same_chunk(spark, manager):
    """A client that lost a response repeats its token and gets the SAME
    chunk again (serve.cpp:39-41 last-result cache)."""
    m, port = manager
    serve(spark.range(6).selectExpr("id"), "q3", m)
    _, first = _post(port, {"serve_id": "q3", "max_events": 2,
                            "continuation_token": None, "timeout": "2s"})
    tok = first["next_continuation_token"]
    _, second = _post(port, {"serve_id": "q3", "max_events": 2,
                             "continuation_token": tok, "timeout": "2s"})
    _, replay = _post(port, {"serve_id": "q3", "max_events": 2,
                             "continuation_token": tok, "timeout": "2s"})
    assert replay == second
    assert second["data"] != first["data"]


def test_serve_errors(spark, manager):
    m, port = manager
    status, resp = _post(port, {"serve_id": "nope",
                                "continuation_token": None})
    assert status == 404
    serve(spark.range(1), "q4", m)
    status, resp = _post(port, {"serve_id": "q4",
                                "continuation_token": "bogus",
                                "timeout": "100ms"})
    assert status == 400
    assert "token" in resp["error"]


def test_tql_serve_sink(spark, tmp_path):
    """`from f read json | where ... | serve <id>` — the TQL sink form
    against the process-wide default manager."""
    from tenzir_spark.plans.tql import exec_pipeline
    from tenzir_spark.serve import default_manager

    p = tmp_path / "rows.json"
    p.write_text('{"a": 1}\n{"a": 2}\n{"a": 3}\n')
    mgr = exec_pipeline(f"from {p} read json | where a >= 2 | serve tq1",
                        spark=spark)
    assert mgr is default_manager()
    rows, _ = _drain(mgr.port, "tq1", max_events=10)
    assert sorted(r["a"] for r in rows) == [2, 3]


def test_serve_streaming(spark, manager, tmp_path):
    """foreachBatch-fed buffer over a streaming source; the buffer
    completes when the query terminates."""
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "a.json").write_text('{"v": 1}\n{"v": 2}\n')
    (src / "b.json").write_text('{"v": 3}\n')
    m, port = manager
    static = spark.read.json(str(src))
    stream = spark.readStream.schema(static.schema).json(str(src))
    q = serve(stream, "qs", m)
    # availableNow-less stream: drain what the first micro-batches give
    deadline = time.time() + 30
    rows = []
    token = None
    while time.time() < deadline:
        status, resp = _post(port, {"serve_id": "qs", "max_events": 10,
                                    "continuation_token": token,
                                    "timeout": "1s"})
        assert status == 200
        rows.extend(d["data"] for d in resp["data"])
        token = resp["next_continuation_token"]
        if len(rows) >= 3:
            break
    q.stop()
    assert sorted(r["v"] for r in rows) == [1, 2, 3]


def test_serve_streaming_timestamp_types(spark, manager, tmp_path):
    """Streaming micro-batches with timestamp/date/binary columns must
    serialize like the batch path (toJSON), not leak datetime objects
    into the buffer where json.dumps would fail AFTER the token already
    advanced and lose the chunk permanently."""
    src = tmp_path / "ts_src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"v": 1, "ts": "2024-03-01T12:00:00"}\n'
        '{"v": 2, "ts": "2024-03-02T13:30:00"}\n')
    m, port = manager
    static = (spark.read.json(str(src))
              .selectExpr("v", "CAST(ts AS TIMESTAMP) AS ts"))
    stream = (spark.readStream.schema(spark.read.json(str(src)).schema)
              .json(str(src))
              .selectExpr("v", "CAST(ts AS TIMESTAMP) AS ts",
                          "CAST(v AS DECIMAL(10,2)) AS dec",
                          "CAST('ab' AS BINARY) AS bin"))
    q = serve(stream, "qts", m)
    deadline = time.time() + 30
    rows, token = [], None
    while time.time() < deadline:
        status, resp = _post(port, {"serve_id": "qts", "max_events": 10,
                                    "continuation_token": token,
                                    "timeout": "1s"})
        assert status == 200, resp
        rows.extend(d["data"] for d in resp["data"])
        token = resp["next_continuation_token"]
        if len(rows) >= 2:
            break
    q.stop()
    assert sorted(r["v"] for r in rows) == [1, 2]
    assert all("2024-03" in r["ts"] for r in rows)


def test_serve_buffer_bound_enforced():
    """One oversized put must not overshoot buffer_size: it is admitted
    chunk-by-chunk as the consumer drains, and a finished buffer refuses
    further rows instead of appending past the bound."""
    import threading as _t

    from tenzir_spark.serve import ServeBuffer

    buf = ServeBuffer("cap", buffer_size=4)
    seen = []

    def producer():
        buf.put([{"i": i} for i in range(10)])  # 10 rows into a 4-slot buffer
        buf.finish()

    t = _t.Thread(target=producer, daemon=True)
    t.start()
    token = None
    for _ in range(20):
        with buf._cv:
            assert len(buf._rows) <= 4  # the bound holds at every step
        resp = buf.get(token, max_events=3, timeout=2.0)
        seen.extend(d["data"]["i"] for d in resp["data"])
        token = resp["next_continuation_token"]
        if token is None:
            break
    t.join(timeout=10)
    assert seen == list(range(10))
    # put after finish is refused, not silently appended
    with pytest.raises(RuntimeError, match="finished"):
        buf.put([{"late": True}])


def test_serve_streaming_available_now_completes(spark, manager, tmp_path):
    """availableNow streaming serve: the query drains existing files and
    terminates; the client pages with continuation tokens until the
    buffer completes with next_continuation_token == null — the
    reference's completion contract (serve.cpp:733), now pinned under
    streaming."""
    src = tmp_path / "an_src"
    src.mkdir()
    (src / "a.json").write_text('{"v": 1}\n{"v": 2}\n{"v": 3}\n')
    (src / "b.json").write_text('{"v": 4}\n{"v": 5}\n')
    m, port = manager
    static = spark.read.json(str(src))
    stream = spark.readStream.schema(static.schema).json(str(src))
    q = serve(stream, "qan", m, available_now=True)
    rows, token, chunks = [], None, 0
    deadline = time.time() + 60
    while time.time() < deadline:
        status, resp = _post(port, {"serve_id": "qan", "max_events": 2,
                                    "continuation_token": token,
                                    "timeout": "2s"})
        assert status == 200, resp
        rows.extend(d["data"] for d in resp["data"])
        if resp["data"]:
            chunks += 1
        token = resp["next_continuation_token"]
        if token is None:
            break
    assert token is None, "buffer never completed with a null token"
    assert sorted(r["v"] for r in rows) == [1, 2, 3, 4, 5]
    assert chunks >= 3  # max_events=2 paging actually paged
    assert not q.isActive  # availableNow terminated the query itself


def test_web_plugin_serve_sh_replay(spark):
    """Replay of plugins/web/integration/scripts/serve.sh: `show version
    | repeat 5 | serve version`, drained with max_events=1 for the first
    page then max_events=4 until the continuation token goes null — the
    golden is exactly 5 events total."""
    from tenzir_spark.plans.tql import exec_pipeline
    from tenzir_spark.serve import default_manager

    exec_pipeline("show version | repeat 5 | serve version", spark=spark)
    port = default_manager().port
    total = 0
    status, resp = _post(port, {"serve_id": "version", "timeout": "5s",
                                "max_events": 1,
                                "continuation_token": None})
    assert status == 200, resp
    total += len(resp["data"])
    while resp["next_continuation_token"] is not None:
        status, resp = _post(
            port, {"serve_id": "version", "timeout": "5s",
                   "max_events": 4,
                   "continuation_token": resp["next_continuation_token"]})
        assert status == 200, resp
        total += len(resp["data"])
    assert total == 5
