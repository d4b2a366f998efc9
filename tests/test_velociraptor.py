"""velociraptor source: spec-level gRPC (HTTP/2 + HPACK + protobuf)
client driven against a loopback fake server (reference surface:
plugins/velociraptor/src/plugin.cpp; proto velociraptor.proto;
web/docs/operators/sources/velociraptor.md). The wire layers are
verified against the RFC 7541 Appendix C test vectors before the
end-to-end runs — if those fail, the e2e failure is in the codec, not
the connector."""

import json

import pytest

from tenzir_spark.sources.velociraptor import (
    FakeVelociraptorServer,
    HpackDecoder,
    decode_collector_args,
    decode_vql_response,
    encode_collector_args,
    encode_vql_response,
    hpack_encode,
    huffman_decode,
    huffman_encode,
    make_subscribe_query,
    query_velociraptor,
    read_velociraptor,
)


# ------------------------------------------------------------ wire codecs


def test_huffman_rfc7541_appendix_c_vectors():
    # C.4.1 / C.4.2 / C.6.1 string literals
    assert huffman_encode(b"www.example.com").hex() == \
        "f1e3c2e5f23a6ba0ab90f4ff"
    assert huffman_encode(b"no-cache").hex() == "a8eb10649cbf"
    assert huffman_encode(b"custom-key").hex() == "25a849e95ba97d7f"
    assert huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")) == \
        b"www.example.com"
    # round trip over the full byte alphabet
    blob = bytes(range(256))
    assert huffman_decode(huffman_encode(blob)) == blob


def test_hpack_rfc7541_c4_request_sequence():
    """Appendix C.4: three requests on one connection, huffman-coded,
    exercising static refs, incremental indexing, and dynamic-table
    reuse across header blocks."""
    dec = HpackDecoder()
    first = dec.decode(bytes.fromhex(
        "828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert first == [(":method", "GET"), (":scheme", "http"),
                     (":path", "/"), (":authority", "www.example.com")]
    second = dec.decode(bytes.fromhex(
        "828684be5886a8eb10649cbf"))
    assert second == [(":method", "GET"), (":scheme", "http"),
                      (":path", "/"), (":authority", "www.example.com"),
                      ("cache-control", "no-cache")]
    third = dec.decode(bytes.fromhex(
        "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"))
    assert third == [(":method", "GET"), (":scheme", "https"),
                     (":path", "/index.html"),
                     (":authority", "www.example.com"),
                     ("custom-key", "custom-value")]


def test_hpack_literal_encode_decodes_with_fresh_decoder():
    headers = [(":method", "POST"), (":path", "/proto.API/Query"),
               ("content-type", "application/grpc"), ("te", "trailers")]
    assert HpackDecoder().decode(hpack_encode(headers)) == headers


def test_protobuf_collector_args_round_trip():
    raw = encode_collector_args(
        [("req-1", "SELECT * FROM info()")], max_rows=77, max_wait=3,
        org_id="O123", env={"k": "v"})
    args = decode_collector_args(raw)
    assert args["requests"] == [{"name": "req-1",
                                 "vql": "SELECT * FROM info()"}]
    assert args["max_rows"] == 77 and args["max_wait"] == 3
    assert args["org_id"] == "O123" and args["env"] == {"k": "v"}


def test_protobuf_vql_response_round_trip():
    raw = encode_vql_response(
        response=json.dumps([{"a": 1}]), columns=["a"],
        query=("n", "SELECT 1"), timestamp=1700000000000000,
        query_id=9, part=2, total_rows=1, log="")
    resp = decode_vql_response(raw)
    assert json.loads(resp["response"]) == [{"a": 1}]
    assert resp["columns"] == ["a"]
    assert resp["query"] == {"name": "n", "vql": "SELECT 1"}
    assert resp["timestamp"] == 1700000000000000
    assert resp["query_id"] == 9 and resp["part"] == 2


# ------------------------------------------------------------- end-to-end


def _os_info_handler(vql):
    assert "info()" in vql
    return [
        {"Hostname": "host-a", "OS": "linux", "Clients": 3},
        {"Hostname": "host-b", "OS": "windows", "Clients": 1},
        {"Hostname": "host-c", "OS": "linux", "Clients": 2},
    ]


def test_query_round_trip_rows_and_shape():
    with FakeVelociraptorServer(_os_info_handler) as srv:
        rows = query_velociraptor(
            query="SELECT * FROM info()", request_name="t1",
            org_id="root", max_rows=100, max_wait=1,
            endpoint=f"127.0.0.1:{srv.port}")
    # reference row shape: data rows then one control/log row
    data = [r for r in rows if "response" in r]
    logs = [r for r in rows if "log" in r]
    assert [d["response"]["Hostname"] for d in data] == \
        ["host-a", "host-b", "host-c"]
    assert all(d["query"] == {"name": "t1", "vql": "SELECT * FROM info()"}
               for d in data)
    assert all(d["part"] == 0 and d["query_id"] == 1 for d in data)
    assert len(logs) == 1 and "3 rows" in logs[0]["log"]
    # the server saw exactly the VQLCollectorArgs we staged
    assert srv.requests[0]["max_rows"] == 100
    assert srv.requests[0]["org_id"] == "root"


def test_max_rows_splits_response_parts():
    with FakeVelociraptorServer(_os_info_handler) as srv:
        rows = query_velociraptor(
            query="SELECT * FROM info()", max_rows=2,
            endpoint=f"127.0.0.1:{srv.port}")
    data = [r for r in rows if "response" in r]
    assert sorted({d["part"] for d in data}) == [0, 1]
    assert len(data) == 3


def test_subscribe_builds_reference_vql():
    vql = make_subscribe_query("Windows.Sys.Users")
    assert "LET subscribe_artifact = Windows.Sys.Users" in vql
    assert 'watch_monitoring(artifact="System.Flow.Completion")' in vql
    assert "HuntResult" in vql
    with FakeVelociraptorServer(lambda q: []) as srv:
        query_velociraptor(subscribe="Windows.Sys.Users",
                           endpoint=f"127.0.0.1:{srv.port}")
    assert "Windows.Sys.Users" in srv.requests[0]["requests"][0]["vql"]


def test_requires_query_or_subscribe():
    with pytest.raises(ValueError, match="no artifact subscription"):
        query_velociraptor(endpoint="127.0.0.1:1")


def test_dataframe_and_tql(spark):
    with FakeVelociraptorServer(_os_info_handler) as srv:
        df = read_velociraptor(spark, query="SELECT * FROM info()",
                               endpoint=f"127.0.0.1:{srv.port}")
        got = df.filter(df.response.isNotNull()) \
            .select("response.Hostname", "response.Clients") \
            .orderBy("Hostname").collect()
    assert [(r["Hostname"], r["Clients"]) for r in got] == \
        [("host-a", 3), ("host-b", 1), ("host-c", 2)]

    from tenzir_spark.plans.tql import parse_pipeline
    with FakeVelociraptorServer(_os_info_handler) as srv:
        p = parse_pipeline(
            f'velociraptor --query "SELECT * FROM info()" '
            f'--endpoint 127.0.0.1:{srv.port} '
            f'| where response.OS == "linux" | select response.Hostname',
            spark=spark)
    # TQL select keeps the reference's nested projection: the result
    # column is the response struct narrowed to Hostname
    vals = [v if isinstance(v, str) else v["Hostname"]
            for (v,) in p.df.collect()]
    assert sorted(vals) == ["host-a", "host-c"]


def test_tql_max_wait_validation(spark):
    from tenzir_spark.plans.tql import parse_pipeline
    with pytest.raises(ValueError, match="max-wait too low"):
        parse_pipeline('velociraptor -q "SELECT 1" -w 0s '
                       '--endpoint 127.0.0.1:1', spark=spark)


def _openssl_pki(tmp):
    """CA + server cert (SAN VelociraptorServer, matching the
    reference's SslTargetNameOverride) + client cert, via openssl."""
    import subprocess

    def run(*args):
        subprocess.run(args, check=True, capture_output=True, cwd=tmp)

    run("openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
        "-keyout", "ca.key", "-out", "ca.pem", "-days", "2",
        "-subj", "/CN=VelociraptorCA")
    for name, cn, ext in (("server", "VelociraptorServer",
                           "subjectAltName=DNS:VelociraptorServer"),
                          ("client", "tenzir", "")):
        run("openssl", "req", "-newkey", "rsa:2048", "-nodes",
            "-keyout", f"{name}.key", "-out", f"{name}.csr",
            "-subj", f"/CN={cn}")
        sign = ["openssl", "x509", "-req", "-in", f"{name}.csr",
                "-CA", "ca.pem", "-CAkey", "ca.key", "-CAcreateserial",
                "-out", f"{name}.pem", "-days", "2"]
        if ext:
            sign += ["-extfile", "/dev/stdin"]
            import subprocess as sp
            p = sp.run(sign, input=ext.encode(), check=True,
                       capture_output=True, cwd=tmp)
        else:
            run(*sign)
    read = lambda n: open(f"{tmp}/{n}").read()
    return {"ca": read("ca.pem"), "server_cert": read("server.pem"),
            "server_key": read("server.key"),
            "client_cert": read("client.pem"),
            "client_key": read("client.key")}


def test_mutual_tls_like_reference(tmp_path):
    """Full mutual-TLS path: client config dict shaped like the
    velociraptor.yaml api_client file (ca_certificate,
    client_private_key, client_cert, api_connection_string), server
    requiring a client cert, ALPN h2, target-name override
    'VelociraptorServer' (plugin.cpp:128-175)."""
    import shutil
    import ssl as _ssl

    if shutil.which("openssl") is None:
        pytest.skip("no openssl binary to mint test certs")
    pki = _openssl_pki(str(tmp_path))
    srv_ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
    (tmp_path / "s.pem").write_text(pki["server_cert"])
    (tmp_path / "s.key").write_text(pki["server_key"])
    srv_ctx.load_cert_chain(str(tmp_path / "s.pem"), str(tmp_path / "s.key"))
    srv_ctx.load_verify_locations(cadata=pki["ca"])
    srv_ctx.verify_mode = _ssl.CERT_REQUIRED  # mutual TLS
    srv_ctx.set_alpn_protocols(["h2"])
    with FakeVelociraptorServer(_os_info_handler, tls=srv_ctx) as srv:
        rows = query_velociraptor(
            query="SELECT * FROM info()",
            config={
                "ca_certificate": pki["ca"],
                "client_private_key": pki["client_key"],
                "client_cert": pki["client_cert"],
                "api_connection_string": f"127.0.0.1:{srv.port}",
            })
    data = [r for r in rows if "response" in r]
    assert [d["response"]["Hostname"] for d in data] == \
        ["host-a", "host-b", "host-c"]
