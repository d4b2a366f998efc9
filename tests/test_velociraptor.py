"""velociraptor source operator: loopback e2e against a fake gRPC/h2c
server speaking the minimal HTTP/2 + gRPC subset the Query RPC needs
(same pattern as test_zmq's ZMTP loopback). Reference surface:
plugins/velociraptor/src/plugin.cpp + velociraptor.proto."""

import json
import socket
import struct
import threading

import pytest

from tenzir_spark.sources.grpc_client import (
    DATA,
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    HEADERS,
    PREFACE,
    SETTINGS,
    GrpcError,
    HpackDecoder,
    HpackEncoder,
    grpc_call,
    pack_frame,
    read_frame,
)
from tenzir_spark.sources.velociraptor import (
    _len_field,
    _tag,
    _varint,
    decode_vql_response,
    encode_collector_args,
    load_velociraptor,
    make_subscribe_query,
    query_velociraptor,
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def encode_vql_response(response: str = "", columns=(), query=None,
                        timestamp=0, query_id=0, part=0, log="") -> bytes:
    """Test-side VQLResponse encoder (field numbers from the proto)."""
    out = bytearray()
    if response:
        out += _len_field(1, response.encode())
    for c in columns:
        out += _len_field(2, c.encode())
    if query:
        out += _len_field(3, _len_field(1, query["vql"].encode())
                          + _len_field(2, query["name"].encode()))
    if timestamp:
        out += _tag(4, 0) + _varint(timestamp)
    if query_id:
        out += _tag(5, 0) + _varint(query_id)
    if part:
        out += _tag(6, 0) + _varint(part)
    if log:
        out += _len_field(9, log.encode())
    return bytes(out)


def _grpc_frame(msg: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", len(msg)) + msg


class FakeVelociraptorServer(threading.Thread):
    """One-shot h2c gRPC server: SETTINGS exchange, HPACK-decodes the
    request headers, collects the request DATA, then streams the given
    VQLResponse messages and trailers. Records what it saw for
    assertions."""

    def __init__(self, port: int, responses: list[bytes],
                 grpc_status: str = "0", grpc_message: str = "",
                 wrap=None):
        super().__init__(daemon=True)
        self.port = port
        self.responses = responses
        self.grpc_status = grpc_status
        self.grpc_message = grpc_message
        self.wrap = wrap  # e.g. server-side TLS wrap of the accepted conn
        self.seen_headers: list[tuple[str, str]] = []
        self.seen_request: bytes = b""
        self.error: Exception | None = None
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", port))
        self.srv.listen(1)

    def run(self):
        try:
            self._serve()
        except Exception as e:  # surfaced by the test
            self.error = e
        finally:
            self.srv.close()

    def _serve(self):
        conn, _ = self.srv.accept()
        if self.wrap is not None:
            conn = self.wrap(conn)
        conn.settimeout(10)
        buf = bytearray()
        while len(buf) < len(PREFACE):
            buf += conn.recv(len(PREFACE) - len(buf))
        assert bytes(buf) == PREFACE
        conn.sendall(pack_frame(SETTINGS, 0, 0, b""))
        dec = HpackDecoder()
        data = bytearray()
        stream_done = False
        while not stream_done:
            ftype, flags, sid, payload = read_frame(conn)
            if ftype == SETTINGS and not flags & FLAG_ACK:
                conn.sendall(pack_frame(SETTINGS, FLAG_ACK, 0, b""))
            elif ftype == HEADERS:
                self.seen_headers = dec.decode(payload)
                if flags & FLAG_END_STREAM:
                    stream_done = True
            elif ftype == DATA:
                data += payload
                if flags & FLAG_END_STREAM:
                    stream_done = True
        assert data[:1] == b"\x00"
        (mlen,) = struct.unpack(">I", data[1:5])
        self.seen_request = bytes(data[5:5 + mlen])
        enc = HpackEncoder()
        conn.sendall(pack_frame(HEADERS, FLAG_END_HEADERS, 1, enc.encode([
            (":status", "200"), ("content-type", "application/grpc")])))
        for body in self.responses:
            conn.sendall(pack_frame(DATA, 0, 1, _grpc_frame(body)))
        trailers = [("grpc-status", self.grpc_status)]
        if self.grpc_message:
            trailers.append(("grpc-message", self.grpc_message))
        conn.sendall(pack_frame(HEADERS,
                                FLAG_END_HEADERS | FLAG_END_STREAM, 1,
                                enc.encode(trailers)))
        # graceful close: half-close the write side and drain whatever
        # the client still sends (its SETTINGS ACK) — close()ing with
        # unread bytes in the receive buffer triggers a TCP RST that
        # discards the client's in-flight response data
        conn.shutdown(socket.SHUT_WR)
        try:
            while conn.recv(4096):
                pass
        except OSError:
            pass
        conn.close()


def test_protobuf_codec_round_trip():
    args = encode_collector_args(
        [("req-1", "SELECT * FROM info()")],
        env={"k": "v"}, max_rows=500, max_wait=5, org_id="root")
    # VQLRequest lands in field 2, org_id in 35, max_row varint in 4
    assert b"SELECT * FROM info()" in args
    assert b"req-1" in args and b"root" in args
    resp = encode_vql_response(
        response='[{"a": 1}]', columns=("a",),
        query={"name": "req-1", "vql": "SELECT 1"},
        timestamp=1700000000000000, query_id=7, part=2)
    dec = decode_vql_response(resp)
    assert dec["Response"] == '[{"a": 1}]'
    assert dec["Columns"] == ["a"]
    assert dec["Query"] == {"name": "req-1", "vql": "SELECT 1"}
    assert dec["timestamp"] == 1700000000000000
    assert dec["query_id"] == 7 and dec["part"] == 2
    # unknown fields are skipped, not fatal
    extra = resp + _tag(50, 0) + _varint(9) + _len_field(51, b"x")
    assert decode_vql_response(extra)["query_id"] == 7


def test_grpc_loopback_streaming():
    """grpc_call round-trips one request and streams 3 response
    messages through real HTTP/2 frames."""
    port = _free_port()
    bodies = [b"alpha", b"beta", b"gamma"]
    srv = FakeVelociraptorServer(port, bodies)
    srv.start()
    got = list(grpc_call("127.0.0.1", port, "/proto.API/Query",
                         b"request-bytes", timeout=10))
    srv.join(timeout=10)
    assert srv.error is None, srv.error
    assert got == bodies
    assert srv.seen_request == b"request-bytes"
    hmap = dict(srv.seen_headers)
    assert hmap[":method"] == "POST"
    assert hmap[":path"] == "/proto.API/Query"
    assert hmap["content-type"] == "application/grpc"
    assert hmap["te"] == "trailers"


def test_grpc_error_status_raises():
    port = _free_port()
    srv = FakeVelociraptorServer(port, [], grpc_status="7",
                                 grpc_message="permission denied")
    srv.start()
    with pytest.raises(GrpcError) as ei:
        list(grpc_call("127.0.0.1", port, "/proto.API/Query", b"x",
                       timeout=10))
    srv.join(timeout=10)
    assert ei.value.status == 7
    assert "permission denied" in ei.value.message


def test_query_velociraptor_row_shape():
    """Reference row shape (plugin.cpp:195-250): data messages fan out
    per JSON object; control messages carry log; empty heartbeats are
    dropped."""
    port = _free_port()
    responses = [
        encode_vql_response(log="Query started",
                            timestamp=1700000000000000, query_id=1),
        encode_vql_response(
            response='[{"Pid": 4, "Name": "init"}, {"Pid": 5, "Name": "kthreadd"}]',
            columns=("Pid", "Name"),
            query={"name": "q", "vql": "SELECT Pid, Name FROM pslist()"},
            timestamp=1700000001000000, query_id=1, part=0),
        encode_vql_response(),  # heartbeat: no Response, no log
    ]
    srv = FakeVelociraptorServer(port, responses)
    srv.start()
    rows = list(query_velociraptor(
        [("q", "SELECT Pid, Name FROM pslist()")],
        endpoint=f"127.0.0.1:{port}", plaintext=True))
    srv.join(timeout=10)
    assert srv.error is None, srv.error
    assert len(rows) == 3
    assert rows[0] == {"timestamp": 1700000000.0, "query_id": 1,
                       "log": "Query started"}
    assert rows[1]["response"] == {"Pid": 4, "Name": "init"}
    assert rows[2]["response"] == {"Pid": 5, "Name": "kthreadd"}
    assert rows[1]["query"] == {"name": "q",
                                "vql": "SELECT Pid, Name FROM pslist()"}
    assert rows[1]["part"] == 0 and rows[1]["timestamp"] == 1700000001.0
    # the server received a well-formed VQLCollectorArgs
    assert b"SELECT Pid, Name FROM pslist()" in srv.seen_request
    assert b"root" in srv.seen_request  # default org_id


def test_subscribe_template_matches_reference_shape():
    vql = make_subscribe_query("Windows.Detection.Yara")
    assert "LET subscribe_artifact = Windows.Detection.Yara" in vql
    assert 'watch_monitoring(artifact="System.Flow.Completion")' in vql
    assert "HuntResult" in vql and "client_info(client_id=ClientId)" in vql
    # literal braces from the {{ }} escapes survive formatting
    assert "query={" in vql and "}" in vql


def test_tql_velociraptor_source(spark):
    """`velociraptor --query <vql>` as a TQL source operator against the
    loopback server, piped through a normal transformation."""
    from tenzir_spark.plans.tql import parse_pipeline

    port = _free_port()
    responses = [
        encode_vql_response(
            response=json.dumps([{"Pid": i, "Name": f"proc{i}"}
                                 for i in range(4)]),
            query={"name": "n1", "vql": "SELECT * FROM pslist()"},
            timestamp=1700000000000000, query_id=1, part=0),
    ]
    srv = FakeVelociraptorServer(port, responses)
    srv.start()
    out = parse_pipeline(
        f'velociraptor --plaintext --endpoint 127.0.0.1:{port} '
        f'--request-name n1 --query "SELECT * FROM pslist()" '
        f'| where response.Pid >= 2 | select response.Pid, response.Name',
        spark=spark)
    rows = out.df.collect()
    srv.join(timeout=10)
    assert srv.error is None, srv.error
    # select keeps the reference's record shape: response.{Pid,Name}
    assert sorted((r["response"]["Pid"], r["response"]["Name"])
                  for r in rows) == [(2, "proc2"), (3, "proc3")]


def test_grpc_mutual_tls_loopback(tmp_path):
    """The Velociraptor API is mTLS-only (plugin.cpp:162-172): client
    cert + key + CA from the api_client config, server name overridden
    to 'VelociraptorServer' for the self-signed server cert. Exercise
    the whole TLS path with throwaway certs."""
    import shutil
    import ssl
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("no openssl CLI to mint test certs")

    def mint(name, cn, ca=None):
        key, crt = tmp_path / f"{name}.key", tmp_path / f"{name}.crt"
        if ca is None:
            subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048",
                 "-nodes", "-keyout", key, "-out", crt, "-days", "1",
                 "-subj", f"/CN={cn}"], check=True, capture_output=True)
        else:
            csr = tmp_path / f"{name}.csr"
            subprocess.run(
                ["openssl", "req", "-newkey", "rsa:2048", "-nodes",
                 "-keyout", key, "-out", csr, "-subj", f"/CN={cn}"],
                check=True, capture_output=True)
            subprocess.run(
                ["openssl", "x509", "-req", "-in", csr, "-CA",
                 tmp_path / f"{ca}.crt", "-CAkey", tmp_path / f"{ca}.key",
                 "-CAcreateserial", "-out", crt, "-days", "1"],
                check=True, capture_output=True)
        return key, crt

    mint("ca", "TestCA")
    skey, scrt = mint("server", "VelociraptorServer", ca="ca")
    ckey, ccrt = mint("client", "tenzir", ca="ca")

    from tenzir_spark.sources.grpc_client import TlsConfig

    port = _free_port()
    body = encode_vql_response(log="tls ok", timestamp=1, query_id=1)
    # server-side TLS requiring a client cert (mTLS)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(scrt, skey)
    ctx.load_verify_locations(tmp_path / "ca.crt")
    ctx.verify_mode = ssl.CERT_REQUIRED
    ctx.set_alpn_protocols(["h2"])
    srv = FakeVelociraptorServer(
        port, [body], wrap=lambda c: ctx.wrap_socket(c, server_side=True))
    srv.start()
    tls = TlsConfig(ca_pem=(tmp_path / "ca.crt").read_text(),
                    cert_pem=ccrt.read_text(),
                    key_pem=ckey.read_text())
    got = list(grpc_call("127.0.0.1", port, "/proto.API/Query",
                         b"req", tls=tls, timeout=10))
    srv.join(timeout=10)
    assert srv.error is None, srv.error
    assert got == [body]
    assert dict(srv.seen_headers)[":scheme"] == "https"


def test_load_velociraptor_requires_query_or_subscribe():
    with pytest.raises(ValueError, match="no artifact subscription"):
        load_velociraptor(endpoint="127.0.0.1:1", plaintext=True)
    with pytest.raises(ValueError, match="max-wait too low"):
        load_velociraptor(query="SELECT 1", max_wait=0,
                          endpoint="127.0.0.1:1", plaintext=True)
