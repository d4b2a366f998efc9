"""s3/gcs object-store connector — e2e against a loopback fake-S3 server.

The connector is Arrow's own S3FileSystem (the reference's exact
mechanism, libtenzir/builtins/connectors/s3.cpp), so the test stands up
a minimal in-process S3 REST endpoint (HEAD/GET-with-Range/PUT +
multipart upload, the calls Arrow's AWS SDK client actually issues) and
points the filesystem at it with ``endpoint_override`` + ``scheme=http``
+ ``--anonymous`` — the same pattern as the kafka wire-level broker and
the ZMTP loopback tests.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlsplit

import pytest

from tenzir_spark.sources.objectstore import (filesystem_for,
                                              is_objectstore_uri,
                                              objectstore_fetch,
                                              objectstore_save, split_uri)


class _FakeS3Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "FakeS3/0"

    # object store: {"bucket/key": bytes}; uploads: {id: {part#: bytes}}
    store: dict[str, bytes] = {}
    uploads: dict[str, dict[int, bytes]] = {}
    _seq = [0]

    def log_message(self, *a):  # quiet
        pass

    def _key(self):
        parts = urlsplit(self.path)
        return unquote(parts.path).lstrip("/"), dict(parse_qsl(parts.query,
                                                     keep_blank_values=True))

    def _reply(self, code: int, body: bytes = b"",
               ctype: str = "application/xml", extra: dict | None = None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD" and body:
            self.wfile.write(body)

    def _obj_headers(self, data: bytes) -> dict:
        return {"ETag": '"%08x"' % (hash(data) & 0xFFFFFFFF),
                "Last-Modified": "Wed, 21 Oct 2015 07:28:00 GMT",
                "Accept-Ranges": "bytes"}

    def do_HEAD(self):
        key, _q = self._key()
        if "/" not in key:  # bucket existence probe
            self._reply(200 if any(k.startswith(key + "/")
                                   for k in self.store) or key else 404)
            return
        data = self.store.get(key)
        if data is None:
            self._reply(404)
            return
        h = self._obj_headers(data)
        h["Content-Length"] = str(len(data))
        # HEAD: headers only, Content-Length describes the (absent) body
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        for k, v in h.items():
            self.send_header(k, v)
        self.end_headers()

    def do_GET(self):
        key, q = self._key()
        if "list-type" in q or "/" not in key:
            prefix = key + "/" + q.get("prefix", "")
            keys = [k for k in self.store if k.startswith(prefix)]
            items = "".join(
                f"<Contents><Key>{k.split('/', 1)[1]}</Key>"
                f"<Size>{len(self.store[k])}</Size>"
                f"<LastModified>2015-10-21T07:28:00.000Z</LastModified>"
                f"</Contents>" for k in sorted(keys))
            body = (f'<?xml version="1.0"?><ListBucketResult>'
                    f"<Name>{key.split('/')[0]}</Name><KeyCount>{len(keys)}"
                    f"</KeyCount><IsTruncated>false</IsTruncated>{items}"
                    f"</ListBucketResult>").encode()
            self._reply(200, body)
            return
        data = self.store.get(key)
        if data is None:
            self._reply(404, b"<Error><Code>NoSuchKey</Code></Error>")
            return
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            lo_s, _, hi_s = rng[len("bytes="):].partition("-")
            lo = int(lo_s or 0)
            hi = min(int(hi_s) if hi_s else len(data) - 1, len(data) - 1)
            chunk = data[lo:hi + 1]
            extra = self._obj_headers(data)
            extra["Content-Range"] = f"bytes {lo}-{hi}/{len(data)}"
            self._reply(206, chunk, "application/octet-stream", extra)
            return
        self._reply(200, data, "application/octet-stream",
                    self._obj_headers(data))

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def do_PUT(self):
        key, q = self._key()
        body = self._read_body()
        if "uploadId" in q and "partNumber" in q:
            self.uploads.setdefault(q["uploadId"], {})[
                int(q["partNumber"])] = body
            self._reply(200, b"", extra=self._obj_headers(body))
            return
        self.store[key] = body
        self._reply(200, b"", extra=self._obj_headers(body))

    def do_POST(self):
        key, q = self._key()
        body = self._read_body()
        if "uploads" in q:  # InitiateMultipartUpload
            self._seq[0] += 1
            uid = f"upload-{self._seq[0]}"
            self.uploads[uid] = {}
            xml = (f'<?xml version="1.0"?><InitiateMultipartUploadResult>'
                   f"<Bucket>{key.split('/')[0]}</Bucket>"
                   f"<Key>{key.split('/', 1)[1]}</Key>"
                   f"<UploadId>{uid}</UploadId>"
                   f"</InitiateMultipartUploadResult>").encode()
            self._reply(200, xml)
            return
        if "uploadId" in q:  # CompleteMultipartUpload
            parts = self.uploads.pop(q["uploadId"], {})
            self.store[key] = b"".join(parts[n] for n in sorted(parts))
            xml = (f'<?xml version="1.0"?><CompleteMultipartUploadResult>'
                   f"<Key>{key.split('/', 1)[1]}</Key>"
                   f'<ETag>"done"</ETag>'
                   f"</CompleteMultipartUploadResult>").encode()
            self._reply(200, xml)
            return
        self._reply(400, b"<Error/>")

    def do_DELETE(self):
        key, q = self._key()
        if "uploadId" in q:
            self.uploads.pop(q["uploadId"], None)
        else:
            self.store.pop(key, None)
        self._reply(204)


@pytest.fixture(scope="module")
def fake_s3():
    _FakeS3Handler.store = {}
    _FakeS3Handler.uploads = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeS3Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _uri(srv, key: str) -> str:
    port = srv.server_address[1]
    return (f"s3://{key}?endpoint_override=127.0.0.1:{port}"
            f"&scheme=http&region=us-east-1")


# ---------------------------------------------------------------------------
# unit: URI contract (s3.md / gcs.md query-parameter tables)
# ---------------------------------------------------------------------------

def test_split_uri():
    scheme, path, q = split_uri(
        "s3://bkt/dir/obj.json?region=eu-west-1&scheme=http")
    assert (scheme, path) == ("s3", "bkt/dir/obj.json")
    assert q == {"region": "eu-west-1", "scheme": "http"}


def test_is_objectstore_uri():
    assert is_objectstore_uri("s3://b/k")
    assert is_objectstore_uri("gs://b/k")
    assert not is_objectstore_uri("s3a://b/k")  # Spark-native passthrough
    assert not is_objectstore_uri("/local/file")
    assert not is_objectstore_uri("http://x/y")


def test_filesystem_for_anonymous_options(fake_s3):
    fs, path = filesystem_for(_uri(fake_s3, "bkt/obj.bin"), anonymous=True)
    assert path == "bkt/obj.bin"
    assert type(fs).__name__ == "S3FileSystem"


def test_filesystem_for_rejects_non_objectstore():
    with pytest.raises(ValueError):
        filesystem_for("http://x/y")


def test_gcs_filesystem_options():
    fs, path = filesystem_for(
        "gs://bkt/obj.json?endpoint_override=127.0.0.1:1&scheme=http"
        "&retry_limit_seconds=2", anonymous=True)
    assert path == "bkt/obj.json"
    assert type(fs).__name__ == "GcsFileSystem"


# ---------------------------------------------------------------------------
# e2e: loader + saver against the loopback store
# ---------------------------------------------------------------------------

def test_fetch_roundtrip(fake_s3, tmp_path):
    payload = b'{"x": 1}\n{"x": 2}\n' * 4096  # spans several SDK reads
    _FakeS3Handler.store["bkt/logs/feed.json"] = payload
    spool = objectstore_fetch(_uri(fake_s3, "bkt/logs/feed.json"),
                              anonymous=True)
    assert open(spool, "rb").read() == payload


def test_save_roundtrip(fake_s3, tmp_path):
    src = tmp_path / "out.csv"
    src.write_bytes(b"a,b\n1,2\n" * 2000)
    objectstore_save(str(src), _uri(fake_s3, "bkt/out/out.csv"),
                     anonymous=True)
    assert _FakeS3Handler.store["bkt/out/out.csv"] == src.read_bytes()


def test_fetch_missing_object_raises(fake_s3):
    with pytest.raises(OSError):
        objectstore_fetch(_uri(fake_s3, "bkt/never/was.json"),
                          anonymous=True)


def test_tql_s3_source(spark, fake_s3):
    from tenzir_spark.plans.tql import parse_pipeline
    _FakeS3Handler.store["bkt/ev/alerts.json"] = (
        b'{"sev": 1, "msg": "low"}\n'
        b'{"sev": 9, "msg": "critical"}\n'
        b'{"sev": 7, "msg": "high"}\n')
    uri = _uri(fake_s3, "bkt/ev/alerts.json")
    p = parse_pipeline(
        f"from s3 --anonymous {uri!r} read json | where sev > 5 | sort sev",
        spark)
    rows = [r.asDict() for r in p.df.collect()]
    assert [r["sev"] for r in rows] == [7, 9]
    assert rows[1]["msg"] == "critical"


def test_tql_s3_sink_and_reload(spark, fake_s3):
    from tenzir_spark.plans.tql import parse_pipeline, run_pipeline
    _FakeS3Handler.store["bkt/in/nums.json"] = b"".join(
        b'{"n": %d}\n' % i for i in range(10))
    src = _uri(fake_s3, "bkt/in/nums.json")
    dst = _uri(fake_s3, "bkt/roundtrip/out.json")
    p = parse_pipeline(
        f"from s3 --anonymous {src!r} | where n >= 5 | to s3 --anonymous "
        f"{dst!r} write json", spark)
    run_pipeline(p)
    body = _FakeS3Handler.store["bkt/roundtrip/out.json"]
    import json
    got = sorted(json.loads(ln)["n"] for ln in body.splitlines() if ln)
    assert got == [5, 6, 7, 8, 9]
