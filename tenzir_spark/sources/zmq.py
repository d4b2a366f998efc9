"""zmq — load bytes from / save bytes to ZeroMQ messages.

Reference: the ``zmq`` connector (``plugins/zmq``, docs
``web/docs/connectors/zmq.md``): the LOADER receives messages on a SUB
socket (default: connect, optional ``--filter`` prefix subscription),
the SAVER publishes on a PUB socket (default: bind); default endpoint
``tcp://127.0.0.1:5555``.

No libzmq or pyzmq exists in this environment, so this speaks the WIRE
PROTOCOL directly: ZMTP 3.0 with the NULL security mechanism, from the
public spec (https://rfc.zeromq.org/spec/23/ZMTP) — 64-byte greeting,
READY command with a Socket-Type metadata property, 0x01/0x00
subscription messages, short/long message framing. It interoperates
with any ZeroMQ peer on a NULL-mechanism tcp:// endpoint; tests run the
loader and saver against each other over loopback.

Spark design: like the stdin/http/shell connectors, a byte-stream
endpoint feeds the single parser head, so receipt is driver-side; the
spooled messages then flow through the normal distributed readers. The
bulk path at scale is kafka/files — zmq is a control-plane tap, exactly
as in the reference.
"""

from __future__ import annotations

import socket
import struct
import threading
import time

DEFAULT_ENDPOINT = "tcp://127.0.0.1:5555"

_FLAG_MORE = 0x01
_FLAG_LONG = 0x02
_FLAG_COMMAND = 0x04

#: ceiling on a single ZMTP frame AND on the loader's total spool —
#: a malformed/malicious peer announcing a 2^40-byte frame must not
#: drive the driver out of memory (same guard class as shell/net)
MAX_FRAME_BYTES = 256 * 1024 * 1024


class FrameTooLarge(ConnectionError):
    """A peer announced a frame above MAX_FRAME_BYTES — distinct from
    ordinary disconnects so callers can surface it instead of treating
    it as end-of-stream."""


def _parse_endpoint(endpoint: str) -> tuple[str, int]:
    ep = endpoint.strip()
    if ep.startswith("tcp://"):
        ep = ep[len("tcp://"):]
    if "://" in ep:
        raise ValueError(f"only tcp:// endpoints supported, got {endpoint!r}")
    host, _, port = ep.rpartition(":")
    if not host:
        raise ValueError(f"endpoint needs host:port, got {endpoint!r}")
    return host, int(port)


def _greeting() -> bytes:
    return (b"\xff" + b"\x00" * 8 + b"\x7f"      # signature
            + b"\x03\x00"                        # version 3.0
            + b"NULL" + b"\x00" * 16             # mechanism, 20 bytes
            + b"\x00"                            # as-server
            + b"\x00" * 31)                      # filler


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("ZMTP peer closed the connection")
        buf.extend(chunk)
    return bytes(buf)


def _send_frame(sock: socket.socket, body: bytes, command: bool = False,
                more: bool = False) -> None:
    flags = (_FLAG_COMMAND if command else 0) | (_FLAG_MORE if more else 0)
    if len(body) > 255:
        sock.sendall(bytes([flags | _FLAG_LONG])
                     + struct.pack(">Q", len(body)) + body)
    else:
        sock.sendall(bytes([flags, len(body)]) + body)


def _recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    flags = _recv_exact(sock, 1)[0]
    if flags & _FLAG_LONG:
        size = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    else:
        size = _recv_exact(sock, 1)[0]
    if size > MAX_FRAME_BYTES:
        raise FrameTooLarge(
            f"ZMTP frame of {size} bytes exceeds the {MAX_FRAME_BYTES} "
            "cap — refusing")
    return flags, _recv_exact(sock, size)


def _ready_command(socket_type: str) -> bytes:
    name = b"Socket-Type"
    value = socket_type.encode()
    return (b"\x05READY" + bytes([len(name)]) + name
            + struct.pack(">I", len(value)) + value)


class ZmtpPeer:
    """One connected ZMTP 3.0 / NULL-mechanism peer."""

    def __init__(self, sock: socket.socket, socket_type: str):
        self.sock = sock
        self.socket_type = socket_type
        self.peer_type: str | None = None
        self._handshake()

    def _handshake(self) -> None:
        self.sock.sendall(_greeting())
        sig = _recv_exact(self.sock, 10)
        if sig[0] != 0xFF or sig[9] != 0x7F:
            raise ConnectionError("not a ZMTP peer (bad signature)")
        _recv_exact(self.sock, 2)            # version (we accept >= 3.0)
        mech = _recv_exact(self.sock, 20).rstrip(b"\x00")
        if mech != b"NULL":
            raise ConnectionError(f"unsupported ZMTP mechanism {mech!r}")
        _recv_exact(self.sock, 1 + 31)       # as-server + filler
        _send_frame(self.sock, _ready_command(self.socket_type),
                    command=True)
        flags, body = _recv_frame(self.sock)
        if not flags & _FLAG_COMMAND or not body.startswith(b"\x05READY"):
            raise ConnectionError("expected ZMTP READY command")
        meta = body[6:]
        off = 0
        while off + 5 <= len(meta):
            nlen = meta[off]
            name = meta[off + 1:off + 1 + nlen]
            off += 1 + nlen
            vlen = struct.unpack(">I", meta[off:off + 4])[0]
            value = meta[off + 4:off + 4 + vlen]
            off += 4 + vlen
            if name.lower() == b"socket-type":
                self.peer_type = value.decode()

    def send_message(self, frames: list[bytes] | bytes) -> None:
        if isinstance(frames, bytes):
            frames = [frames]
        for i, f in enumerate(frames):
            _send_frame(self.sock, f, more=i < len(frames) - 1)

    def recv_message(self) -> list[bytes]:
        frames = []
        while True:
            flags, body = _recv_frame(self.sock)
            if flags & _FLAG_COMMAND:
                continue  # PING etc. — ignore
            frames.append(body)
            if not flags & _FLAG_MORE:
                return frames

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def _connect(endpoint: str, socket_type: str, bind: bool,
             timeout: float) -> tuple[ZmtpPeer, socket.socket | None]:
    host, port = _parse_endpoint(endpoint)
    if bind:
        srv = socket.create_server((host, port))
        srv.settimeout(timeout)
        conn, _ = srv.accept()
        conn.settimeout(timeout)
        return ZmtpPeer(conn, socket_type), srv
    # retry while the peer binds — ZeroMQ connects are asynchronous with
    # automatic reconnection; a blocking socket emulates that by polling
    deadline = time.monotonic() + timeout
    while True:
        try:
            sock = socket.create_connection((host, port), timeout=timeout)
            break
        except (ConnectionRefusedError, OSError):
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.05)
    sock.settimeout(timeout)
    return ZmtpPeer(sock, socket_type), None


def load_zmq(endpoint: str = DEFAULT_ENDPOINT, n_messages: int | None = None,
             timeout: float = 10.0, bind: bool = False,
             filter: bytes = b"", raw: bool = False) -> str:
    """SUB-socket loader: subscribe (prefix ``filter``, default all),
    spool received messages newline-joined to a temp file for the
    distributed readers; stops after ``n_messages`` or on timeout.
    Mirrors `from zmq <endpoint> read <fmt>` (zmq.md loader).

    The default spool is newline-FRAMED (one message per line, the shape
    the line-based readers split on), so a payload that itself contains a
    newline is refused loudly — silently spooling it would split one
    message into several records downstream. For self-framing formats
    (multi-line JSON, binary streams) pass ``raw=True``: messages are
    concatenated verbatim with no delimiter and the reader owns framing.
    """
    import os
    import tempfile

    peer, srv = _connect(endpoint, "SUB", bind, timeout)
    try:
        # ZMTP 3.0 subscription: a message of 0x01 + prefix
        peer.send_message(b"\x01" + filter)
        out: list[bytes] = []
        total = 0
        deadline = time.monotonic() + timeout
        while (n_messages is None or len(out) < n_messages) \
                and time.monotonic() < deadline:
            try:
                frames = peer.recv_message()
            except FrameTooLarge:
                raise  # adversarial input must surface, not truncate
            except (TimeoutError, ConnectionError, OSError):
                break
            msg = b"".join(frames)
            total += len(msg)
            if total > MAX_FRAME_BYTES:
                raise RuntimeError(
                    f"zmq spool exceeds {MAX_FRAME_BYTES} bytes; "
                    "use a file-based connector for bulk data")
            if not raw and b"\n" in msg:
                raise ValueError(
                    "zmq message contains a newline and would corrupt the "
                    "line-framed spool; pass raw=True (TQL: --raw) for "
                    "self-framing payloads")
            out.append(msg)
        fd, spool = tempfile.mkstemp(prefix="tenzir_zmq_")
        with os.fdopen(fd, "wb") as fh:
            if raw:
                fh.write(b"".join(out))
            else:
                fh.write(b"\n".join(out) + (b"\n" if out else b""))
        return spool
    finally:
        peer.close()
        if srv is not None:
            srv.close()


def save_zmq(lines, endpoint: str = DEFAULT_ENDPOINT, bind: bool = True,
             timeout: float = 10.0) -> int:
    """PUB-socket saver: publish each byte chunk as one message,
    honoring the subscriber's prefix subscriptions (slow-joiner-safe:
    waits for the first subscription before publishing). Mirrors
    `to zmq [write <fmt>]` (zmq.md saver). Returns messages sent."""
    try:
        peer, srv = _connect(endpoint, "PUB", bind, timeout)
    except (TimeoutError, socket.timeout):
        # no subscriber ever connected: ZeroMQ PUB semantics — messages
        # to nobody are dropped, not an error
        return 0
    try:
        subs: list[bytes] = []
        # block for the first ACTIVE subscription (slow-joiner safety),
        # then drain any further pending subscription traffic — libzmq
        # peers may cancel a stale subscription first or subscribe to
        # several prefixes, each as its own 0x01/0x00 message
        deadline = time.monotonic() + timeout
        while not subs and time.monotonic() < deadline:
            peer.sock.settimeout(max(deadline - time.monotonic(), 0.05))
            try:
                flags, body = _recv_frame(peer.sock)
            except FrameTooLarge:
                raise
            except (TimeoutError, socket.timeout, OSError):
                # connected peer that never subscribes — or disconnects
                # before subscribing: publish nothing, gracefully (PUB
                # drops unmatched messages)
                return 0
            if flags & _FLAG_COMMAND:
                continue
            if body[:1] == b"\x01":
                subs.append(body[1:])
            elif body[:1] == b"\x00" and body[1:] in subs:
                subs.remove(body[1:])
        peer.sock.settimeout(0.05)
        while True:
            try:
                flags, body = _recv_frame(peer.sock)
            except (TimeoutError, OSError):
                break
            if flags & _FLAG_COMMAND:
                continue
            if body[:1] == b"\x01":
                subs.append(body[1:])
            elif body[:1] == b"\x00" and body[1:] in subs:
                subs.remove(body[1:])
        peer.sock.settimeout(timeout)
        sent = 0
        for chunk in lines:
            if isinstance(chunk, str):
                chunk = chunk.encode()
            if any(chunk.startswith(s) for s in subs):
                peer.send_message(chunk)
                sent += 1
        return sent
    finally:
        peer.close()
        if srv is not None:
            srv.close()
