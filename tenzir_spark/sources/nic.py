"""nic — live packet capture from a network interface.

Reference: the ``nic`` connector (``plugins/nic``, docs
``web/docs/connectors/nic.md``): acquires packets from an interface and
emits a byte stream shaped as a valid PCAP capture (file header +
packet records, ``-s/--snaplen`` truncation, ``-e`` per-batch file
headers), which the ``pcap`` parser — the loader's default format —
then decodes.

The reference uses libpcap; none exists here, so capture goes through
Linux ``AF_PACKET`` raw sockets directly (requires root/CAP_NET_RAW,
which this environment has). The emitted bytes use the exact classic-
pcap layout `sources.pcap` reads and writes, so
``from nic lo | decapsulate`` is a real end-to-end live path.

Spark design: a NIC is a single physical tap — capture is driver-side
by nature (same as the reference's one libpcap handle) and bounded by
``n_packets``/``duration``; the spooled capture then flows through the
distributed pcap parser. Sustained high-rate capture belongs on
dedicated taps writing rotated files (the file/directory connectors).
"""

from __future__ import annotations

import socket
import struct
import time

ETH_P_ALL = 0x0003


def load_nic(interface: str = "lo", snaplen: int = 262144,
             n_packets: int | None = None, duration: float = 2.0,
             emit_file_headers: bool = False) -> str:
    """Capture packets from ``interface`` into a classic-pcap spool file
    (usec magic, linktype 1/Ethernet); stops after ``n_packets`` or
    ``duration`` seconds, whichever comes first. Returns the spool path
    for ``read_pcap``. ``emit_file_headers`` matches the reference's
    ``-e`` (here: one capture = one file header; the pcap parser's own
    ``-e`` re-emits it as an event)."""
    import os
    import tempfile

    sock = socket.socket(socket.AF_PACKET, socket.SOCK_RAW,
                         socket.htons(ETH_P_ALL))
    try:
        sock.bind((interface, 0))
        sock.settimeout(0.25)
        fd, spool = tempfile.mkstemp(prefix="tenzir_nic_", suffix=".pcap")
        with os.fdopen(fd, "wb") as out:
            out.write(struct.pack("<IHHIIII", 0xA1B2C3D4, 2, 4, 0, 0,
                                  snaplen, 1))
            got = 0
            deadline = time.monotonic() + duration
            while (n_packets is None or got < n_packets) \
                    and time.monotonic() < deadline:
                try:
                    # buffer must cover the snaplen AND jumbo/loopback
                    # frames (lo MTU is 65536); a packet longer than the
                    # buffer reports its captured length as original —
                    # libpcap learns the true wire length, we note the
                    # divergence rather than guess
                    pkt = sock.recv(max(snaplen, 1 << 17))
                except TimeoutError:
                    continue
                ts = time.time()
                sec = int(ts)
                usec = int((ts - sec) * 1_000_000)
                cap = pkt[:snaplen]
                out.write(struct.pack("<IIII", sec, usec, len(cap),
                                      len(pkt)))
                out.write(cap)
                got += 1
        return spool
    finally:
        sock.close()
