"""shell — pipe bytes through a child process (source or byte transform).

Reference: ``libtenzir/builtins/operators/shell.cpp:151`` (332 LoC): runs
a command via the system shell; as a SOURCE its stdout becomes the
pipeline's byte stream, as a TRANSFORMATION the upstream bytes are its
stdin. Both positions sit at the BYTE layer, before a ``read <fmt>``
parser.

Spark design: byte-level child processes are driver-side by nature (the
stream feeds a single parser head, exactly like the reference's
single-node loader). The child's stdout spools to a temp file and the
normal distributed readers take over — same seam as the stdin and http
connectors. Row-level distributed piping (the RDD ``pipe()`` analog) is
deliberately NOT offered: the reference's shell is a byte-stream
operator, and per-row subprocesses are the wrong shape at scale.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

#: ceiling for spooled child output, mirroring sources/net.py's guard —
#: shell is a control-plane connector, never the bulk-data path
MAX_SPOOL_BYTES = 256 * 1024 * 1024


def run_shell(command: str, stdin_path: str | None = None,
              timeout: float = 300.0) -> str:
    """Run ``command`` through the shell and spool its stdout to a temp
    file; returns the spool path for a distributed reader.

    ``stdin_path`` feeds a file as the child's stdin (the transformation
    position: ``load f | shell "tr a-z A-Z" | read json``).
    Non-zero exit raises with the child's stderr, matching the
    reference's error propagation (shell.cpp exit-code diagnostics).
    """
    import time

    fd, spool = tempfile.mkstemp(prefix="tenzir_shell_")
    efd, errpath = tempfile.mkstemp(prefix="tenzir_shell_err_")
    proc = None
    try:
        # stdout and stderr go STRAIGHT to files: no Python read loop
        # means no pipe-buffer deadlock (a child filling stderr while we
        # drained stdout would block forever against a PIPE), and the
        # kernel does the copying. The size cap and the overall timeout
        # are enforced by polling the child — the cap bounds disk/driver
        # exposure before the child can finish writing.
        with (open(stdin_path, "rb") if stdin_path else
              open(os.devnull, "rb")) as inp:
            proc = subprocess.Popen(command, shell=True, stdin=inp,
                                    stdout=fd, stderr=efd)
        deadline = time.monotonic() + timeout
        while proc.poll() is None:
            # cap BOTH spools — an unbounded stderr flood is the same
            # disk-exhaustion exposure as stdout
            if os.fstat(fd).st_size > MAX_SPOOL_BYTES \
                    or os.fstat(efd).st_size > MAX_SPOOL_BYTES:
                proc.kill()
                raise RuntimeError(
                    f"shell output exceeds {MAX_SPOOL_BYTES} bytes; "
                    "use a file-based connector for bulk data")
            if time.monotonic() > deadline:
                proc.kill()
                raise RuntimeError(
                    f"shell command {command!r} timed out after "
                    f"{timeout}s")
            time.sleep(0.02)
        if os.fstat(fd).st_size > MAX_SPOOL_BYTES:
            raise RuntimeError(
                f"shell output exceeds {MAX_SPOOL_BYTES} bytes; "
                "use a file-based connector for bulk data")
        if proc.returncode != 0:
            with open(errpath, "rb") as ef:
                err = ef.read(65536)
            raise RuntimeError(
                f"shell command {command!r} exited {proc.returncode}: "
                f"{err.decode(errors='replace')[:500]}")
        return spool
    except Exception:
        if proc is not None and proc.poll() is None:
            proc.kill()
        if os.path.exists(spool):
            os.unlink(spool)
        raise
    finally:
        os.close(fd)
        os.close(efd)
        if os.path.exists(errpath):
            os.unlink(errpath)
