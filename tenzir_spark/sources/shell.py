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
    fd, spool = tempfile.mkstemp(prefix="tenzir_shell_")
    proc = None
    try:
        with (open(stdin_path, "rb") if stdin_path else
              open(os.devnull, "rb")) as inp, os.fdopen(fd, "wb") as out:
            fd = None
            # stream the child's stdout straight to the spool so the cap
            # bounds DRIVER MEMORY, not just the final file size — a
            # buffered subprocess.run would hold the whole output in RAM
            # before any check could fire
            proc = subprocess.Popen(
                command, shell=True, stdin=inp, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE)
            written = 0
            while True:
                chunk = proc.stdout.read(1 << 20)
                if not chunk:
                    break
                written += len(chunk)
                if written > MAX_SPOOL_BYTES:
                    proc.kill()
                    raise RuntimeError(
                        f"shell output exceeds {MAX_SPOOL_BYTES} bytes; "
                        "use a file-based connector for bulk data")
                out.write(chunk)
            stderr = proc.stderr.read(65536)
            rc = proc.wait(timeout=timeout)
        if rc != 0:
            raise RuntimeError(
                f"shell command {command!r} exited {rc}: "
                f"{stderr.decode(errors='replace')[:500]}")
        return spool
    except Exception:
        if proc is not None and proc.poll() is None:
            proc.kill()
        if fd is not None:
            os.close(fd)
        if os.path.exists(spool):
            os.unlink(spool)
        raise
