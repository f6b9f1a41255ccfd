"""Bench-only PySpark daemon wrapper: move worker-daemon stderr off the
parsed tail.

The driver's bench harness captures a bounded tail of the bench process's
stderr; PySpark's forked daemon children print benign-but-ugly
``BrokenPipeError`` noise there whenever the JVM closes a reused Python
worker's socket with unflushed output (daemon.py's ``outfile.flush()`` in
the ``finally`` — pure teardown timing, after results are produced; r3/r4
verdict item). The children are forks of this process, so no in-process
filter in the bench driver can catch them — but the daemon entrypoint CAN
redirect its own fd 2 before forking, and every child inherits it.

``TRIBECA_DAEMON_STDERR`` names the side log (default: keep stderr as-is
so this wrapper is a no-op outside bench). Nothing is discarded: bench.py
points it at ``BENCH_DAEMON_STDERR.log``, commits it alongside
``BENCH_STDERR.log``, and reports both logs' traceback counts in the JSON
line. Real worker errors are unaffected — Python exceptions travel to the
JVM over the worker protocol and surface driver-side regardless of where
worker stderr points.

Activate with ``spark.python.daemon.module=tribeca_insights_spark.quiet_daemon``
(the daemon process inherits the driver's env in local mode, so the repo
must be on ``PYTHONPATH`` — bench.py exports it before the JVM starts).
"""

import os
import sys

_path = os.environ.get("TRIBECA_DAEMON_STDERR")
if _path:
    _fd = os.open(_path, os.O_CREAT | os.O_APPEND | os.O_WRONLY)
    os.dup2(_fd, 2)
    os.close(_fd)
    sys.stderr = os.fdopen(2, "w", buffering=1)

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
