"""Structured metrics: JSON-lines event log.

The reference's observability is unstructured ``putStrLn`` progress lines
(SURVEY §5).  This sink emits one JSON object per event — phase timings,
dataset sizes, throughput — machine-parseable for run tracking.

Multi-host safe: every record carries the JAX process index (when the
distributed runtime is initialized), and each line is written with a single
atomic ``os.write`` on an ``O_APPEND`` descriptor so concurrent writers
from different hosts never interleave partial lines.

Enable with ``SKA_SDP_TPU_METRICS=<path>`` or the CLI ``--metrics`` flag.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class MetricsSink:
    def __init__(self, path: Optional[str] = None):
        if path is None:
            path = os.environ.get("SKA_SDP_TPU_METRICS") or None
        self.path = path

    def emit(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        rec = {
            "ts": time.time(),
            "proc": _process_index(),
            "event": event,
            **fields,
        }
        line = (json.dumps(rec) + "\n").encode()
        # one os.write per line on O_APPEND: atomic for small writes on
        # LOCAL POSIX filesystems, so concurrent processes on one host never
        # interleave.  On network filesystems (NFS) append atomicity is not
        # guaranteed — multi-host runs should point each host at its own
        # file (e.g. suffix the path with jax.process_index()) and merge
        # offline; each record carries its "proc" field for that.
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, line)
        finally:
            os.close(fd)
