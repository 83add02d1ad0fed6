"""Structured metrics: JSON-lines event log.

The reference's observability is unstructured ``putStrLn`` progress lines
(SURVEY §5).  This sink emits one JSON object per event — phase timings,
dataset sizes, throughput — machine-parseable for run tracking.

Enable with ``SKA_SDP_TPU_METRICS=<path>`` or the CLI ``--metrics`` flag.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class MetricsSink:
    def __init__(self, path: Optional[str] = None):
        if path is None:
            path = os.environ.get("SKA_SDP_TPU_METRICS") or None
        self.path = path

    def emit(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        rec = {"ts": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
