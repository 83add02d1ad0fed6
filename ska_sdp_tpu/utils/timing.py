"""Phase timing / observability.

The reference exposes Accelerate's debug-flag system (compile/exec phase
timings, ``dump_phases`` etc. — SURVEY §5, ``app/Main.hs:80-112``).  The
TPU-native equivalent: lightweight wall-clock phase timers that are also the
hook point for ``jax.profiler`` traces, behind one env/CLI surface.

Set ``SKA_SDP_TPU_DUMP_PHASES=1`` (or pass ``-dphases`` on the CLI) to print
per-phase wall-clock lines; ``SKA_SDP_TPU_TRACE_DIR=<dir>`` additionally
captures a ``jax.profiler`` trace around each phase for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict


class PhaseTimer:
    def __init__(self, enabled: bool | None = None, trace_dir: str | None = None):
        if enabled is None:
            enabled = os.environ.get("SKA_SDP_TPU_DUMP_PHASES", "0") == "1"
        if trace_dir is None:
            trace_dir = os.environ.get("SKA_SDP_TPU_TRACE_DIR") or None
        self.enabled = enabled
        self.trace_dir = trace_dir
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        ctx = contextlib.nullcontext()
        if self.trace_dir:
            import jax

            ctx = jax.profiler.trace(self.trace_dir)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        if self.enabled:
            print(f"[phase] {name:<28s} {dt*1e3:10.2f} ms", flush=True)

    def report(self) -> str:
        return "\n".join(
            f"{k:<28s} {v*1e3:10.2f} ms" for k, v in self.times.items()
        )
