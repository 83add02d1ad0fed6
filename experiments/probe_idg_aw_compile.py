"""Bisect the ~17-min cold Mosaic compile of the 2400^2 IDG-AW kernel.

VERDICT r3 #5 / TODO r3: the IDG-AW resident kernel's first compile
through the tunnel takes ~17 min at the bench shape while the other
resident kernels take 2-6 min.  This probe AOT-compiles
``idg_aw_grid_from_records`` (via jit(...).lower().compile()) across
single-parameter variations to find which one drives compile time:

  base          N=2400, max_runs=24382, nblk=4096, CHUNK=256, HIGHEST
  runs2k        max_runs=2048           (grid-count axis)
  runs256       max_runs=256
  n1200         N=1200                  (VMEM out-size axis)
  n600          N=600
  prechigh      accumulation dots at HIGH (3-pass) via ablation kernel
  chunk512      CHUNK=512 via ablation kernel

Compilation caching is DISABLED here (each run must measure a true cold
compile), so run each mode in a fresh process:
  PYTHONPATH=/root/repo:/root/.axon_site python \
      experiments/probe_idg_aw_compile.py base
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import numpy as np

import jax
import jax.numpy as jnp

N_BASE = 2400
MAXR_BASE = 24382
NBLK = 4096          # 1M records / CHUNK
CHUNK = 256


def compile_one(N, max_runs, nblk, chunk=CHUNK, variant="prod",
                mm_prec=None):
    from ska_sdp_tpu.kernels.idg_aw_pallas import (
        _geometry, idg_aw_grid_from_records)

    S = 64
    nant = 64
    HP, WP = _geometry(N, N, S)[0], None
    recs = jax.ShapeDtypeStruct((nblk, 8, chunk), jnp.float32)
    iv = jax.ShapeDtypeStruct((max_runs,), jnp.int32)
    scr = jax.ShapeDtypeStruct((nant, S, S), jnp.float32)

    if variant == "prod":
        def fn(recs, st, en, y0, x0, i1, i2, sre, sim):
            return idg_aw_grid_from_records(
                recs, st, en, y0, x0, i1, i2, (N, N), sre, sim,
                theta=0.008)
    else:
        import functools
        from experiments.probe_idg_aw_ablate import grid_from_records_ab
        prec = mm_prec or jax.lax.Precision.HIGHEST
        def fn(recs, st, en, y0, x0, i1, i2, sre, sim):
            return grid_from_records_ab(
                recs, st, en, y0, x0, i1, i2, (N, N), sre, sim,
                theta=0.008, chunk=chunk, mm_prec=prec)

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(recs, iv, iv, iv, iv, iv, iv, scr, scr)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    return t1 - t0, t2 - t1


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    print("devices:", jax.devices(), flush=True)
    cfg = {
        "base": dict(N=N_BASE, max_runs=MAXR_BASE, nblk=NBLK),
        "runs2k": dict(N=N_BASE, max_runs=2048, nblk=NBLK),
        "runs256": dict(N=N_BASE, max_runs=256, nblk=NBLK),
        "n1200": dict(N=1200, max_runs=MAXR_BASE, nblk=NBLK),
        "n600": dict(N=600, max_runs=MAXR_BASE, nblk=NBLK),
        "prechigh": dict(N=N_BASE, max_runs=MAXR_BASE, nblk=NBLK,
                         variant="ab", mm_prec=jax.lax.Precision.HIGH),
        "chunk512": dict(N=N_BASE, max_runs=MAXR_BASE, nblk=NBLK // 2,
                         chunk=512, variant="ab"),
    }[mode]
    tl, tc = compile_one(**cfg)
    print(f"{mode:10s} lower {tl:6.1f}s  compile {tc:8.1f}s", flush=True)


if __name__ == "__main__":
    main()
