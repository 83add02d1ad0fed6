"""Probe: Pallas counting-sort router — can per-record VMEM row moves beat
the ~30 ms/Mvis lax.sort wall? (VERDICT r2 #1, TODO.md #3)

Plan under test: records are routed into per-bucket VMEM staging slabs by a
scalar loop doing one (1, 8) dynamic-sublane read + one (1, 8)
dynamic-sublane write per record, with full slabs DMA-flushed to HBM.  The
destination rows are precomputed (vectorized), so iterations are fully
independent and Mosaic can pipeline them.

Variants:
  mover      — row moves only, no flush DMA (best case)
  mover_u4   — unrolled x4
  mover_u8   — unrolled x8
  flush      — mover_u8 + per-slab DMA flushes to HBM (realistic)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/probe_router.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20
C = 256          # records per input block
NB = 191         # buckets (w-proj tile count at 2400^2)
DEPTH = 64       # records per staging slab
RSTAGE = NB * 2 * DEPTH


def _mover_kernel(rows_ref, recs_ref, out_ref, staging, *, unroll: int):
    c = pl.program_id(0)

    def body(iu, _):
        for u in range(unroll):
            i = iu * unroll + u
            r = rows_ref[0, 0, i]
            staging[pl.ds(r, 1), :] = recs_ref[0, pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, C // unroll, body, 0, unroll=False)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = staging[:]


def make_mover(unroll: int):
    nblk = N // C

    @jax.jit
    def run(rows, recs):
        return pl.pallas_call(
            functools.partial(_mover_kernel, unroll=unroll),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 1, C), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, C, 8), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((RSTAGE, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((RSTAGE, 8), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(rows, recs)

    return run


def _flush_kernel(rows_ref, dst_ref, recs_ref, out_hbm, staging, sems,
                  *, unroll: int):
    """mover + DMA flush: dst_ref[0, 0, i] >= 0 marks 'record i completes a
    slab; flush staging rows [row-DEPTH+1, row] to out_hbm[dst, ...]'."""

    def body(iu, _):
        for u in range(unroll):
            i = iu * unroll + u
            r = rows_ref[0, 0, i]
            staging[pl.ds(r, 1), :] = recs_ref[0, pl.ds(i, 1), :]
            d = dst_ref[0, 0, i]

            @pl.when(d >= 0)
            def _():
                sem_i = (r // DEPTH) % 2
                pltpu.make_async_copy(
                    staging.at[pl.ds(r - (DEPTH - 1), DEPTH), :],
                    out_hbm.at[pl.ds(d, DEPTH), :],
                    sems.at[sem_i],
                ).start()
        return 0

    jax.lax.fori_loop(0, C // unroll, body, 0, unroll=False)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        pltpu.semaphore_wait(sems.at[0], 0)  # no-op touch; real kernel waits


def make_flush(unroll: int):
    nblk = N // C

    @jax.jit
    def run(rows, dsts, recs):
        return pl.pallas_call(
            functools.partial(_flush_kernel, unroll=unroll),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 1, C), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, C), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, C, 8), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((N + NB * DEPTH, 8), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((RSTAGE, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
                has_side_effects=True,
            ),
        )(rows, dsts, recs)

    return run


def _time(fn, args, n_steps=8):
    """Salted timing: the axon tunnel caches results for repeated inputs
    (TODO.md), so every step perturbs both the value and the index stream.
    The first arg must be the rows array, the last the recs array."""
    rows, *mid, recs = args

    @jax.jit
    def salted(rows, recs, salt):
        nblk = rows.shape[0]
        # rotate the block order: same row values, different stream order
        sh = (salt % nblk).astype(jnp.int32)
        rows2 = jnp.roll(rows, sh, axis=0)
        recs2 = recs + salt.astype(jnp.float32) * 1e-6
        return fn(rows2, *mid, recs2)

    @jax.jit
    def chk(rows, recs, salt):
        r = salted(rows, recs, salt)
        return jnp.sum(jnp.abs(r)) if hasattr(r, "shape") else r

    c0 = float(chk(rows, recs, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(n_steps):
        c0 = float(chk(rows, recs, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / n_steps
    assert np.isfinite(c0)
    return dt, c0


def main():
    rng = np.random.default_rng(0)
    # realistic router pattern: per-record buckets drawn randomly, rows
    # follow each bucket's running cursor mod the two staging slots
    t = rng.integers(0, NB, N).astype(np.int32)
    fill = np.zeros(NB, np.int64)
    rows = np.empty(N, np.int32)
    dsts = np.full(N, -1, np.int32)
    # bucket bases in the padded output, DEPTH-aligned
    for i in range(N):
        b = t[i]
        cur = fill[b]
        slot = (cur // DEPTH) % 2
        rows[i] = b * (2 * DEPTH) + slot * DEPTH + cur % DEPTH
        if cur % DEPTH == DEPTH - 1:
            dsts[i] = b * (N // NB + DEPTH)  # crude per-bucket base
        fill[b] = cur + 1
    recs = rng.standard_normal((N // C, C, 8)).astype(np.float32)
    rows_j = jnp.asarray(rows).reshape(N // C, 1, C)
    dsts_j = jnp.asarray(dsts).reshape(N // C, 1, C)
    recs_j = jnp.asarray(recs)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}
    if which in ("all", "mover"):
        for unroll in (1, 4, 8):
            fn = make_mover(unroll)
            dt, _ = _time(fn, (rows_j, recs_j))
            results[f"mover_u{unroll}"] = dt
            print(f"mover  unroll={unroll}: {dt*1e3:7.2f} ms "
                  f"({N/dt/1e6:6.1f} M rec/s)", flush=True)
    if which in ("all", "flush"):
        for unroll in (4, 8):
            fn = make_flush(unroll)
            dt, _ = _time(fn, (rows_j, dsts_j, recs_j))
            results[f"flush_u{unroll}"] = dt
            print(f"flush  unroll={unroll}: {dt*1e3:7.2f} ms "
                  f"({N/dt/1e6:6.1f} M rec/s)", flush=True)


if __name__ == "__main__":
    main()
