"""Probe: resident-grid w-proj scatter — the WHOLE 2400^2 interleaved uv
grid as one VMEM accumulator, records consumed in ARBITRARY order.

If a ~49 MB VMEM accumulator (+ 14.7 MB bank) compiles and the inner loop
stays at the production kernel's ~32 ns/record, the lax.sort binning pass
(30 ms/Mvis — the round-2 wall) disappears entirely for w-proj, degrid and
fused AW: no sort, no tile CSR, no halo fold.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/probe_resident.py
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
C = 256
H = W = 2400
PAD = 16
NW, QPX, S = 32, 8, 15
SH = 24          # padded patch rows (8-aligned >= S)
SW = 256         # padded patch lanes (>= 2*S rounded to 128 + 128 shift room)
UNROLL = 32

HP = ((H + 2 * PAD + 7) // 8) * 8                      # 2432
WP2 = (((2 * (W + 2 * PAD) + 127) // 128) * 128) + SW  # lane-interleaved + margin


def _kernel(recs_ref, bank_a_ref, bank_b_ref, out_ref, *, unroll: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nk = bank_a_ref.shape[0]

    def _compute(i):
        y0 = recs_ref[0, 0, i].astype(jnp.int32)
        x0 = recs_ref[0, 1, i].astype(jnp.int32)
        k = recs_ref[0, 2, i].astype(jnp.int32)
        k = jnp.minimum(k, jnp.int32(nk - 1))
        vr = recs_ref[0, 3, i]
        vi = recs_ref[0, 4, i]
        patch = vr * bank_a_ref[k] + vi * bank_b_ref[k]
        r = jax.lax.rem(y0, jnp.int32(8))
        x2 = x0 * 2
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - r, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, SH - S), (0, SW - 2 * S)))
        patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
        return patch, y0a, x2a

    def vis_body(iu, _):
        items = [_compute(iu * unroll + u) for u in range(unroll)]
        for u, (patch, y0a, x2a) in enumerate(items):
            out_ref[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch
        return 0

    jax.lax.fori_loop(0, C // unroll, vis_body, 0, unroll=False)


def make(unroll: int):
    nblk = N // C

    @jax.jit
    def run(recs, bank_a, bank_b):
        return pl.pallas_call(
            functools.partial(_kernel, unroll=unroll),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 8, C), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(recs, bank_a, bank_b)

    return run


def main():
    rng = np.random.default_rng(0)
    nkq = NW * QPX * QPX
    bank_a = jnp.asarray(rng.standard_normal((nkq, S, 2 * S)).astype(np.float32))
    bank_b = jnp.asarray(rng.standard_normal((nkq, S, 2 * S)).astype(np.float32))
    y0 = rng.integers(0, H + PAD, N)
    x0 = rng.integers(0, W + PAD, N)
    k = rng.integers(0, nkq, N)
    recs = np.zeros((N // C, 8, C), np.float32)
    recs[:, 0, :] = y0.reshape(N // C, C)
    recs[:, 1, :] = x0.reshape(N // C, C)
    recs[:, 2, :] = k.reshape(N // C, C)
    recs[:, 3, :] = rng.standard_normal(N).reshape(N // C, C)
    recs[:, 4, :] = rng.standard_normal(N).reshape(N // C, C)
    recs_j = jnp.asarray(recs)

    for unroll in ([int(sys.argv[1])] if len(sys.argv) > 1 else [16, 32]):
        fn = make(unroll)
        t0 = time.perf_counter()
        s = float(jnp.sum(jnp.abs(fn(recs_j, bank_a, bank_b))))
        print(f"u{unroll} compile+run {time.perf_counter()-t0:.1f}s chk={s:.1f}",
              flush=True)
        for kk in range(4):
            t0 = time.perf_counter()
            s = float(jnp.sum(jnp.abs(
                fn(recs_j + 1e-6 * (kk + 1), bank_a, bank_b))))
            t1 = time.perf_counter() - t0
            print(f"u{unroll} step {kk}: {t1*1e3:7.2f} ms "
                  f"({N/t1/1e6:6.1f} M rec/s) chk={s:.1f}", flush=True)


if __name__ == "__main__":
    main()
