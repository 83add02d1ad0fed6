"""Structure probe: add real-kernel stages to the roll microbench one at a
time to find where the per-record cost explodes."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GH, GW = 15, 30          # interleaved patch (gh, 2*gw)
SH, SW = 24, 384
import os
NREC = 16384
REPS = int(os.environ.get('REPS', 1))
NK = 2048

def run_variant(name, body_fn, extra_smem_rows=8):
    def kern(recs_ref, bank_ref, o_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        def rec(i, _):
            body_fn(recs_ref, bank_ref, acc, jax.lax.rem(i, NREC))
            return 0
        jax.lax.fori_loop(0, NREC * REPS, rec, 0)
        o_ref[:] = acc[0:8, 0:128]
    @jax.jit
    def run(recs, bank):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((144, 768), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024),
        )(recs, bank)
    rng = np.random.default_rng(0)
    recs = np.zeros((8, NREC), np.float32)
    recs[0] = rng.integers(0, 128, NREC)      # y0
    recs[1] = rng.integers(0, 256, NREC)      # x0
    recs[2] = rng.integers(0, NK, NREC)       # k
    recs[3] = rng.standard_normal(NREC)       # vr
    recs[4] = rng.standard_normal(NREC)       # vi
    recs = jnp.asarray(recs)
    bank = jnp.asarray(rng.standard_normal((NK, GH, GW)).astype(np.float32))
    o = jax.block_until_ready(run(recs, bank))
    t0=time.perf_counter(); K=3
    for kk in range(K):
        recs2 = recs.at[3, 0].add(np.float32(1e-3*(kk+1)))
        o = jax.block_until_ready(run(recs2, bank))
    dt=(time.perf_counter()-t0)/K/(NREC*REPS)
    print(f'{name:<36s}: {dt*1e9:7.1f} ns/rec')

# A: scalar decode only + static tiny RMW
def body_a(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[0] + vi * bank[1]
    acc[pl.ds(0, GH), pl.ds(0, 128)] += jnp.pad(patch, ((0,0),(0,128-GW)))

# B: + dynamic bank read
def body_b(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[k] + vi * bank[k]
    acc[pl.ds(0, GH), pl.ds(0, 128)] += jnp.pad(patch, ((0,0),(0,128-GW)))

# C: + dynamic RMW address (no rolls, pad to full window)
def body_c(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[k] + vi * bank[k]
    r = jax.lax.rem(y0, jnp.int32(8))
    cc = jax.lax.rem(x0, jnp.int32(128))
    y0a = pl.multiple_of(y0 - r, 8)
    x2a = pl.multiple_of((x0 - cc) * 2, 256)
    patch = jnp.pad(patch, ((0, SH-GH), (0, SW-GW)))
    acc[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

# D: + sublane roll only
def body_d(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[k] + vi * bank[k]
    r = jax.lax.rem(y0, jnp.int32(8))
    cc = jax.lax.rem(x0, jnp.int32(128))
    y0a = pl.multiple_of(y0 - r, 8)
    x2a = pl.multiple_of((x0 - cc) * 2, 256)
    patch = jnp.pad(patch, ((0, SH-GH), (0, SW-GW)))
    patch = pltpu.roll(patch, r, 0)
    acc[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

# E: + lane roll (full real sequence)
def body_e(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[k] + vi * bank[k]
    r = jax.lax.rem(y0, jnp.int32(8))
    cc = jax.lax.rem(x0, jnp.int32(128))
    y0a = pl.multiple_of(y0 - r, 8)
    x2a = pl.multiple_of((x0 - cc) * 2, 256)
    patch = jnp.pad(patch, ((0, SH-GH), (0, SW-GW)))
    patch = pltpu.roll(pltpu.roll(patch, r, 0), 2*cc, 1)
    acc[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

# F: lane roll but STATIC RMW address
def body_f(recs, bank, acc, i):
    y0 = recs[0, i].astype(jnp.int32)
    x0 = recs[1, i].astype(jnp.int32)
    k = recs[2, i].astype(jnp.int32)
    vr = recs[3, i]; vi = recs[4, i]
    patch = vr * bank[k] + vi * bank[k]
    r = jax.lax.rem(y0, jnp.int32(8))
    cc = jax.lax.rem(x0, jnp.int32(128))
    patch = jnp.pad(patch, ((0, SH-GH), (0, SW-GW)))
    patch = pltpu.roll(pltpu.roll(patch, r, 0), 2*cc, 1)
    acc[pl.ds(0, SH), pl.ds(0, SW)] += patch

for nm, b in [('A scalar+static small RMW', body_a),
              ('B +dyn bank read', body_b),
              ('C +dyn RMW full window', body_c),
              ('D +sublane roll', body_d),
              ('E +lane roll (real)', body_e),
              ('F lane roll, static RMW', body_f)]:
    run_variant(nm, b)
