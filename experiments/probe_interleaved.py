"""Probe per-vis cost in the interleaved kernel: full / static-roll / no-roll / no-gather."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from ska_sdp_tpu.kernels import wproj_pallas as wp

VARIANT = sys.argv[1]

def make_kernel(gh, gw, variant):
    SH = wp._align(gh + 7, 8); SW = wp._align(2*gw + 255, 128)
    def _kernel(starts_ref, recs_hbm, a_ref, b_ref, out_ref, recs_s, acc, sems):
        t = pl.program_id(0)
        start = starts_ref[t]; end = starts_ref[t + 1]
        acc[:] = jnp.zeros_like(acc)
        b_lo = start // wp.CHUNK
        def chunk_body(c, _):
            b = b_lo + c
            cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
            cp.start(); cp.wait()
            lo = jnp.maximum(start - b * wp.CHUNK, 0)
            hi = jnp.minimum(end - b * wp.CHUNK, wp.CHUNK)
            def one(i, lo, hi):
                @pl.when((i >= lo) & (i < hi))
                def _():
                    y0 = recs_s[0, i].astype(jnp.int32)
                    x0 = recs_s[1, i].astype(jnp.int32)
                    k = recs_s[2, i].astype(jnp.int32)
                    vr = recs_s[3, i]; vi = recs_s[4, i]
                    if variant == "nogather":
                        patch = vr * a_ref[0] + vi * b_ref[0]
                    else:
                        patch = vr * a_ref[k] + vi * b_ref[k]
                    r = jax.lax.rem(y0, jnp.int32(8))
                    cc = jax.lax.rem(x0, jnp.int32(128))
                    y0a = pl.multiple_of(y0 - r, 8)
                    x2a = pl.multiple_of((x0 - cc) * 2, 256)
                    patch = jnp.pad(patch, ((0, SH - gh), (0, SW - 2*gw)))
                    if variant == "staticroll":
                        patch = pltpu.roll(pltpu.roll(patch, 5, 0), 10, 1)
                    elif variant == "noroll":
                        pass
                    else:
                        patch = pltpu.roll(pltpu.roll(patch, r, 0), 2*cc, 1)
                    acc[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch
            def vis_body(iu, _):
                for u in range(wp.UNROLL):
                    one(iu * wp.UNROLL + u, lo, hi)
                return 0
            jax.lax.fori_loop(0, wp.CHUNK // wp.UNROLL, vis_body, 0, unroll=False)
            return 0
        nblocks = jnp.where(end > start, (end - jnp.int32(1)) // wp.CHUNK - b_lo + 1, 0)
        jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
        out_ref[0] = acc[:]
    return _kernel

def run(variant):
    NW, QPX, S = 32, 8, 15
    N = 1 << 20; H = W = 2400
    rng = np.random.default_rng(0)
    br = rng.standard_normal((NW,QPX,QPX,S,S)).astype(np.float32)
    bi = rng.standard_normal((NW,QPX,QPX,S,S)).astype(np.float32)
    uvw = rng.uniform(-0.42, 0.42, size=(N,3)).astype(np.float32)
    wbin = rng.integers(0, NW, N).astype(np.int32)
    vr = rng.standard_normal(N).astype(np.float32)
    vi = rng.standard_normal(N).astype(np.float32)
    gh = gw = S
    TYP, TXP2 = wp.TY + wp.PAD, 2*(wp.TX + wp.PADX)
    kern = make_kernel(gh, gw, variant)
    @jax.jit
    def step(br, bi, p, wbin, vr, vi):
        recs, starts, (Hp, Wp, nty, ntx) = wp._preprocess((H,W), QPX, gh, gw, p, wbin, vr, vi)
        a, b = wp._interleave_bank(br.reshape(-1,S,S), bi.reshape(-1,S,S))
        ntiles = nty*ntx
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1,TYP,TXP2), lambda t,*_: (t,0,0), memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.SMEM((8,wp.CHUNK), jnp.float32),
                            pltpu.VMEM((TYP,TXP2), jnp.float32),
                            pltpu.SemaphoreType.DMA((1,))],
        )
        (o,) = pl.pallas_call(kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((ntiles,TYP,TXP2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024),
        )(starts, recs, a, b)
        return jnp.abs(o).sum()
    args = tuple(jnp.asarray(a) for a in (br, bi, uvw, wbin, vr, vi))
    chk = float(step(*args))
    t0 = time.perf_counter()
    for _ in range(3): chk = float(step(*args))
    dt = (time.perf_counter()-t0)/3
    print(f"{variant}: {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mvis/s (chk {chk:.4e})")

run(VARIANT)
