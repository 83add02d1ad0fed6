"""Microbenchmark variants of the Pallas gridder inner loop on real TPU.

Variants disable parts of the per-visibility work to locate the bottleneck:
  full      — production kernel
  nostore   — skip the acc += (keeps matmuls)         [wrong results]
  nomatmul  — store raw 24x256 zeros-placed patch      [wrong results]
  nothing   — only scalar reads + branch               [wrong results]
"""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys
sys.path.insert(0, "/root/repo")
from ska_sdp_tpu.kernels import wproj_pallas as wp

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

def make_kernel(gh, gw, variant):
    SH = wp._align(gh + 7, 8); SW = wp._align(gw + 127, 128)
    def _kernel(starts_ref, recs_hbm, bank_re_ref, bank_im_ref,
                out_re_ref, out_im_ref, recs_s, acc, sems):
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
            def vis_body(i, _):
                if variant == "empty":
                    return 0
                if variant == "scalar1":
                    acc[0, :8, :128] += recs_s[3, i]
                    return 0
                if variant == "novalid":
                    y0v = recs_s[0, i].astype(jnp.int32)
                    x0v = recs_s[1, i].astype(jnp.int32)
                    kv = recs_s[2, i].astype(jnp.int32)
                    vrv = recs_s[3, i]; viv = recs_s[4, i]
                    rv = jax.lax.rem(y0v, jnp.int32(8))
                    ccv = jax.lax.rem(x0v, jnp.int32(128))
                    y0av = pl.multiple_of(y0v - rv, 8)
                    x0av = pl.multiple_of(x0v - ccv, 128)
                    krv = bank_re_ref[kv]; kiv = bank_im_ref[kv]
                    prv = vrv * krv - viv * kiv
                    piv = vrv * kiv + viv * krv
                    prv = jnp.pad(prv, ((0, SH-gh), (0, SW-gw)))
                    piv = jnp.pad(piv, ((0, SH-gh), (0, SW-gw)))
                    prv = pltpu.roll(pltpu.roll(prv, rv, 0), ccv, 1)
                    piv = pltpu.roll(pltpu.roll(piv, rv, 0), ccv, 1)
                    acc[0, pl.ds(y0av, SH), pl.ds(x0av, SW)] += prv
                    acc[1, pl.ds(y0av, SH), pl.ds(x0av, SW)] += piv
                    return 0
                @pl.when((i >= lo) & (i < hi))
                def _():
                    y0 = recs_s[0, i].astype(jnp.int32)
                    x0 = recs_s[1, i].astype(jnp.int32)
                    k = recs_s[2, i].astype(jnp.int32)
                    vr = recs_s[3, i]; vi = recs_s[4, i]
                    r = jax.lax.rem(y0, jnp.int32(8))
                    cc = jax.lax.rem(x0, jnp.int32(128))
                    y0a = pl.multiple_of(y0 - r, 8)
                    x0a = pl.multiple_of(x0 - cc, 128)
                    if variant == "nothing":
                        acc[0, :8, :128] += vr + jnp.float32(y0a + x0a)
                        return
                    kr = bank_re_ref[k]; ki = bank_im_ref[k]
                    P = jnp.concatenate([vr*kr - vi*ki, vr*ki + vi*kr], axis=0)
                    if variant == "nomatmul":
                        pad = jnp.zeros((SH - 2*gh + gh, SW - gw), jnp.float32)
                        blk = jnp.pad(P[:gh], ((0, SH-gh), (0, SW-gw)))
                        acc[0, pl.ds(y0a, SH), pl.ds(x0a, SW)] += blk
                        acc[1, pl.ds(y0a, SH), pl.ds(x0a, SW)] += blk
                        return
                    if variant == "roll":
                        SHp, SWp = SH, SW
                        pr = jnp.pad(P[:gh], ((0, SHp-gh), (0, SWp-gw)))
                        pi = jnp.pad(P[gh:], ((0, SHp-gh), (0, SWp-gw)))
                        pr = pltpu.roll(pltpu.roll(pr, r, 0), cc, 1)
                        pi = pltpu.roll(pltpu.roll(pi, r, 0), cc, 1)
                        acc[0, pl.ds(y0a, SH), pl.ds(x0a, SW)] += pr
                        acc[1, pl.ds(y0a, SH), pl.ds(x0a, SW)] += pi
                        return
                    S, T = wp._shift_mats(gh, gw, r, cc)
                    mid = jnp.dot(P, T, preferred_element_type=jnp.float32)
                    wide = jnp.dot(S, mid, preferred_element_type=jnp.float32)
                    if variant == "nostore":
                        acc[0, :8, :128] += wide[:8, :128]
                        return
                    acc[0, pl.ds(y0a, SH), pl.ds(x0a, SW)] += wide[:SH]
                    acc[1, pl.ds(y0a, SH), pl.ds(x0a, SW)] += wide[SH:]
                return 0
            jax.lax.fori_loop(0, wp.CHUNK, vis_body, 0, unroll=False)
            return 0
        nblocks = jnp.where(end > start, (end - jnp.int32(1)) // wp.CHUNK - b_lo + 1, 0)
        jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
        out_re_ref[0] = acc[0]; out_im_ref[0] = acc[1]
    return _kernel

def run(variant):
    THETA, LAM = 0.008, 300000
    NW, QPX, S = 16, 8, 15
    N = 1 << 20
    H = W = 2400
    rng = np.random.default_rng(0)
    bank_re = rng.standard_normal((NW,QPX,QPX,S,S)).astype(np.float32)
    bank_im = rng.standard_normal((NW,QPX,QPX,S,S)).astype(np.float32)
    uvw = rng.uniform(-0.42, 0.42, size=(N,3)).astype(np.float32)
    wbin = rng.integers(0, NW, N).astype(np.int32)
    vr = rng.standard_normal(N).astype(np.float32)
    vi = rng.standard_normal(N).astype(np.float32)

    gh = gw = S
    TYP, TXP = wp.TY + wp.PAD, wp.TX + wp.PADX
    kern = make_kernel(gh, gw, variant)

    @jax.jit
    def step(bank_re, bank_im, p, wbin, vr, vi):
        recs, starts, (Hp, Wp, nty, ntx) = wp._preprocess((H,W), QPX, gh, gw, p, wbin, vr, vi)
        ntiles = nty*ntx
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1,TYP,TXP), lambda t,*_: (t,0,0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((1,TYP,TXP), lambda t,*_: (t,0,0), memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.SMEM((8,wp.CHUNK), jnp.float32),
                            pltpu.VMEM((2,TYP,TXP), jnp.float32),
                            pltpu.SemaphoreType.DMA((1,))],
        )
        o1, o2 = pl.pallas_call(kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((ntiles,TYP,TXP), jnp.float32)]*2,
        )(starts, recs, bank_re.reshape(-1,S,S), bank_im.reshape(-1,S,S))
        return jnp.abs(o1).sum() + jnp.abs(o2).sum()

    args = tuple(jnp.asarray(a) for a in (bank_re, bank_im, uvw, wbin, vr, vi))
    chk = float(step(*args)); 
    t0 = time.perf_counter()
    for _ in range(3):
        chk = float(step(*args))
    dt = (time.perf_counter()-t0)/3
    print(f"{variant}: {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mvis/s (chk {chk:.3e})")

run(VARIANT)
