"""Real-TPU timing of the streamed (block-major) IDG-AW kernel vs the
run-major one, at the bench shape (1.048M track records, 2400²).

Variants: {sustained, single-shot, ordered} × {split3, exact} × chunk.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_idg_aw_stream.py [sus ss ord] [chunk...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ska_sdp_tpu_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

THETA, LAM = 0.008, 300000
N = int(round(THETA * LAM))
NANT, NTIME, NCHAN = 64, 65, 8
CHAIN, STEPS = 32, 3

from probe_idg_aw_tpu import track_data  # noqa: E402

from ska_sdp_tpu.ops.idg_aw import aw_screens_host  # noqa: E402
from ska_sdp_tpu.kernels.idg_aw_pallas import (  # noqa: E402
    idg_aw_run_records)
from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (  # noqa: E402
    idg_aw_grid_from_records_stream, idg_aw_grid_stream)


def timeit(name, step, args, n, chain=None):
    chain = chain or CHAIN

    @jax.jit
    def chained(salt0, *a):
        def body(i, acc):
            return acc + step(*a, salt0 + 1e-6 * i.astype(jnp.float32))
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    c0 = float(chained(jnp.float32(0.0), *args))
    tc = time.perf_counter() - t0
    assert np.isfinite(c0), name
    ts = []
    for i in range(STEPS):
        t0 = time.perf_counter()
        float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / chain
    print(f"{name:24s} compile {tc:6.1f}s  {dt*1e3:7.2f} ms/step  "
          f"{n/dt/1e6:6.1f} M vis/s", flush=True)


def main():
    which = [a for a in sys.argv[1:] if not a.isdigit()] or ["sus", "ss"]
    chunks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256, 512]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64

    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))
    pj, wj = jnp.asarray(p), jnp.asarray(w)
    a1j = jnp.asarray(a1)
    a2j = jnp.asarray(a2)
    vrj, vij = jnp.asarray(vr), jnp.asarray(vi)

    for tier in ("split3", "exact"):
        os.environ["SKA_SDP_TPU_IDG_AW_PRECISION"] = tier
        for chunk in chunks:
            if "sus" in which:
                @jax.jit
                def prep(_c=chunk):
                    return idg_aw_run_records(
                        (N, N), pj, a1j, a2j, wj, vrj, vij,
                        max_runs=max_runs, chunk=_c)

                recs, st, en, y0, x0, i1, i2, nd, _ = prep()

                @jax.jit
                def sus(recs, st, en, y0, x0, i1, i2, sre, sim, salt):
                    recs = recs.at[0, 3, 0].add(salt)
                    gr, gi = idg_aw_grid_from_records_stream(
                        recs, st, en, y0, x0, i1, i2, (N, N), sre, sim,
                        theta=THETA)
                    return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

                timeit(f"stream/{tier}/c{chunk} sus", sus,
                       (recs, st, en, y0, x0, i1, i2, sre, sim), n)

            if "ss" in which:
                @jax.jit
                def ss(pj, wj, a1j, a2j, vrj, vij, sre, sim, salt,
                       _c=chunk):
                    gr, gi, nd = idg_aw_grid_stream(
                        (N, N), pj, a1j, a2j, wj, vrj, vij + salt, sre,
                        sim, theta=THETA, max_runs=max_runs, chunk=_c)
                    return (jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))
                            + 0.0 * nd)

                timeit(f"stream/{tier}/c{chunk} ss", ss,
                       (pj, wj, a1j, a2j, vrj, vij, sre, sim), n)

            if "ord" in which:
                @jax.jit
                def ordd(pj, wj, a1j, a2j, vrj, vij, sre, sim, salt,
                         _c=chunk):
                    def pm(x):
                        return (x.reshape((NTIME, nbl, NCHAN)
                                          + x.shape[1:])
                                .transpose((1, 2, 0)
                                           + tuple(range(3, x.ndim + 2)))
                                .reshape((n,) + x.shape[1:]))

                    gr, gi, nd = idg_aw_grid_stream(
                        (N, N), pm(pj), pm(a1j), pm(a2j), pm(wj),
                        pm(vrj), pm(vij + salt), sre, sim, theta=THETA,
                        max_runs=max_runs, chunk=_c, ordered=True)
                    return (jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))
                            + 0.0 * nd)

                timeit(f"stream/{tier}/c{chunk} ord", ordd,
                       (pj, wj, a1j, a2j, vrj, vij, sre, sim), n)




# ---------------------------------------------------------------------------
# Ablation ladder for the streamed kernel: where do the ~15 ms/Mvis go?
# (kernel clone with pieces removed; ablated variants compute WRONG
# results — only the timing is meaningful)
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ska_sdp_tpu.kernels.idg_aw_pallas import (IDG_AW_VMEM_BUDGET,
                                               _geometry)
from ska_sdp_tpu.kernels.idg_aw_stream_pallas import block_run_ranges


def _kernel_ab(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref,
               rs_ref, re_ref, recs_hbm, sr_ref, si_ref, f2_ref, hr_ref,
               hi_ref, out_ref, recs_v, acc, accT, sems, *, S, theta,
               theta_x,
               chunk, trig, dots, blockwork, fin, use_dma=True,
               use_seg=True, bare2=False, blk_unroll=1, nowhen=False,
               nosmem=False):
    C = chunk
    nblk = recs_hbm.shape[0]
    f32, bf = jnp.float32, jnp.bfloat16

    out_ref[:] = jnp.zeros_like(out_ref)
    acc[:] = jnp.zeros_like(acc)

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(f32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    two_pi_s = jnp.float32(2.0 * np.pi / S)
    pi_ = jnp.float32(np.pi)
    lane2 = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, 2 * C), 1), jnp.int32(C))
    dn = (((1,), (1,)), ((), ()))
    dn_nt = (((1,), (0,)), ((), ()))

    def dgr(a, b):
        ah = a.astype(bf)
        al = (a - ah.astype(f32)).astype(bf)
        bh = b.astype(bf)
        bl = (b - bh.astype(f32)).astype(bf)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dn_nt, preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)

        return d(ah, bh) + d(ah, bl) + d(al, bh)

    def dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[c], recs_v.at[slot], sems.at[slot])

    if use_dma:
        dma(0, 0).start()

    def finalize(r):
        a_re = acc[0:S, :]
        a_im = acc[S:2 * S, :]
        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2
        p_im = -(r1 * im2 + im1 * r2)
        t2 = jnp.concatenate(
            [a_re * p_re - a_im * p_im,
             a_re * p_im + a_im * p_re], axis=0)
        b2 = dgr(f2_ref[:], t2)
        patch = (dgr(b2[0:S, :], hr_ref[:])
                 + dgr(b2[S:2 * S, :], hi_ref[:]))
        y0 = y0_ref[r]
        x2 = x0_ref[r] * 2
        rr = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - rr, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, 8), (0, 128)))
        patch = pltpu.roll(pltpu.roll(patch, rr, 0), rem, 1)
        out_ref[pl.ds(y0a, S + 8), pl.ds(x2a, 2 * S + 128)] += patch

    def block_body(b, _, slot_s=None):
        slot = (slot_s if slot_s is not None
                else jax.lax.rem(b, jnp.asarray(2, b.dtype)))

        if use_dma:
            @pl.when(b + 1 < nblk)
            def _():
                dma(1 - slot, b + 1).start()

            dma(slot, b).wait()
        if nosmem:
            r0 = b
            r1 = b + 1
        else:
            r0 = rs_ref[b]
            r1 = re_ref[b]

        def _blkwork():
            if blockwork:
                dy = recs_v[slot, 0:1, :]
                dx = recs_v[slot, 1:2, :]
                w = recs_v[slot, 2:3, :]
                vr = recs_v[slot, 3:4, :]
                vi = recs_v[slot, 4:5, :]
                ph_y = two_pi_s * cq * dy - pi_ * lq2y * w
                ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
                if trig:
                    ey_re = jnp.cos(ph_y)
                    ey_im = jnp.sin(ph_y)
                    ex_re = jnp.cos(ph_x)
                    ex_im = jnp.sin(ph_x)
                else:
                    ey_re, ey_im = ph_y, ph_y * jnp.float32(0.5)
                    ex_re, ex_im = ph_x, ph_x * jnp.float32(0.5)
                u_re = ey_re * vr - ey_im * vi
                u_im = ey_re * vi + ey_im * vr
                A = jnp.concatenate(
                    [jnp.concatenate([u_re, -u_im], axis=1),
                     jnp.concatenate([u_im, u_re], axis=1)], axis=0)
                B = jnp.concatenate([ex_re, ex_im], axis=1)
                Ah = A.astype(bf)
                Al = (A - Ah.astype(f32)).astype(bf)
                Bh = B.astype(bf)
                Bl = (B - Bh.astype(f32)).astype(bf)

            def seg_body(k, _):
                r = r0 + k
                lo = jnp.maximum(starts_ref[r] - b * C, 0)
                hi = jnp.minimum(ends_ref[r] - b * C, C)
                if blockwork and dots == "swap":
                    # swapped operand order: the per-block-constant A is
                    # the SECOND operand — if Mosaic keeps the stationary
                    # side there, per-segment weight reloads vanish; the
                    # transposed accumulator (S, 2S) is finalized with
                    # one lane-roll (legal, unlike lane-slicing at 64)
                    m = ((lane2 >= lo) & (lane2 < hi)).astype(bf)
                    bhm = Bh * m
                    blm = Bl * m

                    def d(x, y):
                        return jax.lax.dot_general(
                            x, y, dn, preferred_element_type=f32,
                            precision=jax.lax.Precision.DEFAULT)

                    accT[:] += d(bhm, Ah) + d(blm, Ah) + d(bhm, Al)
                elif blockwork and dots:
                    m = ((lane2 >= lo) & (lane2 < hi)).astype(bf)
                    bhm = Bh * m
                    blm = Bl * m

                    def d(x, y):
                        return jax.lax.dot_general(
                            x, y, dn, preferred_element_type=f32,
                            precision=jax.lax.Precision.DEFAULT)

                    acc[:] += d(Ah, bhm) + d(Ah, blm) + d(Al, bhm)
                elif blockwork:
                    acc[:] += A[:, :S] + (lo + hi).astype(f32)
                else:
                    acc[0:1, :] += (recs_v[slot, 0:1, :S]
                                    + (lo + hi).astype(f32))

                @pl.when(ends_ref[r] <= (b + 1) * C)
                def _():
                    if fin:
                        finalize(r)
                    acc[:] = jnp.zeros_like(acc)

                return 0

            if use_seg:
                jax.lax.fori_loop(0, r1 - r0, seg_body, 0, unroll=False)
            elif not bare2:
                acc[0:1, :] += (recs_v[slot, 0:1, :S]
                                + (r0 + r1).astype(jnp.float32))
            else:
                # bare2: no dynamic-slot recs_v read at all
                acc[0:1, 0:1] += (r0 + r1).astype(jnp.float32)

        if nowhen:
            _blkwork()
        else:
            pl.when(r1 > r0)(_blkwork)

        return 0

    if bare2 == "null":
        acc[0:1, 0:1] += jnp.float32(1.0)
    elif bare2 == "carry":
        def block_carry(b, c):
            if nosmem:
                return c + (b * 2 + 1).astype(jnp.float32)
            return c + (rs_ref[b] + re_ref[b]).astype(jnp.float32)

        tot = jax.lax.fori_loop(0, nblk, block_carry, jnp.float32(0.0),
                                unroll=False)
        acc[0:1, 0:1] += tot
    elif blk_unroll == 2:
        def block_pair(bb, _):
            block_body(bb * 2, 0, slot_s=0)
            block_body(bb * 2 + 1, 0, slot_s=1)
            return 0

        jax.lax.fori_loop(0, nblk // 2, block_pair, 0, unroll=False)
        if nblk % 2:
            block_body(nblk - 1, 0, slot_s=(nblk - 1) % 2)
    else:
        jax.lax.fori_loop(0, nblk, block_body, 0, unroll=False)


def grid_ab(recs, starts, ends, y0, x0, ia1, ia2, grid_shape, scr_re,
            scr_im, *, theta, out_hp=None, trig=True, dots=True,
            blockwork=True,
            fin=True, use_dma=True, use_seg=True, bare2=False,
            blk_unroll=1, nowhen=False, nosmem=False, vmem_mb=None,
            subgrid=64, taper_beta=12.0):
    N_, Nx = grid_shape
    S = subgrid
    chunk = recs.shape[2]
    HP, WP2 = _geometry(N_, Nx, S)
    k = np.arange(S, dtype=np.float64) - S // 2
    F = np.exp(-2j * np.pi * np.outer(k, k) / S) / S
    x_ = k / (S / 2)
    t1 = np.i0(taper_beta * np.sqrt(np.clip(1.0 - x_ * x_, 0.0, 1.0)))
    F = F * (t1 / np.i0(taper_beta))[None, :]
    Hr = np.zeros((S, 2 * S))
    Hi = np.zeros((S, 2 * S))
    Hr[:, 0::2] = F.real.T
    Hr[:, 1::2] = F.imag.T
    Hi[:, 0::2] = -F.imag.T
    Hi[:, 1::2] = F.real.T
    F2 = np.block([[F.real, -F.imag], [F.imag, F.real]])
    if out_hp is not None:
        HP, WP2 = out_hp
    n_pad = recs.shape[0] * chunk
    rs, re = block_run_ranges(starts, ends, n_pad, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.VMEM((2 * S, S), jnp.float32),
            pltpu.VMEM((S, 2 * S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_ab, S=S, theta=theta,
                          theta_x=theta * Nx / N_, chunk=chunk, trig=trig,
                          dots=dots, blockwork=blockwork, fin=fin,
                          use_dma=use_dma, use_seg=use_seg,
                          bare2=bare2, blk_unroll=blk_unroll,
                          nowhen=nowhen, nosmem=nosmem),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=(None if vmem_mb == 0 else pltpu.CompilerParams(
            vmem_limit_bytes=(IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024
                              if vmem_mb is None
                              else vmem_mb * 1024 * 1024),
        )),
    )(starts, ends, y0, x0, ia1, ia2, rs, re, recs,
      scr_re, scr_im, jnp.asarray(F2, jnp.float32),
      jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32))


def main_ab():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64
    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))

    @jax.jit
    def prep():
        return idg_aw_run_records(
            (N, N), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
            jnp.asarray(w), jnp.asarray(vr), jnp.asarray(vi),
            max_runs=max_runs)

    recs, st, en, y0, x0, i1, i2, nd, _ = prep()
    ladder = [
        ("base", dict()),
        ("dotswap", dict(dots="swap")),
        ("nofin", dict(fin=False)),
        ("nodots", dict(dots=False)),
        ("notrig", dict(trig=False)),
        ("emptyblk", dict(blockwork=False, dots=False, fin=False)),
        ("nodma", dict(blockwork=False, dots=False, fin=False,
                       use_dma=False)),
        ("noseg", dict(blockwork=False, dots=False, fin=False,
                       use_seg=False)),
        ("bare", dict(blockwork=False, dots=False, fin=False,
                      use_dma=False, use_seg=False)),
        ("bare2", dict(blockwork=False, dots=False, fin=False,
                       use_dma=False, use_seg=False, bare2=True)),
        ("bare-nowhen", dict(blockwork=False, dots=False, fin=False,
                             use_dma=False, use_seg=False, nowhen=True)),
        ("bare-nosmem", dict(blockwork=False, dots=False, fin=False,
                             use_dma=False, use_seg=False, nosmem=True)),
        ("bare3-carry", dict(blockwork=False, dots=False, fin=False,
                             use_dma=False, use_seg=False,
                             bare2="carry")),
        ("null", dict(blockwork=False, dots=False, fin=False,
                      use_dma=False, use_seg=False, bare2="null")),
        ("null-mr256", dict(blockwork=False, dots=False, fin=False,
                            use_dma=False, use_seg=False, bare2="null",
                            mr=256)),
        ("base-mr8k", dict(mr=8192)),
        ("null-out8", dict(blockwork=False, dots=False, fin=False,
                           use_dma=False, use_seg=False, bare2="null",
                           out_hp=(8, 128))),
        ("null-saltscr", dict(blockwork=False, dots=False, fin=False,
                              use_dma=False, use_seg=False, bare2="null",
                              out_hp=(8, 128), saltscr=True)),
        ("base-saltscr", dict(saltscr=True)),
        ("null-novmem", dict(blockwork=False, dots=False, fin=False,
                             use_dma=False, use_seg=False, bare2="null",
                             out_hp=(8, 128), vmem_mb=0)),
        ("null-vmem64", dict(blockwork=False, dots=False, fin=False,
                             use_dma=False, use_seg=False, bare2="null",
                             out_hp=(8, 128), vmem_mb=64)),
        ("base-vmem64", dict(vmem_mb=64)),
        ("base-ch32", dict(chain=32)),
        ("base-ch64", dict(chain=64)),
        ("null-out1200", dict(blockwork=False, dots=False, fin=False,
                              use_dma=False, use_seg=False, bare2="null",
                              out_hp=(1280, 2688))),
    ]
    preps = {}

    def prep_for(mr):
        if mr not in preps:
            @jax.jit
            def prep(_mr=mr):
                return idg_aw_run_records(
                    (N, N), jnp.asarray(p), jnp.asarray(a1),
                    jnp.asarray(a2), jnp.asarray(w), jnp.asarray(vr),
                    jnp.asarray(vi), max_runs=_mr)
            preps[mr] = prep()
        return preps[mr]

    @jax.jit
    def purejnp(recs, st, en, y0, x0, i1, i2, sre, sim, salt):
        return jnp.sum(jnp.sin(sre + salt))

    recs0 = prep_for(max_runs)
    for ch in (8, 32, 64):
        timeit(f"ab/purejnp-ch{ch}", purejnp,
               (recs0[0], recs0[1], recs0[2], recs0[3], recs0[4],
                recs0[5], recs0[6], sre, sim), n, chain=ch)

    for name, kw in ladder:
        kw = dict(kw)
        chain_k = kw.pop("chain", None)
        raw = kw.pop("rawout", False)
        mr_k = kw.pop("mr", None)
        if mr_k is not None:
            recs, st, en, y0, x0, i1, i2, nd, _ = prep_for(mr_k)
        else:
            recs, st, en, y0, x0, i1, i2, nd, _ = prep_for(max_runs)

        saltscr = kw.pop("saltscr", False)
        twice = kw.pop("twice", False)

        @jax.jit
        def step(recs, st, en, y0, x0, i1, i2, sre, sim, salt,
                 _kw=tuple(sorted(kw.items())), _raw=raw, _ss=saltscr,
                 _twice=twice):
            if _ss:
                sre = sre + salt * 1e-3
            else:
                recs = recs.at[0, 3, 0].add(salt)
            out = grid_ab(recs, st, en, y0, x0, i1, i2, (N, N), sre, sim,
                          theta=THETA, **dict(_kw))
            if _twice:
                out2 = grid_ab(recs, st, en, y0, x0, i1, i2, (N, N),
                               sre + 1.0, sim, theta=THETA, **dict(_kw))
                return jnp.sum(out[0:8, 0:128]) + jnp.sum(out2[0:8, 0:128])
            if _raw:
                return jnp.sum(out[0:64, 0:512])
            return jnp.sum(jnp.abs(out))

        timeit(f"ab/{name}", step,
               (recs, st, en, y0, x0, i1, i2, sre, sim), n,
               chain=chain_k)





def main_degrid():
    print("devices:", jax.devices(), flush=True)
    from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
        idg_aw_degrid_stream)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64
    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))
    gre = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    gim = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    pj, wj = jnp.asarray(p), jnp.asarray(w)
    a1j, a2j = jnp.asarray(a1), jnp.asarray(a2)

    for tier in ("split3", "exact"):
        os.environ["SKA_SDP_TPU_IDG_AW_PRECISION"] = tier

        @jax.jit
        def dg(gre, gim, pj, wj, a1j, a2j, sre, sim, salt):
            vre, vim, nd = idg_aw_degrid_stream(
                (N, N), pj, a1j, a2j, wj, gre + salt, gim, sre, sim,
                theta=THETA, max_runs=max_runs)
            return jnp.sum(jnp.abs(vre)) + jnp.sum(jnp.abs(vim)) + 0.0 * nd

        timeit(f"degrid-stream/{tier}", dg,
               (gre, gim, pj, wj, a1j, a2j, sre, sim), n)


def main_banded():
    """4800^2-class >VMEM grid through the banded streamed path."""
    print("devices:", jax.devices(), flush=True)
    from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
        _banded_geometry, idg_aw_grid_banded)
    from ska_sdp_tpu.kernels.idg_aw_pallas import IDG_AW_VMEM_BUDGET

    theta_lg = 0.016
    N_lg = int(round(theta_lg * LAM))
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl * 2 + n // 128 + 64
    print("geometry:", _banded_geometry(N_lg, N_lg, 64,
                                        IDG_AW_VMEM_BUDGET), flush=True)

    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))

    @jax.jit
    def step(p_j, w_j, a1_j, a2_j, vr_j, vi_j, sre, sim, salt):
        gr, gi, nd = idg_aw_grid_banded(
            (N_lg, N_lg), p_j, a1_j, a2_j, w_j, vr_j, vi_j + salt, sre,
            sim, theta=theta_lg, max_runs=max_runs)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi)) + 0.0 * nd

    timeit("banded 4800^2", step,
           (jnp.asarray(p), jnp.asarray(w), jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(vr), jnp.asarray(vi), sre, sim),
           n)


def main_banded_degrid():
    print("devices:", jax.devices(), flush=True)
    from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
        idg_aw_degrid_banded)

    theta_lg = 0.016
    N_lg = int(round(theta_lg * LAM))
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl * 2 + n // 128 + 64
    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))
    gre = jnp.asarray(rng.standard_normal((N_lg, N_lg)).astype(np.float32))
    gim = jnp.asarray(rng.standard_normal((N_lg, N_lg)).astype(np.float32))

    @jax.jit
    def step(gre, gim, p_j, w_j, a1_j, a2_j, sre, sim, salt):
        vre, vim, nd = idg_aw_degrid_banded(
            (N_lg, N_lg), p_j, a1_j, a2_j, w_j, gre + salt, gim, sre,
            sim, theta=theta_lg, max_runs=max_runs)
        return jnp.sum(jnp.abs(vre)) + jnp.sum(jnp.abs(vim)) + 0.0 * nd

    timeit("banded degrid 4800^2", step,
           (gre, gim, jnp.asarray(p), jnp.asarray(w), jnp.asarray(a1),
            jnp.asarray(a2), sre, sim), n)


if __name__ == "__main__":
    if "ab" in sys.argv[1:]:
        main_ab()
    elif "degrid" in sys.argv[1:]:
        main_degrid()
    elif "banded_degrid" in sys.argv[1:]:
        main_banded_degrid()
    elif "banded" in sys.argv[1:]:
        main_banded()
    else:
        main()
