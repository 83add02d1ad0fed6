"""Real-TPU ablation: WHERE does the IDG-AW kernel's ~5.6 us/block go?

VERDICT r3 #2: sustained IDG-AW is ~45M vis/s = 22 ms/Mvis; at CHUNK=256
that is ~5.6 us per block against ~0.25 us of MXU matmul and ~2.7 us of
estimated sin/cos — the rest is unattributed.  This probe times kernel
variants with pieces removed (results are WRONG for ablated variants;
only the timing is meaningful):

  base      current kernel (sustained from-records path)
  notrig    phases used raw (no sin/cos) — isolates transcendental cost
  nomm      accumulation dots replaced by adds — isolates MXU cost
  emptyblk  block loop reads records, skips all math — loop+DMA floor
  norun     per-run screen/sandwich/placement skipped — run-level cost
  mmfast    accumulation dots at precision DEFAULT (one bf16 pass, not
            6 — Mosaic rejects HIGH)
  split3    all kernel dots as 3 bf16-rate passes on pre-split hi/lo
            planes (~1.5e-5 rel — the aw_fused tier)
  runs8k    max_runs 8192 (vs 24382) — cost of the ~16K EMPTY grid
            programs the static bound forces
  chunk128  CHUNK=128 — halves the run-boundary block waste
  combo     split3 + polyphase + runs8k + chunk128 together
  chunkK    base at CHUNK=K (512, 1024) — bookkeeping amortization

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_idg_aw_ablate.py [modes...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ska_sdp_tpu_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

from ska_sdp_tpu.kernels.idg_aw_pallas import (  # noqa: E402
    IDG_AW_VMEM_BUDGET, _geometry, idg_aw_run_records)
from ska_sdp_tpu.ops.idg_aw import aw_screens_host  # noqa: E402


def _dg3(a, b, dn):
    """dot_general as 3 bf16-rate passes on hi/lo split planes."""
    bf, f32 = jnp.bfloat16, jnp.float32
    ah = a.astype(bf)
    al = (a - ah.astype(f32)).astype(bf)
    bh = b.astype(bf)
    bl = (b - bh.astype(f32)).astype(bf)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dn, preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kernel_ab(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref,
               recs_hbm, sr_ref, si_ref, fre_ref, fim_ref, hr_ref, hi_ref,
               tre_ref, tim_ref, out_ref, recs_v, a_re, a_im, sems, *, S,
               theta, theta_x, chunk, trig, mm, runwork, mm_prec):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    start = starts_ref[r]
    end = ends_ref[r]

    @pl.when(end > start)
    def _():
        a_re[:] = jnp.zeros_like(a_re)
        a_im[:] = jnp.zeros_like(a_im)

        cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
              ).astype(jnp.float32)
        lq2y = (cq * (theta / S)) ** 2
        lq2x = (cq * (theta_x / S)) ** 2
        b_lo = start // chunk
        nblocks = (end - 1) // chunk - b_lo + 1

        def dma(slot, c):
            return pltpu.make_async_copy(
                recs_hbm.at[b_lo + c], recs_v.at[slot], sems.at[slot]
            )

        dma(0, 0).start()

        def chunk_body(c, _):
            slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

            @pl.when(c + 1 < nblocks)
            def _():
                dma(1 - slot, c + 1).start()

            dma(slot, c).wait()
            b = b_lo + c
            lo = jnp.maximum(start - b * chunk, 0)
            hi = jnp.minimum(end - b * chunk, chunk)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            okm = ((lane >= lo) & (lane < hi)).astype(jnp.float32)

            dy = recs_v[slot, 0:1, :]
            dx = recs_v[slot, 1:2, :]
            w = recs_v[slot, 2:3, :]
            vr = recs_v[slot, 3:4, :] * okm
            vi = recs_v[slot, 4:5, :] * okm

            if mm == "empty":
                # consume the data so nothing is DCE'd; no math
                a_re[0:1, :] += (dy + dx + w + vr)[:, :S]
                a_im[0:1, :] += vi[:, :S]
                return 0

            two_pi_s = jnp.float32(2.0 * np.pi / S)
            pi_ = jnp.float32(np.pi)
            if trig == "poly":
                # table + small-range polynomial phase construction:
                # e^{i 2pi cq dy/S} = T[:, round(dy) mod S] * e^{i 2pi cq
                # frac/S} (|frac| <= 0.5 => |x| <= pi/2) and the w chirp
                # phase is < 0.2 rad — both safe for short Taylor series.
                # The integer-shift table lands via a one-hot MXU matmul
                # (exact 0/1 left operand; HIGHEST keeps table f32).
                def sincos_small(x):
                    x2 = x * x
                    s = x * (1.0 + x2 * (jnp.float32(-1 / 6) + x2 * (
                        jnp.float32(1 / 120) + x2 * (
                            jnp.float32(-1 / 5040)
                            + x2 * jnp.float32(1 / 362880)))))
                    c = 1.0 + x2 * (jnp.float32(-0.5) + x2 * (
                        jnp.float32(1 / 24) + x2 * (
                            jnp.float32(-1 / 720)
                            + x2 * jnp.float32(1 / 40320))))
                    return s, c

                jrow = jax.lax.broadcasted_iota(jnp.int32, (S, chunk), 0)
                f32 = jnp.float32
                bf = jnp.bfloat16
                hp = jax.lax.Precision.HIGHEST
                dn_nt = (((1,), (0,)), ((), ()))

                if mm == "split3":
                    # one-hot is EXACT in bf16 ⇒ 2 bf16-rate passes on the
                    # table's hi/lo planes reach ~1e-5 (vs 6 at HIGHEST)
                    def tdot(t, oh):
                        th = t.astype(bf)
                        tl = (t - th.astype(f32)).astype(bf)
                        ohb = oh.astype(bf)

                        def d(x, y):
                            return jax.lax.dot_general(
                                x, y, dn_nt, preferred_element_type=f32,
                                precision=jax.lax.Precision.DEFAULT)

                        return d(th, ohb) + d(tl, ohb)
                else:
                    def tdot(t, oh):
                        return jax.lax.dot_general(
                            t, oh, dn_nt, preferred_element_type=f32,
                            precision=hp)

                def axis_phase(d, lq2):
                    m = jnp.floor(d + 0.5)
                    fr = d - m
                    mi = jnp.mod(m.astype(jnp.int32), S)      # (1, C)
                    oh = (jrow == mi).astype(f32)             # (S, C)
                    t_re = tdot(tre_ref[:], oh)
                    t_im = tdot(tim_ref[:], oh)
                    sf, cf = sincos_small(two_pi_s * cq * fr)
                    sw, cw = sincos_small(-pi_ * lq2 * w)
                    fr_re = cf * cw - sf * sw
                    fr_im = sf * cw + cf * sw
                    return (t_re * fr_re - t_im * fr_im,
                            t_re * fr_im + t_im * fr_re)

                ey_re, ey_im = axis_phase(dy, lq2y)
                ex_re, ex_im = axis_phase(dx, lq2x)
            elif trig:
                ph_y = two_pi_s * cq * dy - pi_ * lq2y * w
                ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
                ey_re = jnp.cos(ph_y)
                ey_im = jnp.sin(ph_y)
                ex_re = jnp.cos(ph_x)
                ex_im = jnp.sin(ph_x)
            else:
                ph_y = two_pi_s * cq * dy - pi_ * lq2y * w
                ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
                ey_re, ey_im = ph_y, ph_y * jnp.float32(0.5)
                ex_re, ex_im = ph_x, ph_x * jnp.float32(0.5)

            u_re = ey_re * vr - ey_im * vi
            u_im = ey_re * vi + ey_im * vr

            if mm == "none":
                a_re[:] += u_re[:, :S] + ex_re[:, :S]
                a_im[:] += u_im[:, :S] + ex_im[:, :S]
                return 0

            dn = (((1,), (1,)), ((), ()))
            if mm == "split3":
                dgen = functools.partial(_dg3, dn=dn)
            else:
                dgen = functools.partial(
                    jax.lax.dot_general, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=mm_prec)
            a_re[:] += dgen(u_re, ex_re) - dgen(u_im, ex_im)
            a_im[:] += dgen(u_re, ex_im) + dgen(u_im, ex_re)
            return 0

        jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

        if not runwork:
            out_ref[pl.ds(0, S), pl.ds(0, S)] += a_re[:]
            out_ref[pl.ds(0, S), pl.ds(S, S)] += a_im[:]
            return

        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2
        p_im = -(r1 * im2 + im1 * r2)
        t_re = a_re[:] * p_re - a_im[:] * p_im
        t_im = a_re[:] * p_im + a_im[:] * p_re

        f32 = jnp.float32
        dn_nt = (((1,), (0,)), ((), ()))
        if mm == "split3":
            dgr = functools.partial(_dg3, dn=dn_nt)
        else:
            dgr = functools.partial(
                jax.lax.dot_general, dimension_numbers=dn_nt,
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
        b_re = dgr(fre_ref[:], t_re) - dgr(fim_ref[:], t_im)
        b_im = dgr(fre_ref[:], t_im) + dgr(fim_ref[:], t_re)
        patch = dgr(b_re, hr_ref[:]) + dgr(b_im, hi_ref[:])

        y0 = y0_ref[r]
        x2 = x0_ref[r] * 2
        rr = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - rr, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, 8), (0, 128)))
        patch = pltpu.roll(pltpu.roll(patch, rr, 0), rem, 1)
        out_ref[pl.ds(y0a, S + 8), pl.ds(x2a, 2 * S + 128)] += patch


def grid_from_records_ab(recs, starts, ends, y0, x0, ia1, ia2, grid_shape,
                         scr_re, scr_im, *, theta, chunk, trig=True,
                         mm="mxu", runwork=True,
                         mm_prec=jax.lax.Precision.HIGHEST, subgrid=64,
                         taper_beta=12.0, interpret=False):
    Ng, Nx = grid_shape
    S = subgrid
    HP, WP2 = _geometry(Ng, Nx, S)

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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(int(starts.shape[0]),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_fn = pl.pallas_call(
        functools.partial(_kernel_ab, S=S, theta=theta,
                          theta_x=theta * Nx / Ng, chunk=chunk, trig=trig,
                          mm=mm, runwork=runwork, mm_prec=mm_prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    # integer-shift table: T[q, m] = e^{2pi i cq_q m / S}
    Tm = np.exp(2j * np.pi * np.outer(k, np.arange(S)) / S)
    out = out_fn(starts, ends, y0, x0, ia1, ia2, recs,
                 scr_re, scr_im,
                 jnp.asarray(F.real, jnp.float32),
                 jnp.asarray(F.imag, jnp.float32),
                 jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32),
                 jnp.asarray(Tm.real, jnp.float32),
                 jnp.asarray(Tm.imag, jnp.float32))
    return out


def check_polyphase():
    """Interpret-mode (CPU) parity: polyphase vs base on a small problem."""
    jax.config.update("jax_platforms", "cpu")
    from ska_sdp_tpu.ops.idg_aw import aw_screens_host

    Ns = 256
    rng = np.random.default_rng(3)
    b = 4096
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    nbl = len(pairs)
    ft = np.linspace(0, 1, b // nbl)
    rows = []
    for bi, (i, j) in enumerate(pairs):
        u0 = rng.uniform(-0.3, 0.3, 2)
        du = rng.uniform(-10 / Ns, 10 / Ns, 2)
        for t in ft:
            rows.append((u0[0] + du[0] * t, u0[1] + du[1] * t,
                         rng.uniform(-200, 200), i, j))
    arr = np.asarray(rows)
    n = arr.shape[0]
    p = np.zeros((n, 3), np.float32)
    p[:, :2] = arr[:, :2]
    w = arr[:, 2].astype(np.float32)
    a1 = arr[:, 3].astype(np.int32)
    a2 = arr[:, 4].astype(np.int32)
    vr = rng.standard_normal(n).astype(np.float32)
    vi = rng.standard_normal(n).astype(np.float32)
    ak = np.zeros((5, 15, 15), np.complex64)
    ak[:, 7, 7] = 1.0
    scr = aw_screens_host(ak, 64)
    mr = 8 * nbl + n // 128 + 64
    recs, st, en, y0, x0, i1, i2, nd, _ = idg_aw_run_records(
        (Ns, Ns), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
        jnp.asarray(w), jnp.asarray(vr), jnp.asarray(vi), max_runs=mr)
    outs = {}
    for name, tr, mm in (("base", True, "mxu"), ("poly", "poly", "mxu"),
                         ("combo", "poly", "split3")):
        outs[name] = np.asarray(grid_from_records_ab(
            recs, st, en, y0, x0, i1, i2, (Ns, Ns),
            jnp.asarray(scr.real, jnp.float32),
            jnp.asarray(scr.imag, jnp.float32),
            theta=0.05, chunk=256, trig=tr, mm=mm, interpret=True))
    for name in ("poly", "combo"):
        d = (np.linalg.norm(outs[name] - outs["base"])
             / np.linalg.norm(outs["base"]))
        print(f"{name} vs base rel err: {d:.3e} (dropped {int(nd)})")
        assert d < (1e-5 if name == "poly" else 1e-4), (name, d)


def main():
    modes = sys.argv[1:] or ["base", "notrig", "nomm", "emptyblk",
                             "norun", "mmfast", "chunk512", "chunk1024",
                             "polyphase"]
    if modes == ["check"]:
        check_polyphase()
        return
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64
    print(f"n={n} nbl={nbl} max_runs={max_runs}", flush=True)

    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))

    for mode in modes:
        chunk = 256
        mr = max_runs
        kw = dict(trig=True, mm="mxu", runwork=True,
                  mm_prec=jax.lax.Precision.HIGHEST)
        if mode == "notrig":
            kw["trig"] = False
        elif mode == "polyphase":
            kw["trig"] = "poly"
        elif mode == "nomm":
            kw["mm"] = "none"
        elif mode == "emptyblk":
            kw["mm"] = "empty"
        elif mode == "norun":
            kw["runwork"] = False
        elif mode == "mmfast":
            kw["mm_prec"] = jax.lax.Precision.DEFAULT
        elif mode == "split3":
            kw["mm"] = "split3"
        elif mode == "runs8k":
            mr = 8192
        elif mode == "chunk128":
            chunk = 128
        elif mode == "combo":
            kw["mm"] = "split3"
            kw["trig"] = "poly"
            mr = 8192
            chunk = 128
        elif mode.startswith("chunk"):
            chunk = int(mode[5:])

        @jax.jit
        def prep(p_j, w_j, a1_j, a2_j, vr_j, vi_j, _chunk=chunk, _mr=mr):
            return idg_aw_run_records(
                (N, N), p_j, a1_j, a2_j, w_j, vr_j, vi_j,
                max_runs=_mr, chunk=_chunk,
            )

        recs, st, en, y0, x0, i1, i2, nd, _geo = prep(
            jnp.asarray(p), jnp.asarray(w), jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(vr), jnp.asarray(vi))
        st_h, en_h = np.asarray(st), np.asarray(en)
        act = en_h > st_h
        nruns = int(np.sum(act))
        nbp = int(np.sum(((en_h - 1) // chunk - st_h // chunk + 1)[act]))
        print(f"  {mode}: runs {nruns} dropped {int(nd)} "
              f"block-processings {nbp} (min {recs.shape[0]})", flush=True)

        @jax.jit
        def sus(recs, st, en, y0, x0, i1, i2, sre, sim, salt,
                _chunk=chunk, _kw=tuple(sorted(kw.items()))):
            recs = recs.at[0, 3, 0].add(salt)
            out = grid_from_records_ab(
                recs, st, en, y0, x0, i1, i2, (N, N), sre, sim,
                theta=THETA, chunk=_chunk, **dict(_kw))
            return jnp.sum(jnp.abs(out))

        @jax.jit
        def chained(salt0, *a):
            def body(i, acc):
                return acc + sus(*a, salt0 + 1e-6 * i.astype(jnp.float32))
            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        a = (recs, st, en, y0, x0, i1, i2, sre, sim)
        t0 = time.perf_counter()
        c0 = float(chained(jnp.float32(0.0), *a))
        tc = time.perf_counter() - t0
        assert np.isfinite(c0)
        ts = []
        for i in range(STEPS):
            t0 = time.perf_counter()
            float(chained(jnp.float32(1e-3 * (i + 1)), *a))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2] / CHAIN
        print(f"{mode:10s} compile {tc:6.1f}s  {dt*1e3:7.2f} ms/step  "
              f"{n/dt/1e6:6.1f} M vis/s", flush=True)


if __name__ == "__main__":
    main()
