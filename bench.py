"""Headline benchmark: visibilities gridded/sec, SKA1_Low w-projection.

Measures the hot kernels of the framework at the SKA1_Low scale
(BASELINE.md configs) on whatever accelerator JAX selects (the real TPU
chip under the driver; CPU as fallback):

  1. (headline) w-projection scatter — kernel-convolved scatter of complex
     visibilities onto the 2400² uv-grid with an oversampled kernel bank.
  2. degridding — the adjoint gather (grid → vis predict).
  3. fused AW-projection — per-visibility on-the-fly A1⊛A2⊛W kernels.
  4. full imaging step — scatter + hermitian completion + centered iFFT
     (the whole device program of a production imaging iteration).

Device-boundary note: the TPU PJRT path here does not support complex
transfers, so complex operands enter as (re, im) float32 pairs and each
step returns a real checksum that forces full execution (see utils/cplx.py).

The reference publishes no numbers (BASELINE.md); the driver's north-star is
"≥5× H100-class visibilities/sec".  ``vs_baseline`` is therefore reported
against H100_CLASS_VIS_PER_SEC below: an H100-class estimate for this exact
kernel (qpx=8, s=15 ⇒ 225 complex64 MACs + 1 gather + 1 scatter-add per
visibility).  A tuned CUDA gridder of this shape is scatter-bound; published
GPU gridding work (Romein-style thread-coarsened gridders, PAPERS.md) lands
in the ~1-3 Gvis/s range on H100-class parts for 15² kernels; we use 2e9 as
the bar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"extra_metrics": [...]} — the extra metrics carry the non-headline kernels
so regressions there are driver-visible (VERDICT r1 #7).
"""

from __future__ import annotations

import json
import time

import numpy as np

H100_CLASS_VIS_PER_SEC = 2.0e9

# --- v5e roofline constants (public spec) -------------------------------
# MXU peak 197 TFLOP/s bf16; f32 dots at precision=HIGHEST run as 6 bf16
# passes => ~33 TFLOP/s of useful f32 flops.  VPU: 4 ALUs x (8,128) lanes
# x 0.94 GHz ~= 3.85 TFLOP/s f32.  HBM ~819 GB/s.
MXU_F32_HI = 197e12 / 6
VPU_F32 = 3.85e12
HBM_BPS = 819e9

# Per-path work model (flops of USEFUL f32 work per visibility + the
# dominated unit); BENCH.md "Roofline model" explains the derivation.
# wproj family: 225 complex MACs (15^2 taps) = 1800 flops on the VPU,
# plus a (24,384) f32 VMEM read-modify-write (73.7 KB) per record — the
# measured design ceiling (25-40M vis/s) is that VMEM RMW, not flops.
# IDG family: 4 (S,C)x(C,S) accumulation dots per block => 4*S^2 MACs =
# 32768 flops/vis at S=64 on the MXU, plus 4*S=256 sin/cos per vis on
# the VPU (the current wall — VERDICT r3 #2).
# AW fused (split3): per-record A1~*A2~*W spectral sandwich, ~6 dense
# (15,15)x(15,15) matmuls => ~162 Kflops/vis on the MXU.
_WORK_MODEL = {
    "wproj": (1800.0, VPU_F32, "VPU f32"),
    "idg": (4 * 64 * 64 * 2.0, MXU_F32_HI, "MXU f32-HIGHEST"),
    "aw_fused": (6 * 15**3 * 8.0, MXU_F32_HI, "MXU f32-HIGHEST"),
}


def _util(rate: float, model: str) -> dict:
    """Utilization block for a measured vis/s rate (VERDICT r3 #3)."""
    flops, peak, unit = _WORK_MODEL[model]
    return {
        "flops_per_vis": flops,
        "util_pct_of_" + unit.replace(" ", "_").replace("-", "_"):
            round(100.0 * rate * flops / peak, 3),
    }

# SKA1_Low scale (SURVEY §2 C18, §5): 2400² grid, qpx=8, 15² kernels.
THETA, LAM = 0.008, 300000
NW, QPX, S = 32, 8, 15
NANT = 64
N_VIS = 1 << 20           # per timed step (headline / degrid / full step)
N_VIS_AW = 1 << 19        # AW fused
STEPS = 5                 # outer reps (median taken — tunnel spikes)
# Device steps chained per dispatch.  Round-4 measurement: the ~27-34 ms
# tunnel dispatch floor divides by the chain length, so CHAIN=8 still
# left ~4.2 ms/step of DISPATCH inside every round-3 number (measured: a
# trivial chained jnp step costs 4.05/1.01/0.52 ms at chain 8/32/64 —
# pure floor/chain).  At 32 the residual is ~1 ms/step (<10% of the
# fastest kernels); production pipelines amortize dispatch identically.
CHAIN = 32


def _progress(msg):
    """Stderr progress stamps — through the remote-TPU tunnel a cold
    compile can take minutes; silence is indistinguishable from a hang
    without these."""
    import sys as _s
    import time as _t

    print(f"[bench {_t.strftime('%H:%M:%S')}] {msg}", file=_s.stderr,
          flush=True)


def _rate(step, args, n, k=STEPS, chain=CHAIN):
    """Per-step device throughput of a jitted step.

    Round-3 measurement (BENCH.md): every host dispatch through the
    remote-TPU tunnel pays a ~27 ms round-trip REGARDLESS of the program —
    timing single steps mis-charges that latency as kernel time (it
    inflated every round-1/2 number and invented the round-2 "sort wall").
    The fix: chain ``chain`` data-dependent steps inside ONE jitted
    program (each with a distinct salt, so nothing collapses by CSE and
    the tunnel cannot serve cached results) and divide by the chain
    length — the same device-throughput convention the published GPU
    gridder numbers (the 2 Gvis/s bar) use.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(salt0, *args):
        def body(i, acc):
            return acc + step(*args, salt0 + 1e-6 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    chk = float(chained(jnp.float32(0.0), *args))   # compile + warmup
    assert np.isfinite(chk) and chk > 0
    ts = []
    for i in range(k):
        t0 = time.perf_counter()
        chk = float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(chk) and chk > 0
    dt = sorted(ts)[len(ts) // 2] / chain
    return n / dt


def main() -> None:
    import os

    # persistent compilation cache: bench compiles ~6 jitted programs
    # (30-90 s each through the remote-TPU tunnel); reruns become fast
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/ska_sdp_tpu_jax_cache")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ska_sdp_tpu.kernels import aw_gridder, wproj_degridder, wproj_gridder
    from ska_sdp_tpu.ops import (
        find_closest,
        ifft_centered,
        make_grid_hermitian,
        mirror_uvw,
    )

    n_grid = int(round(THETA * LAM))
    rng = np.random.default_rng(0)

    # Synthetic kernel bank directly (HDF5 ingest is not part of the timed
    # region; real banks load once per run).
    bank_re = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    bank_im = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    centers = jnp.asarray(np.linspace(-4000, 4000, NW), jnp.float32)

    uvw = rng.uniform(-0.42 * LAM, 0.42 * LAM, size=(N_VIS, 3))
    uvw[:, 2] = rng.uniform(-3800, 3800, size=N_VIS)
    uvw = jnp.asarray(uvw, jnp.float32)
    vis_re = jnp.asarray(rng.standard_normal(N_VIS).astype(np.float32))
    vis_im = jnp.asarray(rng.standard_normal(N_VIS).astype(np.float32))

    def _prep(uvw_l, vis_c):
        uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
        wbin = find_closest(centers, uvw1[:, 2])
        return uvw1, vis1, wbin

    # 1. headline: w-projection scatter
    @jax.jit
    def grid_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
        bank_c = jax.lax.complex(bank_re, bank_im)
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1, wbin = _prep(uvw_l, vis_c)
        g = wproj_gridder(bank_c, (n_grid, n_grid), uvw1 / LAM, wbin, vis1)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    args = (bank_re, bank_im, uvw, vis_re, vis_im)
    _progress("metric 1/10: w-proj headline")
    wproj_rate = _rate(grid_step, args, N_VIS)

    def _best_effort(name, fn, *a, **kw):
        """Extra metrics never take the headline down with them: a
        Mosaic/compile regression in one kernel reports 0 for that metric
        instead of killing the whole bench run."""
        import sys as _sys
        import traceback as _tb

        try:
            return fn(*a, **kw)
        except Exception:
            print(f"bench metric {name!r} failed:", file=_sys.stderr)
            _tb.print_exc(limit=3, file=_sys.stderr)
            return 0.0

    # 2. degridding (adjoint gather, grid → vis)
    g_re = jnp.asarray(rng.standard_normal((n_grid, n_grid)).astype(np.float32))
    g_im = jnp.asarray(rng.standard_normal((n_grid, n_grid)).astype(np.float32))

    @jax.jit
    def degrid_step(bank_re, bank_im, g_re, g_im, uvw_l, salt):
        bank_c = jax.lax.complex(bank_re, bank_im)
        grid_c = jax.lax.complex(g_re + salt, g_im)
        uvw1, _, wbin = _prep(uvw_l, jnp.zeros(uvw_l.shape[0], jnp.complex64))
        v = wproj_degridder(bank_c, grid_c, uvw1 / LAM, wbin)
        return jnp.sum(jnp.abs(jnp.real(v))) + jnp.sum(jnp.abs(jnp.imag(v)))

    _progress("metric 2/10: degrid")
    degrid_rate = _best_effort(
        "degrid", _rate, degrid_step,
        (bank_re, bank_im, g_re, g_im, uvw), N_VIS, k=3,
    )

    # 3. fused AW-projection (on-the-fly A1⊛A2⊛W)
    ak_re = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
    ak_im = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
    a1 = jnp.asarray(rng.integers(0, NANT, N_VIS_AW).astype(np.int32))
    a2 = jnp.asarray(rng.integers(0, NANT, N_VIS_AW).astype(np.int32))

    @jax.jit
    def aw_step(bank_re, bank_im, ak_re, ak_im, uvw_l, a1, a2,
                vis_re, vis_im, salt):
        wk = jax.lax.complex(bank_re, bank_im)
        ak = jax.lax.complex(ak_re, ak_im)
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1, wbin = _prep(uvw_l, vis_c)
        g = aw_gridder(wk, ak, jnp.zeros((n_grid, n_grid), jnp.complex64),
                       uvw1 / LAM, wbin, a1, a2, vis1)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    _progress("metric 3/10: fused AW")
    aw_rate = _best_effort(
        "aw", _rate, aw_step,
        (bank_re, bank_im, ak_re, ak_im, uvw[:N_VIS_AW], a1, a2,
         vis_re[:N_VIS_AW], vis_im[:N_VIS_AW]),
        N_VIS_AW, k=3,
    )

    # 3b. image-domain gridding (MXU-native w-projection mode): same
    # workload, analytic screens, continuous w — accuracy ≥ the bank path
    from ska_sdp_tpu.kernels import idg_gridder

    @jax.jit
    def idg_step(uvw_l, vis_re, vis_im, salt):
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
        g = idg_gridder((n_grid, n_grid), uvw1 / LAM, uvw1[:, 2], vis1,
                        theta=THETA)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    _progress("metric 4/10: IDG")
    idg_rate = _best_effort(
        "idg", _rate, idg_step, (uvw, vis_re, vis_im), N_VIS, k=3)

    # 3c. IDG degridding / predict (exact continuous-w adjoint)
    from ska_sdp_tpu.kernels import idg_degridder

    @jax.jit
    def idg_degrid_step(g_re, g_im, uvw_l, salt):
        grid_c = jax.lax.complex(g_re + salt, g_im)
        uvw1, _, _ = _prep(uvw_l, jnp.zeros(uvw_l.shape[0], jnp.complex64))
        v = idg_degridder((n_grid, n_grid), uvw1 / LAM, uvw1[:, 2], grid_c,
                          theta=THETA)
        return jnp.sum(jnp.abs(jnp.real(v))) + jnp.sum(jnp.abs(jnp.imag(v)))

    _progress("metric 5/10: IDG degrid")
    idg_degrid_rate = _best_effort(
        "idg_degrid", _rate, idg_degrid_step, (g_re, g_im, uvw), N_VIS, k=3)

    # 3d. IDG accuracy vs an independent direct-DFT truth (small problem;
    # the number the 'exact continuous-w placement' claim rests on)
    def _idg_accuracy():
        from ska_sdp_tpu.kernels import idg_gridder as _idg
        from ska_sdp_tpu.ops import ifft_centered as _ifft
        from ska_sdp_tpu.ops.idg import kaiser_taper, taper_fine

        Na, Sa, th = 256, 64, 0.05
        rng2 = np.random.default_rng(7)
        b = 300
        pa = rng2.uniform(-0.42, 0.42, (b, 3)).astype(np.float32)
        wa = rng2.uniform(-250, 250, b).astype(np.float32)
        va = (rng2.standard_normal(b)
              + 1j * rng2.standard_normal(b)).astype(np.complex64)

        @jax.jit
        def acc_step(p_j, w_j, vr, vi):
            g = _idg((Na, Na), p_j, w_j, jax.lax.complex(vr, vi), theta=th)
            c = _ifft(g)
            tf = taper_fine(Na, Sa, kaiser_taper(Sa, 12.0)).astype(jnp.float32)
            t2 = tf[:, None] * tf[None, :]
            return jnp.real(c) / t2, jnp.imag(c) / t2

        ire, iim = acc_step(
            jnp.asarray(pa), jnp.asarray(wa),
            jnp.asarray(va.real), jnp.asarray(va.imag))
        img = np.asarray(ire) + 1j * np.asarray(iim)
        # numpy direct-DFT truth
        xf = (np.arange(Na) - Na // 2) / Na
        l = xf * th
        L, M = np.meshgrid(l, l, indexing="xy")
        n_lm = 1.0 - np.sqrt(1.0 - L**2 - M**2)
        ref = np.zeros((Na, Na), np.complex128)
        for i in range(b):
            ey = np.exp(2j * np.pi * pa[i, 1] * Na * xf)
            ex = np.exp(2j * np.pi * pa[i, 0] * Na * xf)
            ref += va[i] * np.outer(ey, ex) * np.exp(-2j * np.pi * wa[i] * n_lm)
        ref = ref / (Na * Na)
        c = Na // 8                                  # central 75% (documented
        d = np.linalg.norm((img - ref)[c:-c, c:-c])  # usable-FOV region)
        return float(d / np.linalg.norm(ref[c:-c, c:-c]))

    _progress("metric 6/10: IDG accuracy")
    idg_acc = _best_effort("idg_accuracy", _idg_accuracy)

    # 3e. IDG-AW (image-domain A-screens on pair-chunked subgrids): the
    # same AW workload on BASELINE-TRACK data — the layout real
    # interferometer data arrives in and the one IDG-AW's pair-chunking
    # is designed for (random-uv AW is metric 3's fused kernel's job)
    def _idg_aw():
        from ska_sdp_tpu.kernels import idg_aw_gridder
        from ska_sdp_tpu.ops.idg_aw import aw_screens_host

        rngT = np.random.default_rng(11)
        ii, jj = np.triu_indices(NANT, k=1)
        nbl = ii.shape[0]
        ntime, nchan = 65, 8                     # nbl*65*8 = 1.048M records
        u0 = rngT.uniform(-0.40, 0.40, (nbl, 2))
        du = rngT.uniform(-30.0 / n_grid, 30.0 / n_grid, (nbl, 2))
        w0 = rngT.uniform(-3800.0, 3800.0, nbl)
        dw = rngT.uniform(-100.0, 100.0, nbl)
        ft = (np.arange(ntime) / ntime)[:, None, None]
        fs = (1.0 + 0.0005 * np.arange(nchan))[None, None, :]
        ut = (u0[None, :, 0:1] + du[None, :, 0:1] * ft) * fs
        vt = (u0[None, :, 1:2] + du[None, :, 1:2] * ft) * fs
        wt = (w0[None, :, None] + dw[None, :, None] * ft) * np.ones_like(fs)
        nT = ut.size
        pT = np.zeros((nT, 3), np.float32)
        pT[:, 0] = ut.ravel()
        pT[:, 1] = vt.ravel()
        a1T = np.broadcast_to(ii[None, :, None], ut.shape).ravel()
        a2T = np.broadcast_to(jj[None, :, None], ut.shape).ravel()
        scr = aw_screens_host(np.asarray(ak_re) + 1j * np.asarray(ak_im), 64)
        # (pair, uv-tile) run bound: tracks split at tile crossings
        max_runs = 8 * nbl + nT // 128 + 64

        @jax.jit
        def aw_idg_step(p_j, w_j, a1_j, a2_j, sre, sim, vr, vi, salt):
            guv, nd = idg_aw_gridder(
                (n_grid, n_grid), p_j, a1_j, a2_j, w_j,
                jax.lax.complex(vr, vi + salt), jax.lax.complex(sre, sim),
                theta=THETA, max_runs=max_runs,
            )
            return (jnp.sum(jnp.abs(jnp.real(guv)))
                    + jnp.sum(jnp.abs(jnp.imag(guv))) + 0.0 * nd)

        argsT = (
            jnp.asarray(pT), jnp.asarray(wt.ravel(), jnp.float32),
            jnp.asarray(a1T, jnp.int32), jnp.asarray(a2T, jnp.int32),
            jnp.asarray(scr.real, jnp.float32),
            jnp.asarray(scr.imag, jnp.float32),
            jnp.asarray(rng.standard_normal(nT).astype(np.float32)),
            jnp.asarray(rng.standard_normal(nT).astype(np.float32)),
        )
        rate = _rate(aw_idg_step, argsT, nT, k=3)

        # ordered single-shot: a pair-major SINGLE-channel track stream
        # ([nbl, ntime] — one transpose of the file raster) replaces the
        # 7-operand comparison sort (VERDICT r3 #4, ordered=True prep).
        # A multi-CHANNEL interleaved raster must NOT take this path:
        # pair-major transposing [ntime, nbl, nch] fragments each track
        # into ~nch·tiles runs (measured 33K runs > max_runs at this
        # shape — 27% of the records silently overflow-dropped); the
        # spectral driver bins once via idg_aw_run_records_multi instead.
        # Drops poison the checksum here so a regression cannot hide.
        def _ordered():
            ntime1 = nT // nbl                     # 520: same n, 1 chan
            ft1 = (np.arange(ntime1) / ntime1)[:, None]
            u1 = u0[None, :, 0] + du[None, :, 0] * ft1       # [ntime1,nbl]
            v1 = u0[None, :, 1] + du[None, :, 1] * ft1
            w1 = w0[None, :] + dw[None, :] * ft1
            n1 = u1.size
            # pair-major [nbl, ntime1]: each pair's track is contiguous
            p1 = np.zeros((n1, 3), np.float32)
            p1[:, 0] = u1.T.ravel()
            p1[:, 1] = v1.T.ravel()
            a1o = np.repeat(ii, ntime1).astype(np.int32)
            a2o = np.repeat(jj, ntime1).astype(np.int32)
            w1r = w1.T.ravel().astype(np.float32)
            vr1 = rng.standard_normal(n1).astype(np.float32)
            vi1 = rng.standard_normal(n1).astype(np.float32)

            @jax.jit
            def aw_idg_ordered_step(p_j, w_j, a1_j, a2_j, sre, sim, vr,
                                    vi, salt):
                guv, nd = idg_aw_gridder(
                    (n_grid, n_grid), p_j, a1_j, a2_j, w_j,
                    jax.lax.complex(vr, vi + salt),
                    jax.lax.complex(sre, sim),
                    theta=THETA, max_runs=max_runs, ordered=True,
                )
                return (jnp.sum(jnp.abs(jnp.real(guv)))
                        + jnp.sum(jnp.abs(jnp.imag(guv)))
                        + jnp.where(nd > 0, jnp.float32(jnp.nan), 0.0))

            args1 = (jnp.asarray(p1), jnp.asarray(w1r),
                     jnp.asarray(a1o), jnp.asarray(a2o),
                     argsT[4], argsT[5], jnp.asarray(vr1),
                     jnp.asarray(vi1))
            return _rate(aw_idg_ordered_step, args1, n1, k=3)

        rate_ordered = _best_effort("aw_idg_ordered", _ordered)

        # sustained: the run sort amortized across a channel group (the
        # from-records split — channels swap only the vis record rows)
        def _sustained():
            from ska_sdp_tpu.kernels.idg_aw_pallas import (
                idg_aw_grid_from_records, idg_aw_run_records,
            )

            @jax.jit
            def _prep(p_j, w_j, a1_j, a2_j, vr, vi):
                return idg_aw_run_records(
                    (n_grid, n_grid), p_j, a1_j, a2_j, w_j, vr, vi,
                    max_runs=max_runs,
                )

            recs, st, en, y0c, x0c, i1c, i2c, _nd, _geo = _prep(
                argsT[0], argsT[1], argsT[2], argsT[3], argsT[6], argsT[7])

            @jax.jit
            def sus_step(recs, st, en, y0c, x0c, i1c, i2c, sre, sim, salt):
                recs = recs.at[0, 3, 0].add(salt)
                gr, gi = idg_aw_grid_from_records(
                    recs, st, en, y0c, x0c, i1c, i2c, (n_grid, n_grid),
                    sre, sim, theta=THETA,
                )
                return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

            return _rate(
                sus_step,
                (recs, st, en, y0c, x0c, i1c, i2c, argsT[4], argsT[5]),
                nT, k=3,
            )

        # degridding (model predict with A-terms) through the streamed
        # adjoint kernel
        def _degrid():
            from ska_sdp_tpu.kernels import idg_aw_degridder

            g_re = jnp.asarray(
                rng.standard_normal((n_grid, n_grid)).astype(np.float32))
            g_im = jnp.asarray(
                rng.standard_normal((n_grid, n_grid)).astype(np.float32))

            @jax.jit
            def dg_step(g_re, g_im, p_j, w_j, a1_j, a2_j, sre, sim, salt):
                v, nd = idg_aw_degridder(
                    (n_grid, n_grid), p_j, a1_j, a2_j, w_j,
                    jax.lax.complex(g_re + salt, g_im),
                    jax.lax.complex(sre, sim),
                    theta=THETA, max_runs=max_runs,
                )
                return (jnp.sum(jnp.abs(jnp.real(v)))
                        + jnp.sum(jnp.abs(jnp.imag(v))) + 0.0 * nd)

            return _rate(
                dg_step,
                (g_re, g_im, argsT[0], argsT[1], argsT[2], argsT[3],
                 argsT[4], argsT[5]),
                nT, k=3,
            )

        return (rate, rate_ordered,
                _best_effort("aw_idg_sustained", _sustained),
                _best_effort("aw_idg_degrid", _degrid))

    _progress("metric 7/10: IDG-AW single-shot + sustained + degrid")
    aw_idg_rate, aw_idg_ord, aw_idg_sus, aw_idg_dg = (
        _best_effort("aw_idg", _idg_aw) or (0.0, 0.0, 0.0, 0.0))

    # 4. full imaging step: scatter + hermitian + centered iFFT
    @jax.jit
    def full_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
        bank_c = jax.lax.complex(bank_re, bank_im)
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1, wbin = _prep(uvw_l, vis_c)
        g = wproj_gridder(bank_c, (n_grid, n_grid), uvw1 / LAM, wbin, vis1)
        img = jnp.real(ifft_centered(make_grid_hermitian(g)))
        return jnp.sum(jnp.abs(img))

    _progress("metric 8/10: full imaging step")
    full_rate = _best_effort("full", _rate, full_step, args, N_VIS, k=3)

    # 5. sustained rates with binning amortized: real pipelines grid many
    # channels per uvw binning (the record sort is ~30 ms/Mvis, a pure
    # comparison-depth wall); published GPU gridder numbers (the 2 Gvis/s
    # bar) also presort.  Records are pre-binned once; each step carries
    # fresh per-channel vis in the record stream (dense row update).
    sus_idg = None
    try:
        from ska_sdp_tpu.kernels.idg_pallas import (
            idg_bin_records, idg_grid_from_records,
        )

        # complex dtypes must not cross the device boundary (axon PJRT):
        # all prep runs inside jit on real planes
        @jax.jit
        def _iprep(uvw, vr, vi):
            uvw1, vis1 = mirror_uvw(uvw, jax.lax.complex(vr, vi))
            return idg_bin_records(
                (n_grid, n_grid), uvw1 / LAM, uvw1[:, 2],
                jnp.real(vis1), jnp.imag(vis1),
            )

        i_recs, i_starts = _iprep(uvw, vis_re, vis_im)

        @jax.jit
        def sus_idg_step(recs, starts, salt):
            # 1-element salt: defeats caching without paying a strided
            # sub-128-minor dense update (~5-10 ms of real device time)
            recs = recs.at[0, 3, 0].add(salt)
            gr, gi = idg_grid_from_records(
                recs, starts, (n_grid, n_grid), theta=THETA
            )
            return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

        _progress("extra: sustained IDG")
        sus_idg = _rate(sus_idg_step, (i_recs, i_starts), N_VIS, k=3)
    except Exception as e:  # sustained metrics are best-effort extras
        import sys

        print(f"sustained metrics skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # 6. END-TO-END multi-channel imaging through the DRIVER (VERDICT r3
    # #1: the sustained rates must be a pipeline capability, not a
    # from-records microbench).  Wall-clock of the full spectral driver
    # (HDF5 ingest -> channel-group planning -> one binning per group ->
    # per-channel kernel passes -> per-channel iFFT -> cube) divided by
    # nch * n records.  First call pays compile; second is timed.
    def _e2e_multichannel():
        import tempfile

        from ska_sdp_tpu.config import GridParams
        from ska_sdp_tpu.config import ImagingConfig as _ICfg
        from ska_sdp_tpu.io.synthetic import (SyntheticConfig,
                                              simulate_observation,
                                              write_vis_file)
        from ska_sdp_tpu.models import spectral

        nchan = 8
        d = tempfile.mkdtemp(prefix="ska_bench_mc_")
        icfg = _ICfg(grid=GridParams(theta=THETA, lam=LAM))

        def make_file(seed):
            cfg = SyntheticConfig(theta=THETA, lam=LAM, nant=NANT,
                                  ntime=520, nchan=nchan, nsources=3,
                                  seed=seed)
            obs = simulate_observation(cfg)
            vpath = os.path.join(d, f"vis_{seed}.h5")
            write_vis_file(vpath, obs)
            return vpath, obs["n"]

        from ska_sdp_tpu.utils.timing import PhaseTimer

        def run(vpath):
            timer = PhaseTimer(enabled=False)
            t0 = time.perf_counter()
            mx, _img, cube = spectral.idg_gridding_multi(
                vpath, nchan, config=icfg, timer=timer)
            dt = time.perf_counter() - t0
            assert np.isfinite(mx) and cube.shape[0] == nchan
            return dt, timer.times.get("compile+grid+fft", dt)

        # warmup compiles on one file; every TIMED run uses a FRESH file
        # — the dev harness's tunnel serves repeated identical
        # executions from a cache, so re-running the same data measures
        # nothing (the same discovery that forces salted chains).  The
        # dev tunnel's host<->device bandwidth measures ~5-40 MB/s, so
        # the ~250 MB of vis h2d + cube d2h DOMINATE wall-clock here (a
        # PCIe-local host moves the same volumes in <100 ms); the
        # driver's own "compile+grid+fft" phase (dispatch -> cube
        # resident on device) carries the compute-side rate.
        vp0, n_rec = make_file(5)
        run(vp0)
        (dt, t_dev) = min(run(make_file(6)[0]), run(make_file(7)[0]))
        n_tot = nchan * n_rec
        res = {
            "wall": n_tot / dt,
            "dev": n_tot / max(t_dev, 1e-3),
            "note": f"device phase {t_dev:.2f}s of {dt:.2f}s wall",
        }

        # long-observation shape: 4x the records per channel — the
        # per-group fixed costs (sort, weights histogram, per-channel
        # FFTs) amortize toward the sustained kernel rate
        def make_long(seed):
            cfg = SyntheticConfig(theta=THETA, lam=LAM, nant=NANT,
                                  ntime=2080, nchan=nchan, nsources=3,
                                  seed=seed)
            obs = simulate_observation(cfg)
            vpath = os.path.join(d, f"vis_long_{seed}.h5")
            write_vis_file(vpath, obs)
            return vpath, obs["n"]

        try:
            vpl, n_rec_l = make_long(5)
            run(vpl)
            (dt_l, t_dev_l) = min(run(make_long(6)[0]),
                                  run(make_long(7)[0]))
            n_tot_l = nchan * n_rec_l
            res["dev_long"] = n_tot_l / max(t_dev_l, 1e-3)
            res["note_long"] = (f"{n_rec_l / 1e6:.1f}M records x "
                                f"{nchan}ch; device phase {t_dev_l:.2f}s"
                                f" of {dt_l:.2f}s wall")
        except Exception as e:
            import sys as _s

            print(f"long-shape e2e skipped: {e}", file=_s.stderr)
            res["dev_long"] = 0.0
            res["note_long"] = "skipped"
        return res

    _progress("metric 9/10: end-to-end multi-channel driver")
    _e2e = (_best_effort("e2e_multichannel", _e2e_multichannel)
            or {"wall": 0.0, "dev": 0.0, "note": "failed",
                "dev_long": 0.0, "note_long": "failed"})
    e2e_mc_rate = _e2e["wall"]
    e2e_mc_ex = _e2e["dev"]
    e2e_io_note = _e2e["note"]
    e2e_long = _e2e["dev_long"]
    e2e_long_note = _e2e["note_long"]

    # 7. >VMEM-grid datapoint (VERDICT r3 #7): 4800^2-class grid through
    # the tiled (non-resident) kernels — the large-grid story measured,
    # not argued.
    def _large_grid():
        theta_lg = 0.016                          # 4800^2 at lam=300000
        n_lg = int(round(theta_lg * LAM))

        @jax.jit
        def lg_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
            bank_c = jax.lax.complex(bank_re, bank_im)
            vis_c = jax.lax.complex(vis_re, vis_im + salt)
            uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
            wbin = find_closest(centers, uvw1[:, 2])
            g = wproj_gridder(bank_c, (n_lg, n_lg), uvw1 / LAM, wbin, vis1)
            return (jnp.sum(jnp.abs(jnp.real(g)))
                    + jnp.sum(jnp.abs(jnp.imag(g))))

        return _rate(lg_step, args, N_VIS, k=3)

    _progress("metric 10/10: 4800^2 large grid")
    large_grid_rate = _best_effort("large_grid", _large_grid)

    # 7b. the same >VMEM grid through the BANDED streamed IDG-AW path
    # (K row bands each VMEM-resident, one streamed pass per band)
    def _large_grid_banded():
        from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
            idg_aw_grid_banded)
        from ska_sdp_tpu.ops.idg_aw import aw_screens_host

        theta_lg = 0.016
        n_lg = int(round(theta_lg * LAM))
        rngB = np.random.default_rng(11)
        ii, jj = np.triu_indices(NANT, k=1)
        nbl = ii.shape[0]
        ntime = 520
        u0 = rngB.uniform(-0.40, 0.40, (nbl, 2))
        du = rngB.uniform(-30.0 / n_lg, 30.0 / n_lg, (nbl, 2))
        ft = (np.arange(ntime) / ntime)[:, None]
        ub = u0[None, :, 0] + du[None, :, 0] * ft
        vb = u0[None, :, 1] + du[None, :, 1] * ft
        nB = ub.size
        pB = np.zeros((nB, 3), np.float32)
        pB[:, 0] = ub.ravel()
        pB[:, 1] = vb.ravel()
        wB = rngB.uniform(-3800, 3800, nB).astype(np.float32)
        a1B = np.broadcast_to(ii[None, :], ub.shape).ravel()
        a2B = np.broadcast_to(jj[None, :], ub.shape).ravel()
        s_ak = 15
        akB = np.zeros((NANT, s_ak, s_ak), np.complex64)
        akB[:, s_ak // 2, s_ak // 2] = 1.0
        scrB = aw_screens_host(akB, 64).astype(np.complex64)
        mrB = 8 * nbl * 2 + nB // 128 + 64

        @jax.jit
        def lg_aw_step(p_j, w_j, a1_j, a2_j, vr, vi, sre, sim, salt):
            gr, gi, nd = idg_aw_grid_banded(
                (n_lg, n_lg), p_j, a1_j, a2_j, w_j, vr, vi + salt, sre,
                sim, theta=theta_lg, max_runs=mrB)
            return (jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))
                    + jnp.where(nd > 0, jnp.float32(jnp.nan), 0.0))

        return _rate(
            lg_aw_step,
            (jnp.asarray(pB), jnp.asarray(wB),
             jnp.asarray(a1B, jnp.int32), jnp.asarray(a2B, jnp.int32),
             jnp.asarray(rngB.standard_normal(nB).astype(np.float32)),
             jnp.asarray(rngB.standard_normal(nB).astype(np.float32)),
             jnp.asarray(scrB.real.astype(np.float32)),
             jnp.asarray(scrB.imag.astype(np.float32))),
            nB, k=3,
        )

    _progress("metric 10b: 4800^2 banded IDG-AW")
    large_banded_rate = _best_effort("large_grid_banded",
                                     _large_grid_banded)

    print(
        json.dumps(
            {
                "metric": "visibilities gridded/sec/chip (SKA1_Low w-proj, 2400^2 grid, qpx=8, 15^2 kernels, complex64)",
                "value": round(wproj_rate, 1),
                "unit": "vis/s",
                "vs_baseline": round(wproj_rate / H100_CLASS_VIS_PER_SEC, 4),
                **_util(wproj_rate, "wproj"),
                "extra_metrics": [
                    {
                        "metric": "degridding (grid->vis predict, same shape)",
                        "value": round(degrid_rate, 1),
                        "unit": "vis/s",
                        **_util(degrid_rate, "wproj"),
                    },
                    {
                        "metric": "fused AW-projection (on-the-fly A1*A2*W, 64 ants; default split3 tier, 3.4e-6 rel err vs XLA oracle — SKA_SDP_TPU_AW_PRECISION=fast is ~1.4x faster at 2.5e-3)",
                        "value": round(aw_rate, 1),
                        "unit": "vis/s",
                        **_util(aw_rate, "aw_fused"),
                    },
                    {
                        "metric": "full imaging step (scatter + hermitian + centered iFFT)",
                        "value": round(full_rate, 1),
                        "unit": "vis/s",
                        **_util(full_rate, "wproj"),
                    },
                    {
                        "metric": "image-domain gridding (MXU subgrid matmuls, exact continuous-w placement)",
                        "value": round(idg_rate, 1),
                        "unit": "vis/s",
                        **_util(idg_rate, "idg"),
                    },
                    {
                        "metric": "IDG degridding / predict (exact continuous-w adjoint)",
                        "value": round(idg_degrid_rate, 1),
                        "unit": "vis/s",
                        **_util(idg_degrid_rate, "idg"),
                    },
                    {
                        "metric": "IDG-AW (image-domain A-screens, pair-chunked subgrids, baseline-track layout, 64 ants)",
                        "value": round(aw_idg_rate, 1),
                        "unit": "vis/s",
                        **_util(aw_idg_rate, "idg"),
                    },
                    {
                        "metric": "IDG-AW ordered single-shot (pair-major transpose replaces the record sort)",
                        "value": round(aw_idg_ord, 1),
                        "unit": "vis/s",
                        **_util(aw_idg_ord, "idg"),
                    },
                    {
                        "metric": "IDG-AW degridding / predict with A-terms (streamed adjoint kernel)",
                        "value": round(aw_idg_dg, 1),
                        "unit": "vis/s",
                        **_util(aw_idg_dg, "idg"),
                    },
                    {
                        "metric": "SUSTAINED IDG-AW (run sort amortized across channel group)",
                        "value": round(aw_idg_sus, 1),
                        "unit": "vis/s",
                        **_util(aw_idg_sus, "idg"),
                    },
                    {
                        "metric": "END-TO-END multi-channel IDG (driver wall-clock: HDF5 ingest + group planning + binning + 8 channels + per-channel iFFT, 1.05M records x 8ch; dev-harness tunnel I/O at ~20-40 MB/s dominates this raw number)",
                        "value": round(e2e_mc_rate, 1),
                        "unit": "vis/s",
                        **_util(e2e_mc_rate, "idg"),
                    },
                    {
                        "metric": f"END-TO-END multi-channel IDG, device pipeline phase: weights + run binning + 8 channel kernels + per-channel hermitian/iFFT, cube on device ({e2e_io_note}; the wall remainder is the dev tunnel's ~5-40 MB/s host I/O — <100 ms on a PCIe-local host)",
                        "value": round(e2e_mc_ex, 1),
                        "unit": "vis/s",
                        **_util(e2e_mc_ex, "idg"),
                    },
                    {
                        "metric": f"END-TO-END multi-channel IDG, LONG observation, device pipeline phase ({e2e_long_note})",
                        "value": round(e2e_long, 1),
                        "unit": "vis/s",
                        **_util(e2e_long, "idg"),
                    },
                    {
                        "metric": "w-projection at 4800^2 (>VMEM grid, tiled kernel path)",
                        "value": round(large_grid_rate, 1),
                        "unit": "vis/s",
                        **_util(large_grid_rate, "wproj"),
                    },
                    {
                        "metric": "IDG-AW at 4800^2 (>VMEM grid, BANDED streamed path: K VMEM-resident row bands, drops poison the checksum)",
                        "value": round(large_banded_rate, 1),
                        "unit": "vis/s",
                        **_util(large_banded_rate, "idg"),
                    },
                    {
                        "metric": "IDG accuracy vs direct-DFT truth (rel err, central 75% FOV; see idg_fov_pad_plan for the full-FOV option)",
                        "value": round(idg_acc, 7),
                        "unit": "rel_err",
                    },
                ] + ([
                    {
                        "metric": "SUSTAINED image-domain gridding (binning amortized across channel group)",
                        "value": round(sus_idg, 1),
                        "unit": "vis/s",
                        **_util(sus_idg, "idg"),
                    },
                ] if sus_idg else []),
            }
        )
    )


if __name__ == "__main__":
    main()
