"""Headline benchmark: visibilities gridded/sec, SKA1_Low w-projection.

Measures the hot kernels of the framework at the SKA1_Low scale
(BASELINE.md configs) on whatever accelerator JAX selects (the real TPU
chip under the driver; CPU as fallback).

HEADLINE (round 5, VERDICT r4 #2): the framework's best honest
w-projection — the STREAMED image-domain gridding kernel (exact
continuous-w placement, rel err ≤1e-4 vs a direct-DFT truth; the
``idg accuracy`` extra in this same output pins the number every run).
That path is MORE accurate than the qpx=8 bank-lookup kernel it
replaces as headline (the bank quantizes w to 32 planes and uv to 1/8
cell; BENCH.md round-2 accuracy comparison), so it satisfies the
metric's semantics outright.  The bank-lookup kernel — at its own
declared VMEM-RMW roofline (~25-40M vis/s, BENCH.md) — is reported as
a labeled extra.

DRIVER-BUDGET CONTRACT (round 5, VERDICT r4 #1): the driver runs this
under a ~10-minute timeout and parses the LAST parseable stdout line.
Round 4 printed its single JSON line only after all metrics and was
killed mid-run — the official record was empty.  This version:

  * prints the full JSON line (headline + extras-so-far) after EVERY
    metric completes — a timeout at any point leaves the most complete
    record measured so far as the last stdout line;
  * orders metrics by importance, so what a timeout cuts is the least
    important tail;
  * guards each metric with a time budget (default 460 s, override
    ``SKA_SDP_TPU_BENCH_BUDGET_S``) against COLD-compile cost
    estimates — skipped metrics are recorded as ``skipped (budget)``;
  * flushes the current record on SIGTERM before exiting;
  * ``SKA_SDP_TPU_BENCH_FULL=1`` disables the budget and adds the
    slow extras (long-observation e2e).

Device-boundary note: the TPU PJRT path here does not support complex
transfers, so complex operands enter as (re, im) float32 pairs and each
step returns a real checksum that forces full execution (see utils/cplx.py).

The reference publishes no numbers (BASELINE.md); the driver's north-star is
"≥5× H100-class visibilities/sec".  ``vs_baseline`` is therefore reported
against H100_CLASS_VIS_PER_SEC below: an H100-class estimate for this exact
operator.  Published GPU gridding work (Romein-style thread-coarsened
gridders, PAPERS.md) lands in the ~1-3 Gvis/s range on H100-class parts for
15² kernels; we use 2e9 as the bar.
"""

from __future__ import annotations

import json
import os
import signal
import sys
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
N_VIS = 1 << 20           # per timed step
N_VIS_AW = 1 << 19        # AW fused
STEPS = 3                 # outer reps (median taken — tunnel spikes)
# Device steps chained per dispatch.  Round-4 measurement: the ~27-34 ms
# tunnel dispatch floor divides by the chain length, so CHAIN=8 still
# left ~4.2 ms/step of DISPATCH inside every round-3 number.  At 32 the
# residual is ~1 ms/step (<10% of the fastest kernels); production
# pipelines amortize dispatch identically.
CHAIN = 32

T0 = time.time()
FULL = os.environ.get("SKA_SDP_TPU_BENCH_FULL", "") == "1"
BUDGET_S = float(os.environ.get("SKA_SDP_TPU_BENCH_BUDGET_S", "460"))

# --- incremental result record ------------------------------------------
_state: dict = {"headline": None, "extras": []}


def _emit() -> None:
    """Print the full JSON record as it stands.  Called after every
    metric: the driver parses the LAST parseable stdout line, so each
    call supersedes the previous one and a kill at any point leaves the
    most complete record (VERDICT r4 #1)."""
    if _state["headline"] is None:
        return
    rec = dict(_state["headline"])
    rec["extra_metrics"] = list(_state["extras"])
    rec["bench_elapsed_s"] = round(time.time() - T0, 1)
    print(json.dumps(rec), flush=True)


def _on_term(signum, frame):  # pragma: no cover - signal path
    _emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)


def _progress(msg):
    """Stderr progress stamps — through the remote-TPU tunnel a cold
    compile can take minutes; silence is indistinguishable from a hang
    without these."""
    print(f"[bench {time.strftime('%H:%M:%S')} +{time.time() - T0:5.0f}s] "
          f"{msg}", file=sys.stderr, flush=True)


def _rate(step, args, n, k=STEPS, chain=CHAIN):
    """Per-step device throughput of a jitted step.

    Round-3 measurement (BENCH.md): every host dispatch through the
    remote-TPU tunnel pays a ~27 ms round-trip REGARDLESS of the program —
    timing single steps mis-charges that latency as kernel time.  The
    fix: chain ``chain`` data-dependent steps inside ONE jitted program
    (each with a distinct salt, so nothing collapses by CSE and the
    tunnel cannot serve cached results) and divide by the chain length —
    the same device-throughput convention the published GPU gridder
    numbers (the 2 Gvis/s bar) use.
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
    # persistent compilation cache: bench compiles ~10 jitted programs
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

    from ska_sdp_tpu.kernels import (
        aw_gridder,
        idg_degridder,
        idg_gridder,
        wproj_degridder,
        wproj_gridder,
    )
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
    g_re = jnp.asarray(rng.standard_normal((n_grid, n_grid)).astype(np.float32))
    g_im = jnp.asarray(rng.standard_normal((n_grid, n_grid)).astype(np.float32))

    def _prep(uvw_l, vis_c):
        uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
        wbin = find_closest(centers, uvw1[:, 2])
        return uvw1, vis1, wbin

    # ---- metric 1 (HEADLINE): streamed image-domain w-projection -------
    @jax.jit
    def idg_step(uvw_l, vis_re, vis_im, salt):
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
        g = idg_gridder((n_grid, n_grid), uvw1 / LAM, uvw1[:, 2], vis1,
                        theta=THETA)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    _progress("metric 1 (headline): streamed IDG w-projection")
    idg_rate = _rate(idg_step, (uvw, vis_re, vis_im), N_VIS, k=STEPS)
    _state["headline"] = {
        "metric": ("visibilities gridded/sec/chip (SKA1_Low w-projection, "
                   "2400^2 grid, complex64; streamed image-domain gridding "
                   "kernel — exact continuous-w placement, rel err <=1e-4 vs "
                   "direct-DFT truth [see 'IDG accuracy' extra], MORE "
                   "accurate than the qpx=8 bank-lookup kernel reported as "
                   "the 'w-projection (kernel-bank lookup)' extra)"),
        "value": round(idg_rate, 1),
        "unit": "vis/s",
        "vs_baseline": round(idg_rate / H100_CLASS_VIS_PER_SEC, 4),
        **_util(idg_rate, "idg"),
    }
    _emit()

    # ---- remaining metrics: priority-ordered, budget-guarded -----------
    def _extra(entry):
        _state["extras"].append(entry)
        _emit()

    def _run_metric(name, est_cold_s, fn):
        """Budget guard: run ``fn`` unless the remaining budget cannot
        cover the estimated COLD cost (warm-cache runs come in far under
        the estimates, so nothing is skipped then).  A failed metric
        records 0 and never takes the record down (VERDICT r1 #7)."""
        left = BUDGET_S - (time.time() - T0)
        if not FULL and left < est_cold_s:
            _progress(f"skip {name}: {left:.0f}s left < est {est_cold_s}s")
            _extra({"metric": name, "value": 0.0, "unit": "vis/s",
                    "note": "skipped (driver time budget)"})
            return
        _progress(f"metric: {name}")
        import traceback

        try:
            fn()
        except Exception:
            print(f"bench metric {name!r} failed:", file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
            _extra({"metric": name, "value": 0.0, "unit": "vis/s",
                    "note": "failed (see stderr)"})

    # -- 2. bank-lookup w-projection (the former headline; VMEM-RMW-bound
    #       design ceiling ~25-40M — BENCH.md roofline)
    @jax.jit
    def grid_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
        bank_c = jax.lax.complex(bank_re, bank_im)
        vis_c = jax.lax.complex(vis_re, vis_im + salt)
        uvw1, vis1, wbin = _prep(uvw_l, vis_c)
        g = wproj_gridder(bank_c, (n_grid, n_grid), uvw1 / LAM, wbin, vis1)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    wargs = (bank_re, bank_im, uvw, vis_re, vis_im)

    def _m_wproj_bank():
        r = _rate(grid_step, wargs, N_VIS, k=2)
        _extra({
            "metric": ("w-projection (kernel-bank lookup, qpx=8, 15^2 "
                       "kernels; resident Pallas kernel at its VMEM-RMW "
                       "design roofline)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "wproj"),
        })

    _run_metric("w-projection bank-lookup", 50, _m_wproj_bank)

    # -- 3-7. IDG-AW family on BASELINE-TRACK data (the layout real
    #    interferometer data arrives in; shared setup)
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
    ak_re = rng.standard_normal((NANT, S, S)).astype(np.float32)
    ak_im = rng.standard_normal((NANT, S, S)).astype(np.float32)
    from ska_sdp_tpu.ops.idg_aw import aw_screens_host

    scr = aw_screens_host(ak_re + 1j * ak_im, 64)
    # (pair, uv-tile) run bound: tracks split at tile crossings
    max_runs = 8 * nbl + nT // 128 + 64
    argsT = (
        jnp.asarray(pT), jnp.asarray(wt.ravel(), jnp.float32),
        jnp.asarray(a1T, jnp.int32), jnp.asarray(a2T, jnp.int32),
        jnp.asarray(scr.real, jnp.float32),
        jnp.asarray(scr.imag, jnp.float32),
        jnp.asarray(rng.standard_normal(nT).astype(np.float32)),
        jnp.asarray(rng.standard_normal(nT).astype(np.float32)),
    )

    # -- 3. SUSTAINED IDG-AW (run sort amortized across a channel group —
    #       the from-records split; channels swap only the vis rows)
    def _m_aw_sustained():
        from ska_sdp_tpu.kernels.idg_aw_pallas import (
            idg_aw_grid_from_records, idg_aw_run_records,
        )

        @jax.jit
        def _prepT(p_j, w_j, a1_j, a2_j, vr, vi):
            return idg_aw_run_records(
                (n_grid, n_grid), p_j, a1_j, a2_j, w_j, vr, vi,
                max_runs=max_runs,
            )

        recs, st, en, y0c, x0c, i1c, i2c, _nd, _geo = _prepT(
            argsT[0], argsT[1], argsT[2], argsT[3], argsT[6], argsT[7])

        @jax.jit
        def sus_step(recs, st, en, y0c, x0c, i1c, i2c, sre, sim, salt):
            recs = recs.at[0, 3, 0].add(salt)
            gr, gi = idg_aw_grid_from_records(
                recs, st, en, y0c, x0c, i1c, i2c, (n_grid, n_grid),
                sre, sim, theta=THETA,
            )
            return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

        r = _rate(
            sus_step,
            (recs, st, en, y0c, x0c, i1c, i2c, argsT[4], argsT[5]),
            nT, k=2,
        )
        _extra({
            "metric": ("SUSTAINED IDG-AW (image-domain A-screens, "
                       "baseline-track layout, 64 ants; run sort amortized "
                       "across channel group)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("sustained IDG-AW", 70, _m_aw_sustained)

    # -- 4. IDG-AW sorted single-shot (first-contact cost: prep included)
    def _m_aw_sorted():
        from ska_sdp_tpu.kernels import idg_aw_gridder

        @jax.jit
        def aw_idg_step(p_j, w_j, a1_j, a2_j, sre, sim, vr, vi, salt):
            guv, nd = idg_aw_gridder(
                (n_grid, n_grid), p_j, a1_j, a2_j, w_j,
                jax.lax.complex(vr, vi + salt), jax.lax.complex(sre, sim),
                theta=THETA, max_runs=max_runs,
            )
            return (jnp.sum(jnp.abs(jnp.real(guv)))
                    + jnp.sum(jnp.abs(jnp.imag(guv))) + 0.0 * nd)

        r = _rate(aw_idg_step, argsT, nT, k=2)
        _extra({
            "metric": ("IDG-AW single-shot, sorted prep (image-domain "
                       "A-screens, pair-chunked subgrids, baseline-track "
                       "layout, 64 ants)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("IDG-AW sorted single-shot", 70, _m_aw_sorted)

    # -- 5. IDG-AW ordered single-shot: a pair-major SINGLE-channel track
    #       stream ([nbl, ntime] — one transpose of the file raster)
    #       replaces the comparison sort (VERDICT r3 #4, ordered=True).
    #       Drops poison the checksum here so a regression cannot hide.
    def _m_aw_ordered():
        from ska_sdp_tpu.kernels import idg_aw_gridder

        ntime1 = nT // nbl                     # 520: same n, 1 chan
        ft1 = (np.arange(ntime1) / ntime1)[:, None]
        u1 = u0[None, :, 0] + du[None, :, 0] * ft1       # [ntime1,nbl]
        v1 = u0[None, :, 1] + du[None, :, 1] * ft1
        w1 = w0[None, :] + dw[None, :] * ft1
        n1 = u1.size
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
                 argsT[4], argsT[5], jnp.asarray(vr1), jnp.asarray(vi1))
        r = _rate(aw_idg_ordered_step, args1, n1, k=2)
        _extra({
            "metric": ("IDG-AW ordered single-shot (pair-major transpose "
                       "replaces the record sort; drops poison checksum)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("IDG-AW ordered single-shot", 60, _m_aw_ordered)

    # -- 6. IDG degridding / predict (exact continuous-w adjoint)
    def _m_idg_degrid():
        @jax.jit
        def idg_degrid_step(g_re, g_im, uvw_l, salt):
            grid_c = jax.lax.complex(g_re + salt, g_im)
            uvw1, _, _ = _prep(uvw_l, jnp.zeros(uvw_l.shape[0],
                                                jnp.complex64))
            v = idg_degridder((n_grid, n_grid), uvw1 / LAM, uvw1[:, 2],
                              grid_c, theta=THETA)
            return (jnp.sum(jnp.abs(jnp.real(v)))
                    + jnp.sum(jnp.abs(jnp.imag(v))))

        r = _rate(idg_degrid_step, (g_re, g_im, uvw), N_VIS, k=2)
        _extra({
            "metric": ("IDG degridding / predict (exact continuous-w "
                       "adjoint, streamed kernel)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("IDG degrid", 60, _m_idg_degrid)

    # -- 7. IDG-AW degridding (model predict with A-terms)
    def _m_aw_degrid():
        from ska_sdp_tpu.kernels import idg_aw_degridder

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

        r = _rate(
            dg_step,
            (g_re, g_im, argsT[0], argsT[1], argsT[2], argsT[3],
             argsT[4], argsT[5]),
            nT, k=2,
        )
        _extra({
            "metric": ("IDG-AW degridding / predict with A-terms "
                       "(streamed adjoint kernel)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("IDG-AW degrid", 60, _m_aw_degrid)

    # -- 8. IDG accuracy vs an independent direct-DFT truth, BOTH
    #       precision tiers (VERDICT r4 #7: the accuracy record must not
    #       silently track the default tier).  The split3 envelope
    #       (<=1e-4) is asserted — a violation poisons the value to NaN
    #       the way drops poison checksums.
    def _m_idg_accuracy():
        from ska_sdp_tpu.ops import ifft_centered as _ifft
        from ska_sdp_tpu.ops.idg import kaiser_taper, taper_fine

        Na, Sa, th = 256, 64, 0.05
        rng2 = np.random.default_rng(7)
        b = 300
        pa = rng2.uniform(-0.42, 0.42, (b, 3)).astype(np.float32)
        wa = rng2.uniform(-250, 250, b).astype(np.float32)
        va = (rng2.standard_normal(b)
              + 1j * rng2.standard_normal(b)).astype(np.complex64)
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
        refc = ref[c:-c, c:-c]                       # usable-FOV region)

        def one_tier(tier):
            # the tier env var is read at kernel TRACE time, so each
            # tier gets its own jitted program
            os.environ["SKA_SDP_TPU_IDG_AW_PRECISION"] = tier

            @jax.jit
            def acc_step(p_j, w_j, vr, vi):
                g = idg_gridder((Na, Na), p_j, w_j,
                                jax.lax.complex(vr, vi), theta=th)
                cim = _ifft(g)
                tf = taper_fine(Na, Sa,
                                kaiser_taper(Sa, 12.0)).astype(jnp.float32)
                t2 = tf[:, None] * tf[None, :]
                return jnp.real(cim) / t2, jnp.imag(cim) / t2

            ire, iim = acc_step(
                jnp.asarray(pa), jnp.asarray(wa),
                jnp.asarray(va.real), jnp.asarray(va.imag))
            img = np.asarray(ire) + 1j * np.asarray(iim)
            d = np.linalg.norm((img[c:-c, c:-c]) - refc)
            return float(d / np.linalg.norm(refc))

        try:
            acc_split3 = one_tier("split3")
            acc_exact = one_tier("exact")
        finally:
            os.environ.pop("SKA_SDP_TPU_IDG_AW_PRECISION", None)
        val = acc_split3 if acc_split3 <= 1e-4 else float("nan")
        _extra({
            "metric": ("IDG accuracy vs direct-DFT truth (rel err, central "
                       "75% FOV; default split3 tier — NaN if the <=1e-4 "
                       "envelope is violated; 'exact' = "
                       "SKA_SDP_TPU_IDG_AW_PRECISION=exact tier)"),
            "value": round(val, 7),
            "unit": "rel_err",
            "tiers": {"split3": round(acc_split3, 7),
                      "exact": round(acc_exact, 7)},
        })

    _run_metric("IDG accuracy (both tiers)", 25, _m_idg_accuracy)

    # -- 9. bank-path degridding
    def _m_degrid_bank():
        @jax.jit
        def degrid_step(bank_re, bank_im, g_re, g_im, uvw_l, salt):
            bank_c = jax.lax.complex(bank_re, bank_im)
            grid_c = jax.lax.complex(g_re + salt, g_im)
            uvw1, _, wbin = _prep(uvw_l, jnp.zeros(uvw_l.shape[0],
                                                   jnp.complex64))
            v = wproj_degridder(bank_c, grid_c, uvw1 / LAM, wbin)
            return (jnp.sum(jnp.abs(jnp.real(v)))
                    + jnp.sum(jnp.abs(jnp.imag(v))))

        r = _rate(degrid_step, (bank_re, bank_im, g_re, g_im, uvw),
                  N_VIS, k=2)
        _extra({
            "metric": "degridding (grid->vis predict, kernel-bank lookup)",
            "value": round(r, 1), "unit": "vis/s", **_util(r, "wproj"),
        })

    _run_metric("bank degrid", 40, _m_degrid_bank)

    # -- 10. full imaging step: scatter + hermitian + centered iFFT
    def _m_full_step():
        @jax.jit
        def full_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
            bank_c = jax.lax.complex(bank_re, bank_im)
            vis_c = jax.lax.complex(vis_re, vis_im + salt)
            uvw1, vis1, wbin = _prep(uvw_l, vis_c)
            g = wproj_gridder(bank_c, (n_grid, n_grid), uvw1 / LAM, wbin,
                              vis1)
            img = jnp.real(ifft_centered(make_grid_hermitian(g)))
            return jnp.sum(jnp.abs(img))

        r = _rate(full_step, wargs, N_VIS, k=2)
        _extra({
            "metric": ("full imaging step (bank scatter + hermitian + "
                       "centered iFFT)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "wproj"),
        })

    _run_metric("full imaging step", 60, _m_full_step)

    # -- 11. END-TO-END multi-channel imaging through the DRIVER (VERDICT
    #        r3 #1: sustained rates as a pipeline capability).
    def _m_e2e_multichannel():
        import tempfile

        from ska_sdp_tpu.config import GridParams
        from ska_sdp_tpu.config import ImagingConfig as _ICfg
        from ska_sdp_tpu.io.synthetic import (SyntheticConfig,
                                              simulate_observation,
                                              write_vis_file)
        from ska_sdp_tpu.models import spectral
        from ska_sdp_tpu.utils.timing import PhaseTimer

        nchan = 8
        d = tempfile.mkdtemp(prefix="ska_bench_mc_")
        icfg = _ICfg(grid=GridParams(theta=THETA, lam=LAM))

        def make_file(seed, ntime):
            cfg = SyntheticConfig(theta=THETA, lam=LAM, nant=NANT,
                                  ntime=ntime, nchan=nchan, nsources=3,
                                  seed=seed)
            obs = simulate_observation(cfg)
            vpath = os.path.join(d, f"vis_{ntime}_{seed}.h5")
            write_vis_file(vpath, obs)
            return vpath, obs["n"]

        def run(vpath):
            timer = PhaseTimer(enabled=False)
            t0 = time.perf_counter()
            mx, _img, cube = spectral.idg_gridding_multi(
                vpath, nchan, config=icfg, timer=timer)
            dt = time.perf_counter() - t0
            assert np.isfinite(mx) and cube.shape[0] == nchan
            return dt, timer.times.get("compile+grid+fft", dt)

        # warmup compiles on one file; every TIMED run uses a FRESH file
        # — the dev harness's tunnel serves repeated identical executions
        # from a cache.  The dev tunnel's host<->device bandwidth
        # measures ~5-40 MB/s, so the vis h2d + cube d2h DOMINATE
        # wall-clock here (a PCIe-local host moves the same volumes in
        # <100 ms); the driver's own "compile+grid+fft" phase carries
        # the compute-side rate.
        vp0, n_rec = make_file(5, 520)
        run(vp0)
        (dt, t_dev) = min(run(make_file(6, 520)[0]),
                          run(make_file(7, 520)[0]))
        n_tot = nchan * n_rec
        _extra({
            "metric": ("END-TO-END multi-channel IDG driver wall-clock "
                       "(HDF5 ingest + group planning + binning + 8 "
                       "channels + per-channel iFFT, 1.05M rec x 8ch; "
                       "dev-harness tunnel I/O at ~5-40 MB/s dominates "
                       "this raw number)"),
            "value": round(n_tot / dt, 1), "unit": "vis/s",
            **_util(n_tot / dt, "idg"),
        })
        _extra({
            "metric": ("END-TO-END multi-channel IDG, device pipeline "
                       "phase: weights + run binning + 8 channel kernels "
                       "+ per-channel hermitian/iFFT, cube on device "
                       f"(device phase {t_dev:.2f}s of {dt:.2f}s wall; "
                       "the remainder is the dev tunnel's host I/O — "
                       "<100 ms on a PCIe-local host)"),
            "value": round(n_tot / max(t_dev, 1e-3), 1), "unit": "vis/s",
            **_util(n_tot / max(t_dev, 1e-3), "idg"),
        })

        if FULL:
            # long-observation shape: 4x records per channel — per-group
            # fixed costs amortize toward the sustained kernel rate
            vpl, n_rec_l = make_file(5, 2080)
            run(vpl)
            (dt_l, t_dev_l) = min(run(make_file(6, 2080)[0]),
                                  run(make_file(7, 2080)[0]))
            n_tot_l = nchan * n_rec_l
            _extra({
                "metric": ("END-TO-END multi-channel IDG, LONG "
                           f"observation ({n_rec_l / 1e6:.1f}M rec x "
                           f"{nchan}ch), device pipeline phase "
                           f"({t_dev_l:.2f}s of {dt_l:.2f}s wall)"),
                "value": round(n_tot_l / max(t_dev_l, 1e-3), 1),
                "unit": "vis/s",
                **_util(n_tot_l / max(t_dev_l, 1e-3), "idg"),
            })

    _run_metric("e2e multi-channel driver", 110, _m_e2e_multichannel)

    # -- 12. fused AW-projection (on-the-fly A1⊛A2⊛W; random-uv layout —
    #        IDG-AW covers the production track layout)
    def _m_aw_fused():
        a1 = jnp.asarray(rng.integers(0, NANT, N_VIS_AW).astype(np.int32))
        a2 = jnp.asarray(rng.integers(0, NANT, N_VIS_AW).astype(np.int32))
        akr = jnp.asarray(ak_re)
        aki = jnp.asarray(ak_im)

        @jax.jit
        def aw_step(bank_re, bank_im, ak_re, ak_im, uvw_l, a1, a2,
                    vis_re, vis_im, salt):
            wk = jax.lax.complex(bank_re, bank_im)
            ak = jax.lax.complex(ak_re, ak_im)
            vis_c = jax.lax.complex(vis_re, vis_im + salt)
            uvw1, vis1, wbin = _prep(uvw_l, vis_c)
            g = aw_gridder(wk, ak, jnp.zeros((n_grid, n_grid),
                                             jnp.complex64),
                           uvw1 / LAM, wbin, a1, a2, vis1)
            return (jnp.sum(jnp.abs(jnp.real(g)))
                    + jnp.sum(jnp.abs(jnp.imag(g))))

        r = _rate(aw_step,
                  (bank_re, bank_im, akr, aki, uvw[:N_VIS_AW], a1, a2,
                   vis_re[:N_VIS_AW], vis_im[:N_VIS_AW]),
                  N_VIS_AW, k=2)
        _extra({
            "metric": ("fused AW-projection (on-the-fly A1*A2*W, 64 ants, "
                       "random-uv layout; default split3 tier — IDG-AW "
                       "covers the production track layout)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "aw_fused"),
        })

    _run_metric("fused AW", 40, _m_aw_fused)

    # -- 13. >VMEM grid (4800^2) through the BANDED streamed IDG-AW path
    def _m_large_banded():
        from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
            idg_aw_grid_banded)

        theta_lg = 0.016
        n_lg = int(round(theta_lg * LAM))
        rngB = np.random.default_rng(11)
        ntimeB = 520
        u0B = rngB.uniform(-0.40, 0.40, (nbl, 2))
        duB = rngB.uniform(-30.0 / n_lg, 30.0 / n_lg, (nbl, 2))
        ftB = (np.arange(ntimeB) / ntimeB)[:, None]
        ub = u0B[None, :, 0] + duB[None, :, 0] * ftB
        vb = u0B[None, :, 1] + duB[None, :, 1] * ftB
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

        r = _rate(
            lg_aw_step,
            (jnp.asarray(pB), jnp.asarray(wB),
             jnp.asarray(a1B, jnp.int32), jnp.asarray(a2B, jnp.int32),
             jnp.asarray(rngB.standard_normal(nB).astype(np.float32)),
             jnp.asarray(rngB.standard_normal(nB).astype(np.float32)),
             jnp.asarray(scrB.real.astype(np.float32)),
             jnp.asarray(scrB.imag.astype(np.float32))),
            nB, k=2,
        )
        _extra({
            "metric": ("IDG-AW at 4800^2 (>VMEM grid, BANDED streamed "
                       "path: K VMEM-resident row bands; drops poison "
                       "the checksum)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("4800^2 banded IDG-AW", 80, _m_large_banded)

    # -- 14. plain IDG at 4800^2 (>VMEM grid) through dispatch
    def _m_large_idg():
        theta_lg = 0.016
        n_lg = int(round(theta_lg * LAM))

        @jax.jit
        def lg_idg_step(uvw_l, vis_re, vis_im, salt):
            vis_c = jax.lax.complex(vis_re, vis_im + salt)
            uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
            g = idg_gridder((n_lg, n_lg), uvw1 / LAM, uvw1[:, 2], vis1,
                            theta=theta_lg)
            return (jnp.sum(jnp.abs(jnp.real(g)))
                    + jnp.sum(jnp.abs(jnp.imag(g))))

        r = _rate(lg_idg_step, (uvw, vis_re, vis_im), N_VIS, k=2)
        _extra({
            "metric": ("image-domain gridding at 4800^2 (>VMEM grid, "
                       "dispatch route)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("4800^2 plain IDG", 80, _m_large_idg)

    # -- 15. sustained plain IDG (binning amortized across channel group)
    def _m_sustained_idg():
        from ska_sdp_tpu.kernels.idg_pallas import (
            idg_bin_records, idg_grid_from_records,
        )

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
            recs = recs.at[0, 3, 0].add(salt)
            gr, gi = idg_grid_from_records(
                recs, starts, (n_grid, n_grid), theta=THETA
            )
            return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

        r = _rate(sus_idg_step, (i_recs, i_starts), N_VIS, k=2)
        _extra({
            "metric": ("SUSTAINED image-domain gridding (binning "
                       "amortized across channel group)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("sustained plain IDG", 40, _m_sustained_idg)

    # -- 16. IDG-AW at subgrid 32 (VERDICT r4 #8: the streamed-kernel
    #        envelope past S=64; S=32 pairs with support<=11 — the
    #        S-scaled taper margin gives Tc=10 tiles, ~2.4x the runs)
    def _m_aw_s32():
        from ska_sdp_tpu.kernels import idg_aw_gridder

        rng32 = np.random.default_rng(13)
        ii2, jj2 = np.triu_indices(32, k=1)
        nbl2 = ii2.shape[0]                    # 496
        ntime2, nchan2 = 264, 8                # ~1.047M records
        u02 = rng32.uniform(-0.40, 0.40, (nbl2, 2))
        du2 = rng32.uniform(-30.0 / n_grid, 30.0 / n_grid, (nbl2, 2))
        w02 = rng32.uniform(-3800.0, 3800.0, nbl2)
        dw2 = rng32.uniform(-100.0, 100.0, nbl2)
        ft2 = (np.arange(ntime2) / ntime2)[:, None, None]
        fs2 = (1.0 + 0.0005 * np.arange(nchan2))[None, None, :]
        u2 = (u02[None, :, 0:1] + du2[None, :, 0:1] * ft2) * fs2
        v2 = (u02[None, :, 1:2] + du2[None, :, 1:2] * ft2) * fs2
        w2 = (w02[None, :, None] + dw2[None, :, None] * ft2
              ) * np.ones_like(fs2)
        n2 = u2.size
        p2 = np.zeros((n2, 3), np.float32)
        p2[:, 0] = u2.ravel()
        p2[:, 1] = v2.ravel()
        a1_2 = np.broadcast_to(ii2[None, :, None], u2.shape).ravel()
        a2_2 = np.broadcast_to(jj2[None, :, None], u2.shape).ravel()
        scr2 = aw_screens_host(
            (rng32.standard_normal((32, 32, 32))
             + 1j * rng32.standard_normal((32, 32, 32))), 32)
        mr2 = 24 * nbl2 + n2 // 128 + 64

        @jax.jit
        def aw32_step(p_j, w_j, a1_j, a2_j, sre, sim, vr, vi, salt):
            guv, nd = idg_aw_gridder(
                (n_grid, n_grid), p_j, a1_j, a2_j, w_j,
                jax.lax.complex(vr, vi + salt),
                jax.lax.complex(sre, sim), theta=THETA, subgrid=32,
                support=9, max_runs=mr2,
            )
            return (jnp.sum(jnp.abs(jnp.real(guv)))
                    + jnp.sum(jnp.abs(jnp.imag(guv)))
                    + jnp.where(nd > 0, jnp.float32(jnp.nan), 0.0))

        r = _rate(
            aw32_step,
            (jnp.asarray(p2), jnp.asarray(w2.ravel(), jnp.float32),
             jnp.asarray(a1_2, jnp.int32), jnp.asarray(a2_2, jnp.int32),
             jnp.asarray(scr2.real, jnp.float32),
             jnp.asarray(scr2.imag, jnp.float32),
             jnp.asarray(rng32.standard_normal(n2).astype(np.float32)),
             jnp.asarray(rng32.standard_normal(n2).astype(np.float32))),
            n2, k=2)
        _extra({
            "metric": ("IDG-AW single-shot at subgrid 32 (support 9, "
                       "32 ants; streamed kernel envelope past S=64 — "
                       "drops poison checksum)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "idg"),
        })

    _run_metric("IDG-AW subgrid 32", 70, _m_aw_s32)

    # -- 17. w-projection bank path at 4800^2 (tiled kernel fallback)
    def _m_large_wproj():
        theta_lg = 0.016
        n_lg = int(round(theta_lg * LAM))

        @jax.jit
        def lg_step(bank_re, bank_im, uvw_l, vis_re, vis_im, salt):
            bank_c = jax.lax.complex(bank_re, bank_im)
            vis_c = jax.lax.complex(vis_re, vis_im + salt)
            uvw1, vis1, wbin = _prep(uvw_l, vis_c)
            g = wproj_gridder(bank_c, (n_lg, n_lg), uvw1 / LAM, wbin, vis1)
            return (jnp.sum(jnp.abs(jnp.real(g)))
                    + jnp.sum(jnp.abs(jnp.imag(g))))

        r = _rate(lg_step, wargs, N_VIS, k=2)
        _extra({
            "metric": ("w-projection bank path at 4800^2 (>VMEM grid, "
                       "tiled kernel)"),
            "value": round(r, 1), "unit": "vis/s", **_util(r, "wproj"),
        })

    _run_metric("4800^2 bank w-proj", 60, _m_large_wproj)

    _progress(f"done in {time.time() - T0:.0f}s")
    _emit()


if __name__ == "__main__":
    main()
