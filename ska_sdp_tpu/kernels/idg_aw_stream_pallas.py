"""Pallas TPU kernel: streamed (block-major) IDG-AW gridder.

Round-4 successor to ``idg_aw_pallas``'s run-major kernel, built from the
hardware ablation (``experiments/probe_idg_aw_ablate.py``, v5e, 1.048M
track records, 2400², 4870 runs): the run-major walk re-DMAs and
re-evaluates each 256-record block once per run touching it (8881
block-processings vs the 4095 minimum), pays 4·(S,C) sin/cos per
PROCESSING (7.2 ms/Mvis), and runs every accumulation dot at HIGHEST
(six bf16 passes, 9.0 ms/Mvis).  This kernel inverts the loop — it walks
the sorted record stream ONCE, block by block, and treats runs as
segments of the stream:

* ONE grid program streams all blocks linearly, double-buffered
  HBM→VMEM; every block is transferred exactly once;
* the phase matrices (4 × (S,C) sin/cos) are computed ONCE per block
  and shared by every run segment inside the block;
* per segment, the complex outer-product accumulation is ONE stacked
  real dot: A = [[u_re, −u_im], [u_im, u_re]] (2S,2C) against
  B = [ex_re | ex_im] (S,2C) contracted over lanes — the segment's lane
  range is masked on B's (pre-split) planes, so A and its bf16 hi/lo
  planes are built once per block;
* the (2S,S) accumulator persists across blocks (a run spanning a block
  boundary keeps accumulating); a run finalizes — pair screen, DFT
  sandwich, resident-grid placement, identical math to
  ``idg_aw_pallas._kernel`` — inside the block holding its last record;
* precision tiers (``SKA_SDP_TPU_IDG_AW_PRECISION``): ``split3``
  (default) runs every kernel dot as 3 bf16-rate passes on hi/lo split
  planes (measured ~1e-5 relative vs the exact kernel — inside the
  mode's documented ≤1e-4 envelope); ``exact`` pins HIGHEST (six-pass
  f32) everywhere.

Reference semantics: same operator as ``ops.idg_aw.idg_grid_aw`` (the
XLA oracle; reference AW chain ``/root/reference/src/Gridding.hs:283-377``
rebuilt in the image domain).  Prep is shared with ``idg_aw_pallas``
(``idg_aw_run_records`` + :func:`block_run_ranges` here).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .idg_aw_pallas import (CHUNK, IDG_AW_VMEM_BUDGET, _geometry, _win_w,
                            idg_aw_run_records)


def _tier() -> str:
    """Precision tier, resolved per call (ADVICE r3: not import time)."""
    t = os.environ.get("SKA_SDP_TPU_IDG_AW_PRECISION", "split3")
    return t if t in ("split3", "exact") else "split3"


def _trig() -> str:
    """Phase-evaluation mode (``SKA_SDP_TPU_IDG_AW_TRIG``): ``fast``
    (default — :func:`_sincos_fast`, at the f32 phase-representation
    floor) or ``exact`` (the hardware transcendental lowering).  The
    ``exact`` PRECISION tier always uses exact trig."""
    t = os.environ.get("SKA_SDP_TPU_IDG_AW_TRIG", "fast")
    return t if t in ("fast", "exact") else "fast"


def _sincos_fast(ph):
    """(sin, cos) pair via Cody-Waite range reduction + order-15/14
    Taylor Horner — ~22 VPU ops per element pair vs the ~105 the
    hardware transcendental lowering measures on v5e (the round-4
    ablation's 3.5 ms/Mvis trig wall; VERDICT r4 #6).

    Accuracy: at |ph| ≤ 110 (the streamed kernels' range: |q·2πdy/S| ≤
    32π plus the small quadratic w term) the max error vs f64 is
    4.5e-6 — the same as the 3.8e-6 error already embedded in
    REPRESENTING the phase in f32, i.e. this is at the input's own
    precision floor, not an approximation tier (measured
    /tmp-prototype, asserted in tests/test_kernels.py).  Larger |ph|
    degrades exactly as the f32 input representation does.
    """
    import math

    f32 = jnp.float32
    k = jnp.round(ph * f32(1.0 / (2.0 * np.pi)))
    c1 = f32(6.28125)                  # 2π split; c1 exact in f32
    c2 = f32(2.0 * np.pi - 6.28125)
    x = ph - k * c1 - k * c2           # |x| ≤ π
    x2 = x * x
    cc = [f32((-1) ** m / math.factorial(2 * m)) for m in range(8)]
    sc = [f32((-1) ** m / math.factorial(2 * m + 1)) for m in range(8)]
    c = cc[-1]
    for a in cc[-2::-1]:
        c = a + x2 * c
    s = sc[-1]
    for a in sc[-2::-1]:
        s = a + x2 * s
    return x * s, c


def _phase_factors(ph_y, ph_x, trig: str):
    """The four phase matrices (ey_re, ey_im, ex_re, ex_im)."""
    if trig == "fast":
        ey_im, ey_re = _sincos_fast(ph_y)
        ex_im, ex_re = _sincos_fast(ph_x)
        return ey_re, ey_im, ex_re, ex_im
    return jnp.cos(ph_y), jnp.sin(ph_y), jnp.cos(ph_x), jnp.sin(ph_x)


def block_run_ranges(starts, ends, n_pad: int, chunk: int):
    """Per-block run index ranges [rs[b], re[b]) for the streamed kernel.

    Runs are contiguous, ordered record segments (``idg_aw_run_records``),
    so the runs intersecting block b = records [b·chunk, (b+1)·chunk) are
    exactly those with ``end > b·chunk`` and ``start < (b+1)·chunk`` —
    two searchsorteds over the (max_runs)-sized CSR, no per-record work.
    Empty CSR tail entries (start == end) are pushed past every block
    edge so both bounds exclude them.
    """
    nblk = n_pad // chunk
    active = ends > starts
    sentinel = jnp.int32(n_pad + 1)
    st_x = jnp.where(active, starts, sentinel)
    en_x = jnp.where(active, ends, sentinel)
    edges = jnp.arange(nblk, dtype=jnp.int32) * chunk
    # compare-all reductions instead of jnp.searchsorted: [nblk,
    # max_runs] bool ops (~20M at the bench shape) beat the gather-based
    # binary search (same finding as _run_csr's two-level inversion)
    rs = jnp.sum(en_x[None, :] <= edges[:, None], axis=1
                 ).astype(jnp.int32)
    re = jnp.sum(st_x[None, :] < (edges + chunk)[:, None], axis=1
                 ).astype(jnp.int32)
    return rs, re


def _dft_factors(S: int, taper_beta: float):
    """Host-side constant factors shared by every streamed kernel: the
    taper-folded DFT matrix F, the lane-interleaving placement factors
    Hr/Hi, the stacked real block form F2 = [[Fre,−Fim],[Fim,Fre]], and
    the de-interleaving selectors Pe/Po (degrid direction)."""
    k = np.arange(S, dtype=np.float64) - S // 2
    F = np.exp(-2j * np.pi * np.outer(k, k) / S) / S
    if taper_beta > 0:
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
    Pe = np.zeros((2 * S, S), np.float32)
    Po = np.zeros((2 * S, S), np.float32)
    Pe[0::2, :] = np.eye(S, dtype=np.float32)
    Po[1::2, :] = np.eye(S, dtype=np.float32)
    return F, Hr, Hi, F2, Pe, Po


def _kernel(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref, rs_ref,
            re_ref, recs_hbm, sr_ref, si_ref, f2_ref, hr_ref,
            hi_ref, out_ref, recs_v, acc, sems, *, S: int, theta: float,
            theta_x: float, chunk: int, tier: str, trig: str):
    C = chunk
    # rows layout ([8, n_pad], single-shot path): per-block strided DMA
    # replaces the prep's pack transpose (VERDICT r4 #3)
    rows_layout = recs_hbm.ndim == 2
    nblk = (recs_hbm.shape[1] // C) if rows_layout else recs_hbm.shape[0]
    f32, bf = jnp.float32, jnp.bfloat16

    out_ref[:] = jnp.zeros_like(out_ref)
    acc[:] = jnp.zeros_like(acc)

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(f32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    two_pi_s = jnp.float32(2.0 * np.pi / S)
    pi_ = jnp.float32(np.pi)
    # segment lane mask compares against the record index modulo C in
    # BOTH halves of the (1, 2C) = [re-lanes | im-lanes] packed axis
    lane2 = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, 2 * C), 1), jnp.int32(C))

    dn = (((1,), (1,)), ((), ()))                  # contract packed lanes
    dn_nt = (((1,), (0,)), ((), ()))

    if tier == "split3":
        def dgr(a, b):
            """Run-finalize dot: 3 bf16-rate passes on hi/lo planes."""
            ah = a.astype(bf)
            al = (a - ah.astype(f32)).astype(bf)
            bh = b.astype(bf)
            bl = (b - bh.astype(f32)).astype(bf)

            def d(x, y):
                return jax.lax.dot_general(
                    x, y, dn_nt, preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT)

            return d(ah, bh) + d(ah, bl) + d(al, bh)
    else:
        def dgr(a, b):
            return jax.lax.dot_general(
                a, b, dn_nt, preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)

    def dma(slot, c):
        if rows_layout:
            return pltpu.make_async_copy(
                recs_hbm.at[:, pl.ds(c * C, C)], recs_v.at[slot],
                sems.at[slot])
        return pltpu.make_async_copy(
            recs_hbm.at[c], recs_v.at[slot], sems.at[slot])

    dma(0, 0).start()

    def finalize(r):
        """Pair screen · sandwich · placement — ``idg_aw_pallas._kernel``
        run epilogue on the stacked accumulator.  The first sandwich
        factor is the pre-stacked real block form F2 = [[Fre,−Fim],
        [Fim,Fre]], so the complex product is ONE logical dot on the
        stacked [t_re; t_im] operand (3 logical dots per finalize
        instead of 6 — dot invocations are latency-bound at these
        shapes, the round-4 ablation's dominant finalize cost)."""
        a_re = acc[0:S, :]
        a_im = acc[S:2 * S, :]
        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2
        p_im = -(r1 * im2 + im1 * r2)              # conjugated
        t2 = jnp.concatenate(
            [a_re * p_re - a_im * p_im,
             a_re * p_im + a_im * p_re], axis=0)   # (2S, S)

        b2 = dgr(f2_ref[:], t2)                    # (2S, S) = [b_re;b_im]
        patch = (dgr(b2[0:S, :], hr_ref[:])
                 + dgr(b2[S:2 * S, :], hi_ref[:]))  # (S, 2S)

        y0 = y0_ref[r]
        x2 = x0_ref[r] * 2
        rr = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - rr, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, 8), (0, _win_w(S) - 2 * S)))
        patch = pltpu.roll(pltpu.roll(patch, rr, 0), rem, 1)
        out_ref[pl.ds(y0a, S + 8), pl.ds(x2a, _win_w(S))] += patch

    def block_body(b, _):
        slot = jax.lax.rem(b, jnp.asarray(2, b.dtype))

        @pl.when(b + 1 < nblk)
        def _():
            dma(1 - slot, b + 1).start()

        dma(slot, b).wait()
        r0 = rs_ref[b]
        r1 = re_ref[b]

        @pl.when(r1 > r0)
        def _():
            dy = recs_v[slot, 0:1, :]
            dx = recs_v[slot, 1:2, :]
            w = recs_v[slot, 2:3, :]
            vr = recs_v[slot, 3:4, :]
            vi = recs_v[slot, 4:5, :]

            ph_y = two_pi_s * cq * dy - pi_ * lq2y * w     # (S, C)
            ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
            ey_re, ey_im, ex_re, ex_im = _phase_factors(ph_y, ph_x, trig)

            u_re = ey_re * vr - ey_im * vi
            u_im = ey_re * vi + ey_im * vr

            # stacked complex operands, built ONCE per block: the four
            # real dots of the complex outer-product sum collapse into
            # one lane contraction; TWO segments share one full-width
            # (2S,2C)×(2S,2C) dot (sublane-stacked masked B planes —
            # halves the dot invocations and fills all 128 MXU output
            # columns; the right half comes back via a lane roll, since
            # lane-slicing at offset S=64 is not lowerable)
            A = jnp.concatenate(
                [jnp.concatenate([u_re, -u_im], axis=1),
                 jnp.concatenate([u_im, u_re], axis=1)], axis=0)
            B = jnp.concatenate([ex_re, ex_im], axis=1)    # (S, 2C)

            if tier == "split3":
                Ah = A.astype(bf)
                Al = (A - Ah.astype(f32)).astype(bf)
                Bh = B.astype(bf)
                Bl = (B - Bh.astype(f32)).astype(bf)

                def pair_dot(lo0, hi0, lo1, hi1):
                    m0 = ((lane2 >= lo0) & (lane2 < hi0)).astype(bf)
                    m1 = ((lane2 >= lo1) & (lane2 < hi1)).astype(bf)
                    b2h = jnp.concatenate([Bh * m0, Bh * m1], axis=0)
                    b2l = jnp.concatenate([Bl * m0, Bl * m1], axis=0)

                    def d(x, y):
                        return jax.lax.dot_general(
                            x, y, dn, preferred_element_type=f32,
                            precision=jax.lax.Precision.DEFAULT)

                    return d(Ah, b2h) + d(Ah, b2l) + d(Al, b2h)
            else:
                def pair_dot(lo0, hi0, lo1, hi1):
                    m0 = ((lane2 >= lo0) & (lane2 < hi0)).astype(f32)
                    m1 = ((lane2 >= lo1) & (lane2 < hi1)).astype(f32)
                    b2 = jnp.concatenate([B * m0, B * m1], axis=0)
                    return jax.lax.dot_general(
                        A, b2, dn, preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)

            def pair_body(j, _):
                r = r0 + 2 * j
                r1b = jnp.minimum(r + 1, r1 - 1)
                v1 = (r + 1) < r1
                lo0 = jnp.maximum(starts_ref[r] - b * C, 0)
                hi0 = jnp.minimum(ends_ref[r] - b * C, C)
                lo1 = jnp.maximum(starts_ref[r1b] - b * C, 0)
                hi1 = jnp.where(v1,
                                jnp.minimum(ends_ref[r1b] - b * C, C),
                                lo1)                       # empty mask
                d = pair_dot(lo0, hi0, lo1, hi1)           # (2S, 2S)
                acc[:] += d[:, 0:S]

                @pl.when(ends_ref[r] <= (b + 1) * C)
                def _():
                    finalize(r)
                    acc[:] = jnp.zeros_like(acc)

                @pl.when(v1)
                def _():
                    acc[:] += pltpu.roll(d, S, 1)[:, 0:S]

                    @pl.when(ends_ref[r1b] <= (b + 1) * C)
                    def _():
                        finalize(r1b)
                        acc[:] = jnp.zeros_like(acc)

                return 0

            jax.lax.fori_loop(0, (r1 - r0 + 1) // 2, pair_body, 0,
                              unroll=False)

        return 0

    jax.lax.fori_loop(0, nblk, block_body, 0, unroll=False)


def idg_aw_grid_from_records_stream(recs, starts, ends, y0, x0, ia1, ia2,
                                    grid_shape, scr_re, scr_im, *,
                                    theta: float, subgrid: int = 64,
                                    taper_beta: float = 12.0,
                                    interpret: bool = False,
                                    chunk: int = CHUNK):
    """Streamed IDG-AW gridding from a pre-sorted run-record stream
    (same contract as ``idg_aw_pallas.idg_aw_grid_from_records`` — the
    sustained multi-channel path swaps ``recs[:, 3:5, :]`` and reuses
    everything else); returns (grid_re, grid_im).

    ``recs`` may be [nblk, 8, C] blocks (the shared sustained contract;
    ``chunk`` is inferred) or the [8, n_pad] rows layout from
    ``idg_aw_run_records(layout="rows")`` — the kernel then DMAs
    per-block strided slices, no pack transpose (single-shot path)."""
    N, Nx = grid_shape
    S = subgrid
    if recs.ndim == 3:
        chunk = recs.shape[2]
        n_pad = recs.shape[0] * chunk
    else:
        n_pad = recs.shape[1]
    HP, WP2 = _geometry(N, Nx, S)
    PADM = S
    tier = _tier()
    trig = "exact" if tier == "exact" else _trig()

    _F, Hr, Hi, F2, _Pe, _Po = _dft_factors(S, taper_beta)

    rs, re = block_run_ranges(starts, ends, n_pad, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # recs [nblk,8,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F2 stacked
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H im
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),       # double-buffered
            pltpu.VMEM((2 * S, S), jnp.float32),          # stacked acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N, chunk=chunk, tier=tier,
                          trig=trig),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, ends, y0, x0, ia1, ia2, rs, re, recs,
      scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
      jnp.asarray(F2, jnp.float32),
      jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32))

    g = out[PADM:PADM + N, 2 * PADM:2 * PADM + 2 * Nx]
    return g[:, 0::2], g[:, 1::2]


def idg_aw_grid_stream(grid_shape, p, a1, a2, w, vis_re, vis_im, scr_re,
                       scr_im, *, theta: float, subgrid: int = 64,
                       support: int = 15, taper_beta: float = 12.0,
                       max_runs: int = 4096, fit_margin: int = 0,
                       chunk: int = CHUNK, interpret: bool = False,
                       ordered: bool = False):
    """Streamed IDG-AW gridding end-to-end (prep + kernel); returns
    (grid_re, grid_im, n_dropped).  Same operator/contract as
    ``idg_aw_pallas.idg_aw_grid_pallas``."""
    recs, starts, ends, y0, x0, ia1, ia2, n_dropped, _ = \
        idg_aw_run_records(
            grid_shape, p, a1, a2, w, vis_re, vis_im, subgrid=subgrid,
            support=support, max_runs=max_runs, fit_margin=fit_margin,
            chunk=chunk, ordered=ordered, nant=scr_re.shape[0],
            layout="rows",
        )
    g_re, g_im = idg_aw_grid_from_records_stream(
        recs, starts, ends, y0, x0, ia1, ia2, grid_shape, scr_re, scr_im,
        theta=theta, subgrid=subgrid, taper_beta=taper_beta,
        interpret=interpret, chunk=chunk,
    )
    return g_re, g_im, n_dropped


def idg_aw_gridder_stream(grid_shape, p, a1, a2, w, vis, screens, *,
                          theta: float, subgrid: int = 64,
                          support: int = 15, taper_beta: float = 12.0,
                          max_runs: int = 4096, fit_margin: int = 0,
                          chunk: int = CHUNK, interpret: bool = False,
                          ordered: bool = False):
    """Complex wrapper matching ``ops.idg_aw.idg_grid_aw``'s signature;
    returns (guv, n_dropped)."""
    g_re, g_im, nd = idg_aw_grid_stream(
        grid_shape, p, a1, a2, w,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        chunk=chunk, interpret=interpret, ordered=ordered,
    )
    return jax.lax.complex(g_re, g_im), nd


# ---------------------------------------------------------------------------
# Streamed DEgridder: the adjoint walk (model predict with A-terms)
# ---------------------------------------------------------------------------


def _degrid_kernel(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref,
                   rs_ref, re_ref, recs_hbm, grid_ref, sr_ref, si_ref,
                   fre_ref, fim_ref, pe_ref, po_ref, out_hbm, recs_v,
                   stage, acc, sems, *, S: int, theta: float,
                   theta_x: float, chunk: int, tier: str, trig: str):
    """Block-major streamed IDG-AW degridding (adjoint of `_kernel`):
    walk the sorted record stream once; when a run STARTS inside a block
    its subgrid image is computed (window read + adjoint sandwich +
    UNconjugated pair screen) into the persistent stacked accumulator;
    every segment contracts the shared per-block phase matrices against
    that accumulator and accumulates its lanes of the block's output
    rows, which are DMA'd out once per block (each block written exactly
    once — the run-major kernel's head/main boundary protocol
    disappears)."""
    C = chunk
    nblk = recs_hbm.shape[0]
    f32, bf = jnp.float32, jnp.bfloat16

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(f32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    two_pi_s = jnp.float32(2.0 * np.pi / S)
    pi_ = jnp.float32(np.pi)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    dn_nt = (((1,), (0,)), ((), ()))
    dn_tn = (((0,), (0,)), ((), ()))

    if tier == "split3":
        def dgr(a, b, dn=dn_nt):
            ah = a.astype(bf)
            al = (a - ah.astype(f32)).astype(bf)
            bh = b.astype(bf)
            bl = (b - bh.astype(f32)).astype(bf)

            def d(x, y):
                return jax.lax.dot_general(
                    x, y, dn, preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT)

            return d(ah, bh) + d(ah, bl) + d(al, bh)
    else:
        def dgr(a, b, dn=dn_nt):
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[c], recs_v.at[slot], sems.at[slot])

    dma_in(0, 0).start()

    def prologue(r):
        """Run subgrid image — window read, de-interleave, adjoint
        sandwich, unconjugated screen — into the stacked acc."""
        y0 = y0_ref[r]
        x2 = x0_ref[r] * 2
        rr = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - rr, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        win = grid_ref[pl.ds(y0a, S + 8), pl.ds(x2a, _win_w(S))]
        win = pltpu.roll(pltpu.roll(win, (S + 8) - rr, 0),
                         _win_w(S) - rem, 1)
        win = win[0:S, 0:2 * S]                            # (S, 2S) re|im
        w_re = dgr(win, pe_ref[:])
        w_im = dgr(win, po_ref[:])

        b_re = dgr(fre_ref[:], w_re, dn_tn) + dgr(fim_ref[:], w_im, dn_tn)
        b_im = dgr(fre_ref[:], w_im, dn_tn) - dgr(fim_ref[:], w_re, dn_tn)
        t_re = dgr(b_re, fre_ref[:]) + dgr(b_im, fim_ref[:])
        t_im = dgr(b_im, fre_ref[:]) - dgr(b_re, fim_ref[:])

        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2                         # UNconjugated
        p_im = r1 * im2 + im1 * r2
        acc[0:S, :] = t_re * p_re - t_im * p_im
        acc[S:2 * S, :] = t_re * p_im + t_im * p_re

    def block_body(b, _):
        slot = jax.lax.rem(b, jnp.asarray(2, b.dtype))

        @pl.when(b + 1 < nblk)
        def _():
            dma_in(1 - slot, b + 1).start()

        dma_in(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            pltpu.make_async_copy(
                stage.at[slot], out_hbm.at[b - 2], sems.at[2 + slot]
            ).wait()

        r0 = rs_ref[b]
        r1 = re_ref[b]

        def block_work():
            dy = recs_v[slot, 0:1, :]
            dx = recs_v[slot, 1:2, :]
            w = recs_v[slot, 2:3, :]
            ph_y = two_pi_s * cq * dy - pi_ * lq2y * w     # (S, C)
            ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
            ey_re, ey_im, ex_re, ex_im = _phase_factors(ph_y, ph_x, trig)

            def seg_body(k, rows):
                rows_re, rows_im = rows
                r = r0 + k

                @pl.when(starts_ref[r] >= b * C)           # run starts here
                def _():
                    prologue(r)

                acc2 = acc[:]                              # (2S, S)
                t1 = dgr(acc2, ex_re)                      # (2S, C)
                t2 = dgr(acc2, ex_im)
                t_re = t1[0:S, :] + t2[S:2 * S, :]
                t_im = t1[S:2 * S, :] - t2[0:S, :]
                v_re = jnp.sum(ey_re * t_re + ey_im * t_im, axis=0,
                               keepdims=True)
                v_im = jnp.sum(ey_re * t_im - ey_im * t_re, axis=0,
                               keepdims=True)
                lo = jnp.maximum(starts_ref[r] - b * C, 0)
                hi = jnp.minimum(ends_ref[r] - b * C, C)
                m = ((lane >= lo) & (lane < hi)).astype(f32)
                return (rows_re + v_re * m, rows_im + v_im * m)

            z0 = jnp.zeros((1, C), f32)
            return jax.lax.fori_loop(0, r1 - r0, seg_body, (z0, z0),
                                     unroll=False)

        # blocks with no runs (pad tail; out-of-band blocks on the
        # banded path, which would otherwise pay K× redundant trig)
        # emit zero rows without touching the phase pipeline
        z = jnp.zeros((1, C), f32)
        rows_re, rows_im = jax.lax.cond(r1 > r0, block_work,
                                        lambda: (z, z))
        stage[slot] = jnp.concatenate(
            [rows_re, rows_im] + [jnp.zeros((6, C), f32)], axis=0)
        pltpu.make_async_copy(
            stage.at[slot], out_hbm.at[b], sems.at[2 + slot]).start()
        return 0

    jax.lax.fori_loop(0, nblk, block_body, 0, unroll=False)

    @pl.when(nblk >= 2)
    def _():
        s0 = jax.lax.rem(jnp.int32(nblk - 2), jnp.int32(2))
        pltpu.make_async_copy(
            stage.at[s0], out_hbm.at[nblk - 2], sems.at[2 + s0]).wait()

    s1 = jax.lax.rem(jnp.int32(nblk - 1), jnp.int32(2))
    pltpu.make_async_copy(
        stage.at[s1], out_hbm.at[nblk - 1], sems.at[2 + s1]).wait()


def idg_aw_degrid_stream(grid_shape, p, a1, a2, w, grid_re, grid_im,
                         scr_re, scr_im, *, theta: float, subgrid: int = 64,
                         support: int = 15, taper_beta: float = 12.0,
                         max_runs: int = 4096, fit_margin: int = 0,
                         chunk: int = CHUNK, interpret: bool = False):
    """Streamed IDG-AW degridding; returns (vis_re, vis_im, n_dropped) —
    same operator as ``ops.idg_aw.idg_degrid_aw`` (the oracle) and the
    run-major ``idg_aw_degrid_pallas``."""
    from .idg_aw_degrid_pallas import idg_aw_degrid_records

    N, Nx = grid_shape
    S = subgrid
    n = p.shape[0]
    recs, starts_ext, y0, x0, ia1, ia2, order_s, use, n_dropped = \
        idg_aw_degrid_records(
            grid_shape, p, a1, a2, w, subgrid=S, support=support,
            max_runs=max_runs, fit_margin=fit_margin, chunk=chunk,
        )
    starts = starts_ext[:max_runs]
    ends = jnp.minimum(starts_ext[1:], jnp.int32(n))
    nblk = recs.shape[0]
    HP, WP2 = _geometry(N, Nx, S)
    PADM = S
    tier = _tier()
    trig = "exact" if tier == "exact" else _trig()

    inter = jnp.stack([grid_re.astype(jnp.float32),
                       grid_im.astype(jnp.float32)], axis=-1
                      ).reshape(N, 2 * Nx)
    gp = jnp.zeros((HP, WP2), jnp.float32)
    gp = jax.lax.dynamic_update_slice(gp, inter, (PADM, 2 * PADM))

    F, _Hr, _Hi, _F2, Pe, Po = _dft_factors(S, taper_beta)

    n_pad = nblk * chunk
    rs, re = block_run_ranges(starts, ends, n_pad, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # recs [nblk,8,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # resident grid
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # P even
            pl.BlockSpec(memory_space=pltpu.VMEM),        # P odd
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),      # [nblk, 8, C]
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),       # record blocks
            pltpu.VMEM((2, 8, chunk), jnp.float32),       # out stage
            pltpu.VMEM((2 * S, S), jnp.float32),          # stacked acc
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    total = pl.pallas_call(
        functools.partial(_degrid_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N, chunk=chunk, tier=tier,
                          trig=trig),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, 8, chunk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, ends, y0, x0, ia1, ia2, rs, re, recs, gp,
      scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
      jnp.asarray(F.real, jnp.float32), jnp.asarray(F.imag, jnp.float32),
      jnp.asarray(Pe), jnp.asarray(Po))

    flat = total[:, 0:2, :].transpose(0, 2, 1).reshape(-1, 2)
    re_s = flat[:n, 0]
    im_s = flat[:n, 1]
    _, re_u, im_u = jax.lax.sort([order_s, re_s, im_s], num_keys=1)
    usef = use.astype(jnp.float32)
    return re_u * usef, im_u * usef, n_dropped


def idg_aw_degridder_stream(grid_shape, p, a1, a2, w, grid, screens, *,
                            theta: float, subgrid: int = 64,
                            support: int = 15, taper_beta: float = 12.0,
                            max_runs: int = 4096, fit_margin: int = 0,
                            chunk: int = CHUNK, interpret: bool = False):
    """Complex wrapper matching ``ops.idg_aw.idg_degrid_aw``'s signature;
    returns (vis, n_dropped)."""
    v_re, v_im, nd = idg_aw_degrid_stream(
        grid_shape, p, a1, a2, w,
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        chunk=chunk, interpret=interpret,
    )
    return jax.lax.complex(v_re, v_im), nd


# ---------------------------------------------------------------------------
# Banded streamed gridding for >VMEM grids (e.g. 4800²-class)
# ---------------------------------------------------------------------------


def _banded_geometry(N: int, Nx: int, S: int, vmem_budget: int):
    """Split the padded accumulator into K row bands that fit VMEM.

    Band k owns runs with ``y0 // Hb == k`` and accumulates rows
    [k·Hb, k·Hb + Hb + S + 8) — a run's placement window (S+8 rows from
    y0 ≤ k·Hb + Hb − 1) always fits, and the trailing S+8 rows overlap-
    add into band k+1's range on assembly.  Returns (HP, WP2, K, Hb,
    band_rows)."""
    HP, WP2 = _geometry(N, Nx, S)
    budget_rows = max((vmem_budget // 2) // (WP2 * 4), 256)
    K = max(1, -(-HP // budget_rows))
    Hb = -(-HP // K)
    Hb = ((Hb + 7) // 8) * 8
    band_rows = ((Hb + S + 8 + 7) // 8) * 8
    return HP, WP2, K, Hb, band_rows


def _banded_run_prep(grid_shape, p, a1, a2, payload, *, n_bands,
                     band_rows_hb, subgrid, chunk, support, max_runs,
                     fit_margin):
    """Shared (band, pair, uv-tile) run prep for the banded >VMEM paths.

    The band id (the run's ``y0 // Hb`` — a pure function of the uv
    tile) is its OWN leading sort key in a 3-key ``lax.sort``: folding
    it into the pair key would alias bands once ``a1 ≥ 2⁷`` (SKA-scale
    arrays have up to 512 stations and ``_record_keys`` admits 2¹⁵).
    Sentinel records (OOB/unfit, pair key 2³⁰) get the virtual band
    ``n_bands`` so they — and the empty CSR tail — sort past every real
    band and the per-band run ranges stay searchsorted-monotone.

    ``payload`` rows (w first, then caller extras) ride the sort.
    Returns (sorted rows [dy, dx, *payload_s], starts, ends,
    y0_local, x0, ia1, ia2, r_lo, r_hi [n_bands], n_dropped, use,
    (HP, WP))."""
    from ..ops.idg_aw import _record_keys
    from .idg_aw_pallas import _run_csr

    (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t,
     HP, WP) = _record_keys(grid_shape, p, a1, a2, subgrid, support,
                            fit_margin)
    S = subgrid
    n = p.shape[0]
    use = valid & fit

    ty = tkey // ntx_t
    y0r = jnp.clip(ty * Tc - (S - Tc) // 2, 0, HP - S)
    band = jnp.minimum(y0r // band_rows_hb, n_bands - 1)
    band = jnp.where(pkey < jnp.int32(2**30), band, jnp.int32(n_bands))

    sorted_ = jax.lax.sort([band, pkey, tkey, dy, dx] + list(payload),
                           num_keys=3, is_stable=True)
    pk_s, tk_s = sorted_[1], sorted_[2]
    rows_s = sorted_[3:]                           # dy, dx, *payload

    starts_ext, starts, ends, y0, x0, ia1, ia2, overflow = _run_csr(
        pk_s, tk_s, n, max_runs, Tc, ntx_t, S, HP, WP
    )
    band_of_run = jnp.minimum(y0 // band_rows_hb, n_bands - 1)
    y0_local = jnp.maximum(y0 - band_of_run * band_rows_hb, 0)

    # per-band contiguous run ranges (sentinel runs decode ia1 = 2^15)
    sent = ia1 >= jnp.int32(2**15)
    band_m = jnp.where((ends > starts) & ~sent, band_of_run,
                       jnp.int32(n_bands))
    karange = jnp.arange(n_bands, dtype=jnp.int32)
    r_lo = jnp.searchsorted(band_m, karange, side="left"
                            ).astype(jnp.int32)
    r_hi = jnp.searchsorted(band_m, karange, side="right"
                            ).astype(jnp.int32)

    placeable_s = pk_s < jnp.int32(2**30)
    n_dropped = (jnp.sum(valid & ~fit)
                 + jnp.sum(overflow & placeable_s)).astype(jnp.int32)
    return (rows_s, starts, ends, y0_local, x0, ia1, ia2, r_lo, r_hi,
            n_dropped, use, (HP, WP))


def _pack_record_rows(rows, n: int, chunk: int):
    """Pad + pack sorted field rows into the [nblk, 8, chunk] record
    stream layout the streamed kernels consume."""
    from .idg_aw_pallas import _align

    f32 = jnp.float32
    n_pad = _align(max(n, 1), chunk)
    zero = jnp.zeros((n_pad - n,), f32)
    out = [jnp.concatenate([r.astype(f32), zero]) for r in rows]
    out += [jnp.zeros((n_pad,), f32)] * (8 - len(out))
    return jnp.stack(out).reshape(8, n_pad // chunk, chunk
                                  ).transpose(1, 0, 2)


def banded_fits(nant: int, subgrid: int = 64) -> bool:
    """Dispatch gate for the banded >VMEM paths: `_banded_geometry`
    budgets HALF the VMEM allowance for the band accumulator, so the
    screens (+ DFT factors + record scratch) must fit the other half —
    a grid too big for residency because of SCREENS (not grid rows)
    cannot be served banded and must fall back to XLA."""
    S = subgrid
    screens = nant * S * 128 * 4 * 2              # lane-padded planes
    mats = 8 * S * 2 * S * 4
    slack = 8 * 1024 * 1024
    return screens + mats + slack <= IDG_AW_VMEM_BUDGET // 2


def idg_aw_run_records_banded(grid_shape, p, a1, a2, w, vis_re, vis_im, *,
                              n_bands: int, band_rows_hb: int,
                              subgrid: int = 64, chunk: int = CHUNK,
                              support: int = 15, max_runs: int = 4096,
                              fit_margin: int = 0):
    """Banded gridding prep (see :func:`_banded_run_prep`); returns the
    ``idg_aw_run_records`` tuple plus per-band run ranges.

    Unlike the resident prep, vis rows need NO use-mask zeroing:
    OOB/unfit records live in sentinel-band runs that no band pass ever
    touches, and overflow records belong to no CSR run so every segment
    lane mask excludes them."""
    f32 = jnp.float32
    (rows_s, starts, ends, y0_loc, x0, ia1, ia2, r_lo, r_hi, n_dropped,
     _use, hw) = _banded_run_prep(
        grid_shape, p, a1, a2,
        [w.astype(f32), vis_re.astype(f32), vis_im.astype(f32)],
        n_bands=n_bands, band_rows_hb=band_rows_hb, subgrid=subgrid,
        chunk=chunk, support=support, max_runs=max_runs,
        fit_margin=fit_margin)
    recs = _pack_record_rows(rows_s, p.shape[0], chunk)
    return (recs, starts, ends, y0_loc, x0, ia1, ia2, r_lo, r_hi,
            n_dropped, hw)


def idg_aw_grid_banded(grid_shape, p, a1, a2, w, vis_re, vis_im, scr_re,
                       scr_im, *, theta: float, subgrid: int = 64,
                       support: int = 15, taper_beta: float = 12.0,
                       max_runs: int = 8192, fit_margin: int = 0,
                       chunk: int = CHUNK, interpret: bool = False,
                       max_runs_band: int = 0):
    """Streamed IDG-AW gridding for grids whose padded accumulator does
    NOT fit VMEM: K row bands, one streamed-kernel pass per band over
    the shared record stream (out-of-band runs emptied per pass — their
    blocks are skipped after the DMA), overlap-added host-side.
    Returns (grid_re, grid_im, n_dropped).  Same operator as the
    resident path; ``tests/test_idg.py`` asserts parity.

    ``max_runs_band`` (VERDICT r4 #4): with 0, every band pass prefetches
    the FULL run tables — ``max_runs`` is then capped by the kernel's
    SMEM envelope (~24K), which dense random-uv tile counts at 4800²
    overflow.  A positive value slices each pass's tables to that
    band's own contiguous run range (one ``dynamic_slice`` per table),
    so ``max_runs`` can cover ANY total tile count while SMEM holds only
    ``max_runs_band`` entries.  Runs past a band's slice are dropped AND
    counted (per-band excess records land in ``n_dropped``); the plain-
    IDG dispatch sizes the cap from the band's static tile count, so
    its drops are provably zero."""
    N, Nx = grid_shape
    S = subgrid
    tier = _tier()
    trig = "exact" if tier == "exact" else _trig()
    HP, WP2, K, Hb, band_rows = _banded_geometry(
        N, Nx, S, IDG_AW_VMEM_BUDGET)

    (recs, starts, ends, y0_loc, x0, ia1, ia2, r_lo, r_hi, n_dropped,
     _hw) = idg_aw_run_records_banded(
        grid_shape, p, a1, a2, w, vis_re, vis_im, n_bands=K,
        band_rows_hb=Hb, subgrid=S, chunk=chunk, support=support,
        max_runs=max_runs, fit_margin=fit_margin,
    )

    _F, Hr, Hi, F2, _Pe, _Po = _dft_factors(S, taper_beta)

    n_pad = recs.shape[0] * chunk
    # full-CSR block ranges once; each band clamps to its contiguous
    # run range (where-masking instead would break the searchsorted
    # monotonicity block_run_ranges relies on)
    rs_full, re_full = block_run_ranges(starts, ends, n_pad, chunk)
    mrb = max_runs_band if 0 < max_runs_band < max_runs else 0
    if mrb:
        # pad so the per-band dynamic_slice never clamps (a clamped
        # start would misalign the rs/re - r_lo indexing)
        nfill = jnp.int32(n_pad)                   # start == end: empty
        starts_p = jnp.concatenate([starts, jnp.full((mrb,), nfill)])
        ends_p = jnp.concatenate([ends, jnp.full((mrb,), nfill)])
        y0_p = jnp.concatenate([y0_loc, jnp.zeros((mrb,), jnp.int32)])
        x0_p = jnp.concatenate([x0, jnp.zeros((mrb,), jnp.int32)])
        i1_p = jnp.concatenate([ia1, jnp.full((mrb,), 2**15, jnp.int32)])
        i2_p = jnp.concatenate([ia2, jnp.zeros((mrb,), jnp.int32)])
        ridx = jnp.arange(max_runs, dtype=jnp.int32)
        reclen = ends - starts
    full = jnp.zeros((HP, WP2), jnp.float32)
    for kb in range(K):
        if mrb:
            lo = r_lo[kb]
            hi = jnp.minimum(r_hi[kb], lo + mrb)
            st_k = jax.lax.dynamic_slice(starts_p, (lo,), (mrb,))
            en_k = jax.lax.dynamic_slice(ends_p, (lo,), (mrb,))
            y0_k = jax.lax.dynamic_slice(y0_p, (lo,), (mrb,))
            x0_k = jax.lax.dynamic_slice(x0_p, (lo,), (mrb,))
            i1_k = jax.lax.dynamic_slice(i1_p, (lo,), (mrb,))
            i2_k = jax.lax.dynamic_slice(i2_p, (lo,), (mrb,))
            rs = jnp.clip(rs_full, lo, hi) - lo
            re = jnp.clip(re_full, lo, hi) - lo
            # runs past the band's slice: dropped AND counted
            n_dropped = n_dropped + jnp.sum(
                jnp.where((ridx >= hi) & (ridx < r_hi[kb]), reclen, 0)
            ).astype(jnp.int32)
        else:
            rs = jnp.clip(rs_full, r_lo[kb], r_hi[kb])
            re = jnp.clip(re_full, r_lo[kb], r_hi[kb])
            st_k, en_k = starts, ends
            y0_k, x0_k, i1_k, i2_k = y0_loc, x0, ia1, ia2

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 8, chunk), jnp.float32),
                pltpu.VMEM((2 * S, S), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        band_out = pl.pallas_call(
            functools.partial(_kernel, S=S, theta=theta,
                              theta_x=theta * Nx / N, chunk=chunk,
                              tier=tier, trig=trig),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((band_rows, WP2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
            ),
            interpret=interpret,
        )(st_k, en_k, y0_k, x0_k, i1_k, i2_k, rs, re, recs,
          scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
          jnp.asarray(F2, jnp.float32),
          jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32))
        lo = kb * Hb
        rows_here = min(band_rows, HP - lo)
        full = jax.lax.dynamic_update_slice(
            full,
            jax.lax.dynamic_slice(full, (lo, 0), (rows_here, WP2))
            + band_out[:rows_here, :],
            (lo, 0),
        )

    PADM = S
    g = full[PADM:PADM + N, 2 * PADM:2 * PADM + 2 * Nx]
    return g[:, 0::2], g[:, 1::2], n_dropped


def idg_aw_gridder_banded(grid_shape, p, a1, a2, w, vis, screens, *,
                          theta: float, subgrid: int = 64,
                          support: int = 15, taper_beta: float = 12.0,
                          max_runs: int = 8192, fit_margin: int = 0,
                          chunk: int = CHUNK, interpret: bool = False,
                          max_runs_band: int = 0):
    """Complex wrapper for the banded >VMEM path, matching
    ``ops.idg_aw.idg_grid_aw``'s signature; returns (guv, n_dropped)."""
    g_re, g_im, nd = idg_aw_grid_banded(
        grid_shape, p, a1, a2, w,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        chunk=chunk, interpret=interpret, max_runs_band=max_runs_band,
    )
    return jax.lax.complex(g_re, g_im), nd


def idg_aw_degrid_banded(grid_shape, p, a1, a2, w, grid_re, grid_im,
                         scr_re, scr_im, *, theta: float,
                         subgrid: int = 64, support: int = 15,
                         taper_beta: float = 12.0, max_runs: int = 8192,
                         fit_margin: int = 0, chunk: int = CHUNK,
                         interpret: bool = False, max_runs_band: int = 0):
    """Banded streamed DEgridding for >VMEM grids: the padded planar
    grid stays in HBM; band k's rows load into VMEM as the kernel input
    and one streamed pass serves the band's runs (out-of-band blocks
    produce zero rows); the K per-block outputs sum elementwise.
    Returns (vis_re, vis_im, n_dropped).

    ``max_runs_band``: as in :func:`idg_aw_grid_banded` — per-band run
    table slicing so ``max_runs`` can exceed the SMEM envelope; records
    of runs past a band's slice predict 0 and are counted."""
    N, Nx = grid_shape
    S = subgrid
    n = p.shape[0]
    tier = _tier()
    trig = "exact" if tier == "exact" else _trig()
    HP, WP2, K, Hb, band_rows = _banded_geometry(
        N, Nx, S, IDG_AW_VMEM_BUDGET)

    # degrid twin of the banded prep: the ORIGINAL index rides the sort
    # (as f32 — exact for n < 2^24) for the epilogue unsort
    f32 = jnp.float32
    (rows_s, starts, ends, y0_loc, x0, ia1, ia2, r_lo, r_hi, n_dropped,
     use, _hw) = _banded_run_prep(
        grid_shape, p, a1, a2,
        [w.astype(f32), jnp.arange(n, dtype=f32)],
        n_bands=K, band_rows_hb=Hb, subgrid=S, chunk=chunk,
        support=support, max_runs=max_runs, fit_margin=fit_margin)
    order_s = rows_s[3].astype(jnp.int32)
    recs = _pack_record_rows(rows_s[:3], n, chunk)
    nblk = recs.shape[0]

    # padded planar grid in HBM; bands slice rows on demand
    inter = jnp.stack([grid_re.astype(f32), grid_im.astype(f32)],
                      axis=-1).reshape(N, 2 * Nx)
    PADM = S
    gp = jnp.zeros((HP + band_rows, WP2), f32)    # slop so slices fit
    gp = jax.lax.dynamic_update_slice(gp, inter, (PADM, 2 * PADM))

    F, _Hr, _Hi, _F2, Pe, Po = _dft_factors(S, taper_beta)

    n_pad = nblk * chunk
    rs_full, re_full = block_run_ranges(starts, ends, n_pad, chunk)
    mrb = max_runs_band if 0 < max_runs_band < max_runs else 0
    if mrb:
        nfill = jnp.int32(n_pad)                   # start == end: empty
        starts_p = jnp.concatenate([starts, jnp.full((mrb,), nfill)])
        ends_p = jnp.concatenate([ends, jnp.full((mrb,), nfill)])
        y0_p = jnp.concatenate([y0_loc, jnp.zeros((mrb,), jnp.int32)])
        x0_p = jnp.concatenate([x0, jnp.zeros((mrb,), jnp.int32)])
        i1_p = jnp.concatenate([ia1, jnp.full((mrb,), 2**15, jnp.int32)])
        i2_p = jnp.concatenate([ia2, jnp.zeros((mrb,), jnp.int32)])
        ridx = jnp.arange(max_runs, dtype=jnp.int32)
        reclen = ends - starts
    total = jnp.zeros((nblk, 8, chunk), f32)
    for kb in range(K):
        if mrb:
            lo = r_lo[kb]
            hi = jnp.minimum(r_hi[kb], lo + mrb)
            st_k = jax.lax.dynamic_slice(starts_p, (lo,), (mrb,))
            en_k = jax.lax.dynamic_slice(ends_p, (lo,), (mrb,))
            y0_k = jax.lax.dynamic_slice(y0_p, (lo,), (mrb,))
            x0_k = jax.lax.dynamic_slice(x0_p, (lo,), (mrb,))
            i1_k = jax.lax.dynamic_slice(i1_p, (lo,), (mrb,))
            i2_k = jax.lax.dynamic_slice(i2_p, (lo,), (mrb,))
            rs = jnp.clip(rs_full, lo, hi) - lo
            re = jnp.clip(re_full, lo, hi) - lo
            n_dropped = n_dropped + jnp.sum(
                jnp.where((ridx >= hi) & (ridx < r_hi[kb]), reclen, 0)
            ).astype(jnp.int32)
        else:
            rs = jnp.clip(rs_full, r_lo[kb], r_hi[kb])
            re = jnp.clip(re_full, r_lo[kb], r_hi[kb])
            st_k, en_k = starts, ends
            y0_k, x0_k, i1_k, i2_k = y0_loc, x0, ia1, ia2
        gband = jax.lax.dynamic_slice(gp, (kb * Hb, 0),
                                      (band_rows, WP2))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, chunk), jnp.float32),
                pltpu.VMEM((2, 8, chunk), jnp.float32),
                pltpu.VMEM((2 * S, S), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        part = pl.pallas_call(
            functools.partial(_degrid_kernel, S=S, theta=theta,
                              theta_x=theta * Nx / N, chunk=chunk,
                              tier=tier, trig=trig),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nblk, 8, chunk), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
            ),
            interpret=interpret,
        )(st_k, en_k, y0_k, x0_k, i1_k, i2_k, rs, re, recs, gband,
          scr_re.astype(f32), scr_im.astype(f32),
          jnp.asarray(F.real, f32), jnp.asarray(F.imag, f32),
          jnp.asarray(Pe), jnp.asarray(Po))
        total = total + part

    flat = total[:, 0:2, :].transpose(0, 2, 1).reshape(-1, 2)
    re_s = flat[:n, 0]
    im_s = flat[:n, 1]
    _, re_u, im_u = jax.lax.sort([order_s, re_s, im_s], num_keys=1)
    usef = use.astype(f32)
    return re_u * usef, im_u * usef, n_dropped


def idg_aw_degridder_banded(grid_shape, p, a1, a2, w, grid, screens, *,
                            theta: float, subgrid: int = 64,
                            support: int = 15, taper_beta: float = 12.0,
                            max_runs: int = 8192, fit_margin: int = 0,
                            chunk: int = CHUNK, interpret: bool = False,
                            max_runs_band: int = 0):
    """Complex wrapper for banded >VMEM degridding; returns
    (vis, n_dropped)."""
    v_re, v_im, nd = idg_aw_degrid_banded(
        grid_shape, p, a1, a2, w,
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        chunk=chunk, interpret=interpret,
    )
    return jax.lax.complex(v_re, v_im), nd
