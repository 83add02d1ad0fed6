"""Pallas TPU kernel: IDG-AW — (pair, uv-tile) run walking, A-screens,
resident-grid placement.

The TPU realization of ``ops.idg_aw.idg_grid_aw`` (the XLA path is the
oracle).  Records are grouped into RUNS sharing one antenna pair and one
coarse uv tile (the tile fixes the subgrid origin as a pure function of
its id — ``ops/idg_aw.py`` documents the geometry); one grid program
walks one run, exactly like ``idg_pallas`` walks fixed subgrids:

* ONE fused stable multi-operand ``lax.sort`` (keys pair, tile) orders
  the record stream; no padded-slot arrays, no per-slot gathers — the
  v1 chunk-padded prep materialized ~4·n slots and its gathers cost
  ~300 ms/Mvis, 7× the kernel itself (measured round 3);
* per run, CHUNK-record blocks stream HBM→VMEM double-buffered; block
  boundaries shared with neighbouring runs are neutralized by zeroing
  the visibility lanes outside [start, end) (two vector selects);
* the visibility-weighted outer-product sum runs as four (S, C)×(C, S)
  MXU matmuls per block — identical inner loop to ``idg_pallas``;
* after the block loop the run's subgrid image is multiplied ONCE by the
  conjugated pair screen ``conj(A[a1]·A[a2])`` (two dynamic VMEM row
  gathers + one elementwise complex multiply — the whole AW surcharge
  over plain IDG), the taper is folded into the DFT factor, and the
  second sandwich factor is pre-interleaved so the (S, 2S) uv patch
  emerges in the resident grid's re|im lane layout straight off the MXU;
* the patch lands at the run's tile-derived origin in the WHOLE padded
  uv-grid resident in VMEM (``wproj_resident_pallas`` placement: pad →
  two ``pltpu.roll`` → one aligned read-modify-write) — origins are
  per-run dynamic, so the fixed-tiling overlap-add fold does not apply.

VMEM: resident padded grid (~53 MB at 2400², S=64) + screens
(nant·S·S·8 B) + DFT factors; ``idg_aw_resident_fits`` gates dispatch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.idg_aw import _record_keys, auto_fit_margin
from .wproj_pallas import _align

CHUNK = 256

# VMEM budget (measured ~112 MB live works on v5e; leave slack for Mosaic)
IDG_AW_VMEM_BUDGET = 100 * 1024 * 1024


def _win_w(S: int) -> int:
    """Placement/read window lane width: the interleaved (S, 2S) patch
    plus up-to-127 lanes of roll slop, rounded up to a whole lane tile
    (256 at S=32/64, 384 at S=128)."""
    return _align(2 * S + 128, 128)


def _geometry(N: int, Nx: int, S: int):
    """Resident padded accumulator (rows, interleaved lanes) for subgrid
    placement: margin S each side (run origins are clipped to
    [0, N+2S-S]) + roll slop (8 sublanes / the window's lane slack).
    Identical to the round-4 S=64 geometry at S=64 (``_win_w(64)−2S`` is
    exactly the former +128 constant)."""
    HP = _align(N + 2 * S, 8) + 8
    WP2 = _align(2 * (Nx + 2 * S) + (_win_w(S) - 2 * S), 128)
    return HP, WP2


# streamed/banded/run-major kernel subgrid envelope (VERDICT r4 #8):
# the kernels are S-generic; these are the sizes with verified window
# geometry + TPU lowering (S=32's (2S,2S) pair-dot output and 192-lane
# patch sit below one lane tile — padded, lowerable; S=128 is 3 tiles).
STREAM_SUBGRIDS = (32, 64, 128)


def idg_aw_resident_fits(N: int, Nx: int, nant: int, S: int = 64) -> bool:
    if S not in STREAM_SUBGRIDS:
        return False          # window/roll geometry verified for these S
    HP, WP2 = _geometry(N, Nx, S)
    acc = HP * WP2 * 4
    screens = nant * S * 128 * 4 * 2          # lane-padded to 128
    mats = 6 * S * 2 * S * 4
    slack = 8 * 1024 * 1024
    return acc + screens + mats + slack <= IDG_AW_VMEM_BUDGET


def _run_csr(pk_s, tk_s, n: int, max_runs: int, Tc: int, ntx_t: int,
             S: int, HP: int, WP: int):
    """Run boundaries → extended CSR + per-run scalars from the sorted
    key streams (one scatter-min; runs are contiguous in sorted order)."""
    new_run = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         ((pk_s[1:] != pk_s[:-1])
          | (tk_s[1:] != tk_s[:-1])).astype(jnp.int32)]
    )
    run_id = jnp.cumsum(new_run) - 1
    overflow = run_id >= max_runs
    # run_id is sorted (cumsum of a 0/1 mask), so the extended CSR is an
    # inversion of a monotone step function.  jnp.searchsorted's binary
    # search gathers into the 1M array and measured 3.5 ms/Mvis on v5e —
    # HALF the remaining prep (round-5 probe_ss_prep) — and a 1M scatter-
    # min is ~10 ms (round 3).  Two-level inversion instead: block heads
    # (stride-256 slice) locate each query's block by a compare-all
    # reduction ([Q, B] ≈ 20M bool ops), one contiguous row gather pulls
    # the block, and an in-row count finishes — exact, ~0.04 ms.
    q = jnp.arange(max_runs + 1, dtype=jnp.int32)
    Cb = 256
    m = ((n + Cb - 1) // Cb) * Cb
    rid2 = jnp.concatenate(
        [run_id, jnp.full((m - n,), jnp.iinfo(jnp.int32).max, jnp.int32)]
    ).reshape(m // Cb, Cb)
    cb = jnp.sum(rid2[None, :, 0] < q[:, None], axis=1).astype(jnp.int32)
    blk = jnp.maximum(cb - 1, 0)
    g = rid2[blk]                                   # [Q, Cb] row gather
    pos = jnp.sum(g < q[:, None], axis=1).astype(jnp.int32)
    starts_ext = blk * Cb + pos
    starts = starts_ext[:max_runs]
    ends = jnp.minimum(starts_ext[1:], jnp.int32(n))

    f = jnp.minimum(starts, n - 1)
    tk_run = tk_s[f]
    ty_r = tk_run // ntx_t
    tx_r = tk_run - ty_r * ntx_t
    y0 = jnp.clip(ty_r * Tc - (S - Tc) // 2, 0, HP - S)
    x0 = jnp.clip(tx_r * Tc - (S - Tc) // 2, 0, WP - S)
    pk_run = pk_s[f]
    ia1 = pk_run // jnp.int32(2**15)
    ia2 = pk_run - ia1 * jnp.int32(2**15)
    return starts_ext, starts, ends, y0, x0, ia1, ia2, overflow


def idg_aw_run_records(grid_shape, p, a1, a2, w, vis_re, vis_im, *,
                       subgrid: int = 64, chunk: int = CHUNK,
                       support: int = 15, max_runs: int = 4096,
                       fit_margin: int = 0, ordered: bool = False,
                       nant: int = 0, layout: str = "blocks"):
    """Sort records into (pair, uv-tile) runs for the run-walking kernel.

    One fused stable ``lax.sort`` (keys: pair, tile) + vector ops — no
    padded slots.  Same tile geometry as ``ops.idg_aw._chunk_pair_runs``
    (origins are a pure function of the tile id), so the Pallas kernel
    computes the same operator as the XLA oracle.

    ``ordered=True`` skips the sort entirely (the ~7 ms/Mvis single-shot
    surcharge, VERDICT r3 #4): the run CSR only needs records sharing a
    (pair, uv-tile) to be CONTIGUOUS, not globally sorted, so a
    pair-major stream — real track data transposed from the file's
    [ntime, nbl] layout, one cheap relayout — needs no comparison sort.
    The mode is correct for ANY input order (each maximal contiguous
    same-key segment becomes its own run); a poorly-ordered stream just
    overflows ``max_runs`` and the surplus is counted in ``n_dropped``,
    so callers opt in only when they know the layout.

    ``nant > 0`` (the screen count — callers that have it should pass
    it) enables the FUSED single-key sort when ``nant²·ntile < 2³⁰``:
    (pair, tile) collapse into one int32 key ``(a1·nant + a2)·ntile +
    tile``, cutting the comparison network from two keys to one
    (measured −0.7 ms/Mvis on v5e; VERDICT r4 #3).  The fused key is
    order-equivalent to the (pkey, tkey) pair (both monotone lexi-
    graphic in (a1, a2, tile)), so the permutation — and therefore the
    operator — is IDENTICAL; a1/a2 ≥ nant are clamped exactly like the
    kernel's screen-row clamp.

    ``layout="rows"`` returns ``recs`` as the [8, n_pad] row-major plane
    stack instead of [nblk, 8, C] blocks — the streamed kernels DMA
    per-block strided slices directly, skipping the pack transpose
    (single-shot path; the sustained/spectral contracts keep "blocks").

    Returns (recs [nblk, 8, C] or [8, n_pad], starts, ends, y0, x0,
    ia1, ia2 [max_runs], n_dropped, (HP, WP) padded planar geometry).
    """
    (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t,
     HP, WP) = _record_keys(grid_shape, p, a1, a2, subgrid, support,
                            fit_margin)
    N, Nx = grid_shape
    S = subgrid
    n = p.shape[0]
    f32 = jnp.float32
    use = valid & fit
    vr = jnp.where(use, vis_re, 0.0).astype(f32)
    vi = jnp.where(use, vis_im, 0.0).astype(f32)

    # static tile-count bound for the fused key (HP/WP/Tc are static)
    ntile = (((HP - 1) // Tc) + 1) * ntx_t
    fused_ok = nant > 0 and nant * nant * ntile < 2**30
    if ordered:
        pk_s, tk_s = pkey, tkey
        dy_s, dx_s, w_s = dy, dx, w.astype(f32)
        vr_s, vi_s = vr, vi
    elif fused_ok:
        # single-key fused sort (see docstring); clamped pair ids match
        # the kernel's screen-row clamp semantics
        c1 = jnp.minimum(a1.astype(jnp.int32), nant - 1)
        c2 = jnp.minimum(a2.astype(jnp.int32), nant - 1)
        fused = jnp.where(use, (c1 * nant + c2) * ntile + tkey,
                          jnp.int32(2**30))
        fused_s, dy_s, dx_s, w_s, vr_s, vi_s = jax.lax.sort(
            [fused, dy, dx, w.astype(f32), vr, vi],
            num_keys=1, is_stable=True,
        )
        # reconstruct the (pkey, tkey) streams the CSR consumes; the
        # sentinel survives (its decoded tile is garbage, but sentinel
        # runs carry zeroed vis rows — identical to the 2-key path)
        pid_s = fused_s // ntile
        i1_s = pid_s // nant
        i2_s = pid_s - i1_s * nant
        sent = fused_s >= jnp.int32(2**30)
        pk_s = jnp.where(sent, jnp.int32(2**30),
                         i1_s * jnp.int32(2**15) + i2_s)
        tk_s = fused_s - pid_s * ntile
    else:
        # 7-operand fused stable sort — a1/a2 are recovered from the pair
        # key per RUN (max_runs-sized gathers), not carried per record
        pk_s, tk_s, dy_s, dx_s, w_s, vr_s, vi_s = jax.lax.sort(
            [pkey, tkey, dy, dx, w.astype(f32), vr, vi],
            num_keys=2, is_stable=True,
        )

    starts_ext, starts, ends, y0, x0, ia1, ia2, overflow = _run_csr(
        pk_s, tk_s, n, max_runs, Tc, ntx_t, S, HP, WP
    )
    # disjoint by construction: unfit records carry the sentinel key, so
    # the overflow term (placeable keys only) never re-counts them
    placeable_s = pk_s < jnp.int32(2**30)
    n_dropped = (jnp.sum(valid & ~fit)
                 + jnp.sum(overflow & placeable_s)).astype(jnp.int32)

    n_pad = _align(max(n, 1), chunk)
    zero = jnp.zeros((n_pad - n,), f32)
    rows = [jnp.concatenate([r, zero]) for r in
            (dy_s, dx_s, w_s, vr_s, vi_s)]
    rows += [jnp.zeros((n_pad,), f32)] * 3
    if layout == "rows":
        recs = jnp.stack(rows)                     # [8, n_pad]
    else:
        recs = jnp.stack(rows).reshape(8, n_pad // chunk, chunk
                                       ).transpose(1, 0, 2)
    return recs, starts, ends, y0, x0, ia1, ia2, n_dropped, (HP, WP)


def idg_aw_run_records_multi(grid_shape, p, a1, a2, w, vis_re_mc,
                             vis_im_mc, *, subgrid: int = 64,
                             chunk: int = CHUNK, support: int = 15,
                             max_runs: int = 4096, fit_margin: int = 0,
                             drift_cells: int = 0, ordered: bool = False):
    """Multi-channel (pair, uv-tile) run sorting: bin ONCE at the
    reference channel, update records per channel elementwise.

    ``p``/``w`` are at the REFERENCE channel (a channel group's center
    frequency); ``vis_re_mc``/``vis_im_mc`` are [nch, n] — every
    channel's (weighted, mirrored) planes ride the ONE fused stable sort,
    so per-channel data needs no unsort gather.  Channel geometry is the
    elementwise map dy_c = r·dy + (r−1)·cy (cy = tile-center offset from
    the grid center, carried per record), w_c = r·w, r = f_c/f_ref.

    ``drift_cells`` shrinks the BINNING margin (and with it the tile
    side) so the per-channel recheck at the full taper margin has that
    many cells of slack: records within ``fit_margin − drift_cells`` of
    their tile center at f_ref stay within ``fit_margin`` at every
    channel with |r−1|·extent ≤ drift_cells (the driver plans channel
    groups to satisfy exactly this).

    Returns (base [6, n_pad] rows (dy, dx, w, cy, cx, live), vis_s
    [nch, 2, n_pad], starts, ends, y0, x0, ia1, ia2, n_dropped_base,
    (HP, WP)).
    """
    S = subgrid
    s = support
    margin_full = fit_margin if fit_margin > 0 else auto_fit_margin(S, s)
    margin_bin = margin_full - drift_cells
    assert margin_bin > 0, "drift_cells leaves no binning margin"
    (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t,
     HP, WP) = _record_keys(grid_shape, p, a1, a2, subgrid, support,
                            margin_bin)
    n = p.shape[0]
    f32 = jnp.float32
    use = valid & fit
    nch = vis_re_mc.shape[0]
    # per-record tile-center offset from the grid center (the (r−1) term)
    N, Nx = grid_shape
    PADM = S
    ty = tkey // ntx_t
    tx = tkey - ty * ntx_t
    y0r = jnp.clip(ty * Tc - (S - Tc) // 2, 0, HP - S)
    x0r = jnp.clip(tx * Tc - (S - Tc) // 2, 0, WP - S)
    cy = (y0r + S // 2 - N // 2 - PADM).astype(f32)
    cx = (x0r + S // 2 - Nx // 2 - PADM).astype(f32)

    vrows = []
    for c in range(nch):
        vrows.append(jnp.where(use, vis_re_mc[c], 0.0).astype(f32))
        vrows.append(jnp.where(use, vis_im_mc[c], 0.0).astype(f32))
    if ordered:
        # pair-major stream: runs are already contiguous — no sort (see
        # idg_aw_run_records; with 2·nch vis rows riding the sort, the
        # saving scales with the channel count)
        sorted_ = [pkey, tkey, dy, dx, w.astype(f32), cy, cx] + vrows
    else:
        sorted_ = jax.lax.sort(
            [pkey, tkey, dy, dx, w.astype(f32), cy, cx] + vrows,
            num_keys=2, is_stable=True,
        )
    pk_s, tk_s = sorted_[0], sorted_[1]

    starts_ext, starts, ends, y0, x0, ia1, ia2, overflow = _run_csr(
        pk_s, tk_s, n, max_runs, Tc, ntx_t, S, HP, WP
    )
    placeable_s = pk_s < jnp.int32(2**30)
    n_dropped_base = (jnp.sum(valid & ~fit)
                      + jnp.sum(overflow & placeable_s)).astype(jnp.int32)
    live = (placeable_s & ~overflow).astype(f32)

    n_pad = _align(max(n, 1), chunk)
    zero = jnp.zeros((n_pad - n,), f32)
    base = jnp.stack([jnp.concatenate([r, zero]) for r in
                      (sorted_[2], sorted_[3], sorted_[4], sorted_[5],
                       sorted_[6], live)])
    vis_s = jnp.stack([jnp.concatenate([r, zero]) for r in sorted_[7:]]
                      ).reshape(nch, 2, n_pad)
    return (base, vis_s, starts, ends, y0, x0, ia1, ia2, n_dropped_base,
            (HP, WP))


def idg_aw_records_for_channel(base, vis_c, ratio, *, subgrid: int = 64,
                               support: int = 15, fit_margin: int = 0,
                               chunk: int = CHUNK):
    """Per-channel IDG-AW record update (elementwise — no sort).

    ``base``/``vis_c`` from :func:`idg_aw_run_records_multi` (``vis_c``
    is this channel's [2, n_pad] slice); ``ratio`` = f_c/f_ref traced.
    The recheck re-validates the FULL taper margin at the channel's own
    coordinates; failures are zeroed and counted (zero when the channel
    group honored the drift plan).  Returns (recs [nblk, 8, CHUNK],
    n_masked).
    """
    S = subgrid
    margin_full = (fit_margin if fit_margin > 0
                   else auto_fit_margin(S, support))
    f32 = jnp.float32
    r = jnp.asarray(ratio, f32)
    dy, dx, w, cy, cx, live = (base[i] for i in range(6))
    dy_c = r * dy + (r - 1.0) * cy
    dx_c = r * dx + (r - 1.0) * cx
    w_c = r * w
    m = f32(margin_full)
    ok = ((jnp.abs(dy_c) <= m) & (jnp.abs(dx_c) <= m))
    okf = ok.astype(f32)
    n_masked = jnp.sum(live * (1.0 - okf)).astype(jnp.int32)
    rows = [dy_c, dx_c, w_c, vis_c[0] * okf, vis_c[1] * okf]
    n_pad = dy.shape[0]
    rows += [jnp.zeros((n_pad,), f32)] * 3
    recs = jnp.stack(rows).reshape(8, n_pad // chunk, chunk
                                   ).transpose(1, 0, 2)
    return recs, n_masked


def _kernel(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref,
            recs_hbm, sr_ref, si_ref, fre_ref, fim_ref, hr_ref, hi_ref,
            out_ref, recs_v, a_re, a_im, sems, *, S: int, theta: float,
            theta_x: float):
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
        b_lo = start // CHUNK
        nblocks = (end - 1) // CHUNK - b_lo + 1

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
            lo = jnp.maximum(start - b * CHUNK, 0)
            hi = jnp.minimum(end - b * CHUNK, CHUNK)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            okm = ((lane >= lo) & (lane < hi)).astype(jnp.float32)

            dy = recs_v[slot, 0:1, :]
            dx = recs_v[slot, 1:2, :]
            w = recs_v[slot, 2:3, :]
            vr = recs_v[slot, 3:4, :] * okm
            vi = recs_v[slot, 4:5, :] * okm

            two_pi_s = jnp.float32(2.0 * np.pi / S)
            pi_ = jnp.float32(np.pi)
            ph_y = two_pi_s * cq * dy - pi_ * lq2y * w     # (S, CHUNK)
            ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
            ey_re = jnp.cos(ph_y)
            ey_im = jnp.sin(ph_y)
            ex_re = jnp.cos(ph_x)
            ex_im = jnp.sin(ph_x)

            u_re = ey_re * vr - ey_im * vi
            u_im = ey_re * vi + ey_im * vr

            dn = (((1,), (1,)), ((), ()))                  # contract lanes
            f32 = jnp.float32
            hp = jax.lax.Precision.HIGHEST
            a_re[:] += (
                jax.lax.dot_general(u_re, ex_re, dn,
                                    preferred_element_type=f32, precision=hp)
                - jax.lax.dot_general(u_im, ex_im, dn,
                                      preferred_element_type=f32,
                                      precision=hp)
            )
            a_im[:] += (
                jax.lax.dot_general(u_re, ex_im, dn,
                                    preferred_element_type=f32, precision=hp)
                + jax.lax.dot_general(u_im, ex_re, dn,
                                      preferred_element_type=f32,
                                      precision=hp)
            )
            return 0

        jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

        # pair screen: conj(A[a1] · A[a2]) — the whole AW surcharge
        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2
        p_im = -(r1 * im2 + im1 * r2)                      # conjugated
        t_re = a_re[:] * p_re - a_im[:] * p_im
        t_im = a_re[:] * p_im + a_im[:] * p_re

        # sandwich: b = F·a' (taper folded into F); the interleaving
        # factors H emit the patch as re|im lane pairs straight off MXU
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        dn_nt = (((1,), (0,)), ((), ()))
        b_re = (
            jax.lax.dot_general(fre_ref[:], t_re, dn_nt,
                                preferred_element_type=f32, precision=hp)
            - jax.lax.dot_general(fim_ref[:], t_im, dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )
        b_im = (
            jax.lax.dot_general(fre_ref[:], t_im, dn_nt,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(fim_ref[:], t_re, dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )
        patch = (
            jax.lax.dot_general(b_re, hr_ref[:], dn_nt,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(b_im, hi_ref[:], dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )                                                   # (S, 2S)

        y0 = y0_ref[r]
        x2 = x0_ref[r] * 2
        rr = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - rr, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, 8), (0, _win_w(S) - 2 * S)))
        patch = pltpu.roll(pltpu.roll(patch, rr, 0), rem, 1)
        out_ref[pl.ds(y0a, S + 8), pl.ds(x2a, _win_w(S))] += patch


def idg_aw_grid_pallas(grid_shape, p, a1, a2, w, vis_re, vis_im, scr_re,
                       scr_im, *, theta: float, subgrid: int = 64,
                       support: int = 15, taper_beta: float = 12.0,
                       max_runs: int = 4096, fit_margin: int = 0,
                       interpret: bool = False, ordered: bool = False):
    """IDG-AW gridding on TPU; returns (grid_re, grid_im, n_dropped).

    Same operator as ``ops.idg_aw.idg_grid_aw`` (the oracle — identical
    tile geometry): ``scr_re/im`` are the UNconjugated [nant, S, S]
    screens from ``aw_screens`` split into planes; the dirty image must
    be divided by ``taper_fine``.  ``ordered`` as in
    :func:`idg_aw_run_records` (skip the sort for pair-major streams).
    """
    # the streamed kernel accepts the transpose-free rows layout; the
    # run-major kernel (env pin) keeps the blocks contract
    stream = os.environ.get("SKA_SDP_TPU_IDG_AW_KERNEL", "stream") != "run"
    recs, starts, ends, y0, x0, ia1, ia2, n_dropped, _ = \
        idg_aw_run_records(
            grid_shape, p, a1, a2, w, vis_re, vis_im, subgrid=subgrid,
            support=support, max_runs=max_runs, fit_margin=fit_margin,
            ordered=ordered, nant=scr_re.shape[0],
            layout="rows" if stream else "blocks",
        )
    g_re, g_im = idg_aw_grid_from_records(
        recs, starts, ends, y0, x0, ia1, ia2, grid_shape, scr_re, scr_im,
        theta=theta, subgrid=subgrid, taper_beta=taper_beta,
        interpret=interpret,
    )
    return g_re, g_im, n_dropped


def idg_aw_grid_from_records(recs, starts, ends, y0, x0, ia1, ia2,
                             grid_shape, scr_re, scr_im, *, theta: float,
                             subgrid: int = 64, taper_beta: float = 12.0,
                             interpret: bool = False):
    """IDG-AW gridding from a pre-sorted run-record stream (see
    :func:`idg_aw_run_records`); returns (grid_re, grid_im).

    Exposed separately so multi-channel runs amortize the record sort:
    channels sharing uvw/pairs reuse the runs and swap only the vis rows
    (``recs[:, 3:5, :]``) — the same sustained-mode contract as
    ``idg_pallas.idg_grid_from_records``.

    Dispatches to the round-4 streamed (block-major) kernel by default —
    measured 68.9M vs 45.3M vis/s sustained on v5e at the bench shape
    (``idg_aw_stream_pallas`` documents the design and its split3
    default tier); ``SKA_SDP_TPU_IDG_AW_KERNEL=run`` pins this module's
    run-major kernel (always at HIGHEST precision).
    """
    if os.environ.get("SKA_SDP_TPU_IDG_AW_KERNEL", "stream") != "run":
        from .idg_aw_stream_pallas import idg_aw_grid_from_records_stream

        return idg_aw_grid_from_records_stream(
            recs, starts, ends, y0, x0, ia1, ia2, grid_shape, scr_re,
            scr_im, theta=theta, subgrid=subgrid, taper_beta=taper_beta,
            interpret=interpret,
        )
    N, Nx = grid_shape
    S = subgrid
    HP, WP2 = _geometry(N, Nx, S)
    PADM = S

    # DFT factor with taper folded (1/S per factor ⇒ 1/S² total) and the
    # lane-interleaving second factors H (patch[y, 2j|2j+1] = re|im)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(int(starts.shape[0]),),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # recs [nblk,8,C]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H im
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),       # double-buffered
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, ends, y0, x0, ia1, ia2, recs,
      scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
      jnp.asarray(F.real, jnp.float32), jnp.asarray(F.imag, jnp.float32),
      jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32))

    g = out[PADM:PADM + N, 2 * PADM:2 * PADM + 2 * Nx]
    return g[:, 0::2], g[:, 1::2]


def idg_aw_gridder_pallas(grid_shape, p, a1, a2, w, vis, screens, *,
                          theta: float, subgrid: int = 64,
                          support: int = 15, taper_beta: float = 12.0,
                          max_runs: int = 4096, fit_margin: int = 0,
                          interpret: bool = False, chunk: int = CHUNK,
                          ordered: bool = False):
    """Complex wrapper matching ``ops.idg_aw.idg_grid_aw``'s signature;
    returns (guv, n_dropped)."""
    g_re, g_im, nd = idg_aw_grid_pallas(
        grid_shape, p, a1, a2, w,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        interpret=interpret, ordered=ordered,
    )
    return jax.lax.complex(g_re, g_im), nd
