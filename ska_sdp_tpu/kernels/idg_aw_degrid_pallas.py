"""Pallas TPU kernel: IDG-AW DEgridding — model predict with antenna
terms on the hot path.

Exact adjoint structure of ``idg_aw_pallas`` (the XLA realization
``ops.idg_aw.idg_degrid_aw`` remains the oracle; same (pair, uv-tile)
run geometry, so the two compute the same operator):

* records sort into (pair, tile) runs carrying their ORIGINAL index as
  payload (the degrid twin of ``idg_aw_run_records``);
* the WHOLE padded uv-grid lives in VMEM interleaved (re|im lane pairs,
  the resident layout) as an INPUT; per run the (S, 2S) window at the
  run's tile-derived origin is read back through the inverse of the
  placement pipeline — one aligned (S+8, 2S+128) read + two
  ``pltpu.roll`` + a static slice — and de-interleaved to planar re/im
  by two selection matmuls (MXU, the adjoint of the gridder's
  interleaving H factors);
* the window is adjoint-DFT-sandwiched to the run's coarse image
  (taper folded into F), multiplied ONCE by the UNconjugated pair
  screen ``A[a1]·A[a2]`` (the adjoint of the forward's conjugated
  multiply);
* per record block the conjugate phase contraction produces the
  visibilities (four (S, S)×(S, C) matmuls + a sublane reduce — the
  ``idg_degrid_pallas`` inner loop), streamed out per block with the
  head/main boundary-block protocol and segment-summed + unsorted in
  the XLA epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.ops
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.idg_aw import _record_keys
from .idg_aw_pallas import (CHUNK, IDG_AW_VMEM_BUDGET, _align, _geometry,
                            _run_csr, _win_w)


def idg_aw_degrid_records(grid_shape, p, a1, a2, w, *, subgrid: int = 64,
                          chunk: int = CHUNK, support: int = 15,
                          max_runs: int = 4096, fit_margin: int = 0):
    """(pair, tile)-run sort carrying the original index (degrid twin of
    ``idg_aw_run_records``).  Returns (recs [nblk, 8, C] with rows
    dy/dx/w, starts_ext [max_runs+1], y0, x0, ia1, ia2 [max_runs],
    order_s [n], use [n] original-order output mask, n_dropped)."""
    (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t,
     HP, WP) = _record_keys(grid_shape, p, a1, a2, subgrid, support,
                            fit_margin)
    S = subgrid
    n = p.shape[0]
    f32 = jnp.float32

    pk_s, tk_s, dy_s, dx_s, w_s, order_s = jax.lax.sort(
        [pkey, tkey, dy, dx, w.astype(f32),
         jnp.arange(n, dtype=jnp.int32)],
        num_keys=2, is_stable=True,
    )
    starts_ext, starts, ends, y0, x0, ia1, ia2, overflow = _run_csr(
        pk_s, tk_s, n, max_runs, Tc, ntx_t, S, HP, WP
    )
    # disjoint by construction (sentinel-keyed unfit records; see
    # ops.idg_aw._record_keys)
    placeable_s = pk_s < jnp.int32(2**30)
    n_dropped = (jnp.sum(valid & ~fit)
                 + jnp.sum(overflow & placeable_s)).astype(jnp.int32)
    use = valid & fit

    n_pad = _align(max(n, 1), chunk)
    zero = jnp.zeros((n_pad - n,), f32)
    rows = [jnp.concatenate([r, zero]) for r in (dy_s, dx_s, w_s)]
    rows += [jnp.zeros((n_pad,), f32)] * 5
    recs = jnp.stack(rows).reshape(8, n_pad // chunk, chunk
                                   ).transpose(1, 0, 2)
    return recs, starts_ext, y0, x0, ia1, ia2, order_s, use, n_dropped


def _kernel(starts_ref, ends_ref, y0_ref, x0_ref, a1_ref, a2_ref,
            recs_hbm, grid_ref, sr_ref, si_ref, fre_ref, fim_ref,
            pe_ref, po_ref, out_main, out_head,
            recs_v, stage, a_re, a_im, sems, *, S: int, theta: float,
            theta_x: float):
    r = pl.program_id(0)
    start = starts_ref[r]
    end = ends_ref[r]

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(jnp.float32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    b_lo = start // CHUNK
    nblocks = jnp.where(end > start, (end - 1) // CHUNK - b_lo + 1, 0)

    def dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[b_lo + c], recs_v.at[slot], sems.at[slot]
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

        # ---- run window: aligned read + inverse rolls + de-interleave
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
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        dn_nt = (((1,), (0,)), ((), ()))
        w_re = jax.lax.dot_general(win, pe_ref[:], dn_nt,
                                   preferred_element_type=f32, precision=hp)
        w_im = jax.lax.dot_general(win, po_ref[:], dn_nt,
                                   preferred_element_type=f32, precision=hp)

        # ---- adjoint sandwich a = F'ᴴ·W·conj(F') (1/S² inside F) and
        # the UNconjugated pair screen (adjoint of the forward multiply)
        dn_tn = (((0,), (0,)), ((), ()))                   # Fᵀ-side first
        b_re = (
            jax.lax.dot_general(fre_ref[:], w_re, dn_tn,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(fim_ref[:], w_im, dn_tn,
                                  preferred_element_type=f32, precision=hp)
        )
        b_im = (
            jax.lax.dot_general(fre_ref[:], w_im, dn_tn,
                                preferred_element_type=f32, precision=hp)
            - jax.lax.dot_general(fim_ref[:], w_re, dn_tn,
                                  preferred_element_type=f32, precision=hp)
        )
        # · conj(F): contract F's dim 0 (x) — the taper-folded F is NOT
        # symmetric, so dim-1 contraction would taper the wrong axis
        dn_x0 = (((1,), (0,)), ((), ()))
        t_re = (
            jax.lax.dot_general(b_re, fre_ref[:], dn_x0,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(b_im, fim_ref[:], dn_x0,
                                  preferred_element_type=f32, precision=hp)
        )
        t_im = (
            jax.lax.dot_general(b_im, fre_ref[:], dn_x0,
                                preferred_element_type=f32, precision=hp)
            - jax.lax.dot_general(b_re, fim_ref[:], dn_x0,
                                  preferred_element_type=f32, precision=hp)
        )
        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[r], nant - 1)
        i2 = jnp.minimum(a2_ref[r], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2                         # UNconjugated
        p_im = r1 * im2 + im1 * r2
        a_re[:] = t_re * p_re - t_im * p_im
        a_im[:] = t_re * p_im + t_im * p_re

    def chunk_body(c, _):
        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

        @pl.when(c + 1 < nblocks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()

        @pl.when(c >= 3)
        def _():
            pltpu.make_async_copy(
                stage.at[slot], out_main.at[b_lo + c - 2], sems.at[2 + slot]
            ).wait()

        b = b_lo + c
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        ok = ((lane >= lo) & (lane < hi)).astype(jnp.float32)

        dy = recs_v[slot, 0:1, :]
        dx = recs_v[slot, 1:2, :]
        w = recs_v[slot, 2:3, :]

        two_pi_s = jnp.float32(2.0 * np.pi / S)
        pi_ = jnp.float32(np.pi)
        ph_y = two_pi_s * cq * dy - pi_ * lq2y * w         # (S, CHUNK)
        ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
        ey_re = jnp.cos(ph_y)
        ey_im = jnp.sin(ph_y)
        ex_re = jnp.cos(ph_x)
        ex_im = jnp.sin(ph_x)

        dn = (((1,), (0,)), ((), ()))                      # a[q,r]·Ex*[r,b]
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        t_re = (
            jax.lax.dot_general(a_re[:], ex_re, dn,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(a_im[:], ex_im, dn,
                                  preferred_element_type=f32, precision=hp)
        )
        t_im = (
            jax.lax.dot_general(a_im[:], ex_re, dn,
                                preferred_element_type=f32, precision=hp)
            - jax.lax.dot_general(a_re[:], ex_im, dn,
                                  preferred_element_type=f32, precision=hp)
        )
        v_re = jnp.sum(ey_re * t_re + ey_im * t_im, axis=0, keepdims=True)
        v_im = jnp.sum(ey_re * t_im - ey_im * t_re, axis=0, keepdims=True)
        rows = jnp.concatenate(
            [v_re * ok, v_im * ok] + [jnp.zeros_like(v_re)] * 6, axis=0
        )                                                  # (8, CHUNK)

        @pl.when(c == 0)
        def _():
            out_head[0] = rows

        @pl.when(c > 0)
        def _():
            stage[slot] = rows
            pltpu.make_async_copy(
                stage.at[slot], out_main.at[b], sems.at[2 + slot]
            ).start()

        return 0

    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

    @pl.when(nblocks == 0)
    def _():
        out_head[0] = jnp.zeros_like(out_head[0])

    @pl.when(nblocks >= 3)
    def _():
        s0 = jax.lax.rem(nblocks - 2, jnp.int32(2))
        pltpu.make_async_copy(
            stage.at[s0], out_main.at[b_lo + nblocks - 2], sems.at[2 + s0]
        ).wait()

    @pl.when(nblocks >= 2)
    def _():
        s1 = jax.lax.rem(nblocks - 1, jnp.int32(2))
        pltpu.make_async_copy(
            stage.at[s1], out_main.at[b_lo + nblocks - 1], sems.at[2 + s1]
        ).wait()


def idg_aw_degrid_pallas(grid_shape, p, a1, a2, w, grid_re, grid_im,
                         scr_re, scr_im, *, theta: float, subgrid: int = 64,
                         support: int = 15, taper_beta: float = 12.0,
                         max_runs: int = 4096, fit_margin: int = 0,
                         interpret: bool = False):
    """IDG-AW degridding on TPU; returns (vis_re, vis_im, n_dropped) —
    same operator as ``ops.idg_aw.idg_degrid_aw`` (the oracle).

    Dispatches to the round-4 streamed (block-major) degridder by
    default (bit-identical at the exact tier; ``idg_aw_stream_pallas``
    documents the design); ``SKA_SDP_TPU_IDG_AW_KERNEL=run`` pins this
    module's run-major kernel."""
    import os as _os

    if _os.environ.get("SKA_SDP_TPU_IDG_AW_KERNEL", "stream") != "run":
        from .idg_aw_stream_pallas import idg_aw_degrid_stream

        return idg_aw_degrid_stream(
            grid_shape, p, a1, a2, w, grid_re, grid_im, scr_re, scr_im,
            theta=theta, subgrid=subgrid, support=support,
            taper_beta=taper_beta, max_runs=max_runs,
            fit_margin=fit_margin, interpret=interpret,
        )
    N, Nx = grid_shape
    S = subgrid
    n = p.shape[0]
    recs, starts_ext, y0, x0, ia1, ia2, order_s, use, n_dropped = \
        idg_aw_degrid_records(
            grid_shape, p, a1, a2, w, subgrid=S, support=support,
            max_runs=max_runs, fit_margin=fit_margin,
        )
    starts = starts_ext[:max_runs]
    ends = jnp.minimum(starts_ext[1:], jnp.int32(n))
    nblk = recs.shape[0]
    HP, WP2 = _geometry(N, Nx, S)
    PADM = S

    # resident interleaved grid (re|im lane pairs at the padded offset)
    inter = jnp.stack([grid_re.astype(jnp.float32),
                       grid_im.astype(jnp.float32)], axis=-1
                      ).reshape(N, 2 * Nx)
    gp = jnp.zeros((HP, WP2), jnp.float32)
    gp = jax.lax.dynamic_update_slice(gp, inter, (PADM, 2 * PADM))

    # DFT factor with taper folded (1/S per factor) + the de-interleave
    # selection matrices (adjoint of the gridder's H interleavers)
    k = np.arange(S, dtype=np.float64) - S // 2
    F = np.exp(-2j * np.pi * np.outer(k, k) / S) / S
    if taper_beta > 0:
        x_ = k / (S / 2)
        t1 = np.i0(taper_beta * np.sqrt(np.clip(1.0 - x_ * x_, 0.0, 1.0)))
        F = F * (t1 / np.i0(taper_beta))[None, :]
    Pe = np.zeros((2 * S, S), np.float32)
    Po = np.zeros((2 * S, S), np.float32)
    Pe[0::2, :] = np.eye(S, dtype=np.float32)
    Po[1::2, :] = np.eye(S, dtype=np.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(max_runs,),
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
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # main [nblk,8,C]
            pl.BlockSpec((1, 8, CHUNK), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),        # head
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),       # record blocks
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),       # out stage
            pltpu.VMEM((S, S), jnp.float32),              # a_re
            pltpu.VMEM((S, S), jnp.float32),              # a_im
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    main, head = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((max_runs, 8, CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, ends, y0, x0, ia1, ia2, recs, gp,
      scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
      jnp.asarray(F.real, jnp.float32), jnp.asarray(F.imag, jnp.float32),
      jnp.asarray(Pe), jnp.asarray(Po))

    # ---- epilogue (idg_degrid_pallas protocol): head rows land on each
    # run's first block; main blocks count only where a run streamed them
    # at c > 0 (block edge strictly inside the run's record range)
    b_lo = starts // CHUNK
    blk_edges = jnp.arange(nblk, dtype=jnp.int32) * CHUNK
    r_of_edge = jnp.searchsorted(starts_ext[1:], blk_edges, side="right")
    r_of_edge = jnp.minimum(r_of_edge, max_runs - 1)
    covered = (starts_ext[r_of_edge] < blk_edges) & (
        starts_ext[r_of_edge + 1] > blk_edges
    )
    main = jnp.where(covered[:, None, None], main, 0.0)

    head_sum = jax.ops.segment_sum(head, jnp.minimum(b_lo, nblk - 1),
                                   num_segments=nblk)
    total = main + head_sum                                # [nblk, 8, C]

    flat = total[:, 0:2, :].transpose(0, 2, 1).reshape(-1, 2)
    re_s = flat[:n, 0]
    im_s = flat[:n, 1]
    _, re_u, im_u = jax.lax.sort([order_s, re_s, im_s], num_keys=1)
    usef = use.astype(jnp.float32)
    return re_u * usef, im_u * usef, n_dropped


def idg_aw_degridder_pallas(grid_shape, p, a1, a2, w, grid, screens, *,
                            theta: float, subgrid: int = 64,
                            support: int = 15, taper_beta: float = 12.0,
                            max_runs: int = 4096, fit_margin: int = 0,
                            interpret: bool = False):
    """Complex wrapper matching ``ops.idg_aw.idg_degrid_aw``'s signature;
    returns (vis, n_dropped)."""
    v_re, v_im, nd = idg_aw_degrid_pallas(
        grid_shape, p, a1, a2, w,
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        interpret=interpret,
    )
    return jax.lax.complex(v_re, v_im), nd
