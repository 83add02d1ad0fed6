"""Pallas TPU kernel: image-domain DEgridding (grid → vis predict).

Completes the IDG mode pair on the hot path (VERDICT r2 #4; the XLA
realization ``ops.idg.idg_degrid_wproj`` remains the oracle).  Exact
adjoint structure of ``idg_pallas``:

* XLA prolog: per-subgrid coarse images via the adjoint DFT sandwich
  ``a = F'ᴴ·W·conj(F')/S²`` (taper folded into F′) — one batched MXU
  einsum over all subgrid windows;
* records are sorted by subgrid id (ONE fused multi-operand ``lax.sort``
  carrying the original index as payload — measured ~7 ms/Mvis of true
  device time, BENCH.md round 3);
* Pallas grid walks subgrids; per record block the phase matrices
  ``E_y``/``E_x`` are built vectorized over the 128 lanes (exactly the
  gridder's rank-1 broadcasts), and each visibility is the conjugate
  contraction ``v_b = Σ_q conj(E_y[q,b]) · (A·conj(E_x))[q,b]`` — four
  (S, S)×(S, C) MXU matmuls per chunk + a sublane tree-reduce;
* per-record (re, im) rows stream out per BLOCK.  A boundary block is
  shared by two neighbouring subgrid programs, so each program writes its
  FIRST block's masked rows to a per-program ``head`` output and streams
  its remaining full blocks to ``main`` via double-buffered DMA; the XLA
  epilogue segment-sums heads onto their blocks and unsorts with one
  key-payload sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.ops
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.idg import _dft_matrix, _overlap_windows, kaiser_taper
from .idg_pallas import CHUNK, _align


def _kernel(starts_ref, recs_hbm, asub_ref, out_main, out_head,
            recs_v, stage, sems, *, S: int, theta: float, theta_x: float):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(jnp.float32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    b_lo = start // CHUNK
    nblocks = jnp.where(end > start, (end - 1) // CHUNK - b_lo + 1, 0)

    a_re = asub_ref[0, 0]
    a_im = asub_ref[0, 1]

    def dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[b_lo + c], recs_v.at[slot], sems.at[slot]
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

        @pl.when(c + 1 < nblocks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()

        # previous output DMA into the reused stage slot must have drained
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
        ph_y = two_pi_s * cq * dy - pi_ * lq2y * w     # (S, CHUNK)
        ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
        ey_re = jnp.cos(ph_y)
        ey_im = jnp.sin(ph_y)
        ex_re = jnp.cos(ph_x)
        ex_im = jnp.sin(ph_x)

        dn = (((1,), (0,)), ((), ()))                  # a[q,r] · Ex*[r,b]
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        t_re = (
            jax.lax.dot_general(a_re, ex_re, dn, preferred_element_type=f32,
                                precision=hp)
            + jax.lax.dot_general(a_im, ex_im, dn, preferred_element_type=f32,
                                  precision=hp)
        )
        t_im = (
            jax.lax.dot_general(a_im, ex_re, dn, preferred_element_type=f32,
                                precision=hp)
            - jax.lax.dot_general(a_re, ex_im, dn, preferred_element_type=f32,
                                  precision=hp)
        )
        # v_b = Σ_q conj(Ey)[q,b] · T[q,b]
        v_re = jnp.sum(ey_re * t_re + ey_im * t_im, axis=0, keepdims=True)
        v_im = jnp.sum(ey_re * t_im - ey_im * t_re, axis=0, keepdims=True)
        rows = jnp.concatenate(
            [v_re * ok, v_im * ok] + [jnp.zeros_like(v_re)] * 6, axis=0
        )                                              # (8, CHUNK)

        @pl.when(c == 0)
        def _():
            out_head[0] = rows                         # masked boundary part

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

    # drain the last (up to two) in-flight output DMAs before the next
    # program reuses the stage buffers
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


def _prep_with_order(N, Nx, S, T, PADM, nty, ntx, p, w, support):
    """Sort records by subgrid id, carrying the original index — the
    degrid twin of ``idg_pallas._prep`` (no vis payload, order instead)."""
    n_sub = nty * ntx
    s = support
    yc = jnp.floor(N // 2 + p[:, 1] * N + 0.5).astype(jnp.int32)
    xc = jnp.floor(Nx // 2 + p[:, 0] * Nx + 0.5).astype(jnp.int32)
    y0 = yc - s // 2
    x0 = xc - s // 2
    valid = (y0 > -s) & (y0 < N) & (x0 > -s) & (x0 < Nx)
    y0p = jnp.where(valid, y0 + PADM, 0)
    x0p = jnp.where(valid, x0 + PADM, 0)
    gy = y0p // T
    gx = x0p // T
    t = jnp.where(valid, gy * ntx + gx, n_sub).astype(jnp.int32)

    fN = jnp.float32(N)
    fNx = jnp.float32(Nx)
    dy = (N // 2 + p[:, 1] * fN + PADM) - (gy * T + S // 2).astype(p.dtype)
    dx = (Nx // 2 + p[:, 0] * fNx + PADM) - (gx * T + S // 2).astype(p.dtype)

    n = t.shape[0]
    t_s, dy_s, dx_s, w_s, order = jax.lax.sort(
        [t, dy.astype(jnp.float32), dx.astype(jnp.float32),
         w.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)],
        num_keys=1,
    )
    n_pad = _align(max(n, 1), CHUNK)
    zero = jnp.zeros((n_pad - n,), jnp.float32)
    rows = [jnp.concatenate([r, zero]) for r in (dy_s, dx_s, w_s)]
    rows += [jnp.zeros((n_pad,), jnp.float32)] * 5
    recs = jnp.stack(rows).reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)
    starts = jnp.searchsorted(t_s, jnp.arange(n_sub + 1)).astype(jnp.int32)
    return recs, starts, order, valid


def idg_degrid_wproj_pallas(grid_shape, p, w, grid, *, theta: float,
                            subgrid: int = 64, support: int = 15,
                            taper_beta: float = 12.0,
                            interpret: bool = False):
    """IDG degridding on TPU — same contract as ``ops.idg.idg_degrid_wproj``
    (grid [H, W] complex in — non-square supported — [n] complex
    visibilities out, OOB → 0)."""
    N, Nx = grid_shape
    S = subgrid
    T = S // 2
    assert support <= T + 1
    PADM = T
    nty = -(-(N + 2 * PADM) // T) + 1
    ntx = -(-(Nx + 2 * PADM) // T) + 1
    n_sub = nty * ntx
    n = p.shape[0]
    cdt = grid.dtype

    recs, starts, order, valid = _prep_with_order(
        N, Nx, S, T, PADM, nty, ntx, p, w, support
    )
    nblk = recs.shape[0]

    # ---- XLA prolog: adjoint-sandwich subgrid images (taper in F)
    gp = jnp.zeros(((nty + 1) * T, (ntx + 1) * T), cdt)
    gp = gp.at[PADM:PADM + N, PADM:PADM + Nx].set(grid)
    wins = _overlap_windows(gp, nty, S, T, ntx).reshape(n_sub, S, S)
    F = _dft_matrix(S, cdt)
    if taper_beta > 0:
        t1 = kaiser_taper(S, taper_beta, jnp.float32)
        F = F * t1[None, :].astype(cdt)
    Fc = jnp.conj(F)
    a_sub = jnp.einsum("qy,syx,xr->sqr", jnp.conj(F).T, wins, Fc,
                       preferred_element_type=cdt,
                       precision=jax.lax.Precision.HIGHEST) / (S * S)
    asub_planes = jnp.stack(
        [jnp.real(a_sub), jnp.imag(a_sub)], axis=1
    ).astype(jnp.float32)                              # [n_sub, 2, S, S]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # recs [nblk, 8, C]
            pl.BlockSpec((1, 2, S, S), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),    # subgrid image planes
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # main [nblk, 8, C]
            pl.BlockSpec((1, 8, CHUNK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),    # head [n_sub, 8, C]
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),   # record blocks
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),   # out stage
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    main, head = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 8, CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, asub_planes)

    # ---- epilogue: head rows land on each program's first block; blocks
    # never written by any program (fully within a head) must not carry
    # main's uninitialized garbage, so main contributes only where some
    # program streamed it (c > 0 ⇒ block has a single exclusive owner).
    b_lo = starts[:-1] // CHUNK
    # block b carries valid MAIN rows iff some program streamed it at
    # c > 0, i.e. the block edge b·CHUNK falls strictly inside a program's
    # record range (ranges are contiguous: end_t = start_{t+1})
    blk_edges = jnp.arange(nblk, dtype=jnp.int32) * CHUNK
    # start < b*CHUNK < end  ⇔  searchsorted placement of blk_edges
    t_of_edge = jnp.searchsorted(starts[1:], blk_edges, side="right")
    t_of_edge = jnp.minimum(t_of_edge, n_sub - 1)
    covered = (starts[t_of_edge] < blk_edges) & (
        starts[t_of_edge + 1] > blk_edges
    )
    # uninitialized main blocks can hold NaN — select, don't multiply
    main = jnp.where(covered[:, None, None], main, 0.0)

    head_sum = jax.ops.segment_sum(head, b_lo, num_segments=nblk)
    total = main + head_sum                            # [nblk, 8, C]

    flat = total[:, 0:2, :].transpose(0, 2, 1).reshape(-1, 2)  # [n_pad, 2]
    re_s = flat[:n, 0]
    im_s = flat[:n, 1]
    _, re_u, im_u = jax.lax.sort([order, re_s, im_s], num_keys=1)
    out = jax.lax.complex(re_u, im_u).astype(cdt)
    return jnp.where(valid, out, 0)
