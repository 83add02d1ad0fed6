"""Pallas TPU kernel: tile-batched w-projection degridding (grid→vis).

Degridding is the exact linear adjoint of the scatter gridder — per
visibility, gather the kernel-support window from the uv-grid and reduce
against the conjugated oversampled kernel tap plane
(``ops.gridding.degrid_wproj``; absent from the reference, required for
grid/degrid round-trips).  XLA lowers the window gather to a serialized
dynamic-slice loop, so the hot path reuses the gridder's tile machinery
(``wproj_pallas``) in the transpose direction:

1. **Bin & sort (jnp):** identical record stream to the gridder, but each
   (tile, record-block) range is padded to whole DMA blocks (gather-based,
   see ``_preprocess``) so a block never straddles two tiles and the kernel
   runs branch-free.
2. **Tile walk (Pallas):** the grid axis walks tiles; each tile's halo'd
   window arrives in VMEM via the Pallas input pipeline (overlapping
   windows are pre-assembled densely in XLA — the inverse of the gridder's
   halo fold).  Records stream HBM→SMEM per block.
3. **Per record:** one aligned (24, 256) dynamic window read, two reverse
   rolls (undoing the gridder's placement), an interleaved product against
   the A/B tap planes (re/im in lanes: ``Σ win·A[k]`` is Re, ``Σ win·B[k]``
   is Im of ``Σ grid·conj(K)``), and a 4-step sublane reduction; the
   (1, 60) lane-partials are staged per block and DMA'd out.
4. **Epilogue (jnp):** dense lane reduction, unsort back to visibility
   order, zero fully-out-of-bounds records (OOB window reads hit the
   zeroed halo, matching the XLA path's OOB→0 gather semantics).

Shares tile geometry constants with ``wproj_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.coords import frac_coords
from .wproj_pallas import (CHUNK, PAD, PADX, TX, TY, _align, _geometry,
                           _interleave_bank)

UNROLL = 16


def _kernel(starts_ref, recs_hbm, tile_ref, bank_a_ref, bank_b_ref,
            out_hbm, recs_s, stage, sems, *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)
    SW = _align(2 * gw + 127, 128)
    nk = bank_a_ref.shape[0]

    b_lo = start // CHUNK               # starts are CHUNK-aligned
    nblocks = (end - start) // CHUNK

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[b_lo + c], recs_s.at[slot], sems.at[slot]
        )

    @pl.when(nblocks > 0)
    def _():
        in_dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

        @pl.when(c + 1 < nblocks)
        def _():
            in_dma(1 - slot, c + 1).start()

        in_dma(slot, c).wait()
        b = b_lo + c

        # the previous chunk's output DMA must have drained before its
        # stage buffer is reused
        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(
                stage.at[slot], out_hbm.at[b - 2], sems.at[2 + slot]
            ).wait()

        def _one(u):
            code = recs_s[slot, 0, u].astype(jnp.int32)
            y0 = code // 512
            x0 = code - y0 * 512
            k = recs_s[slot, 1, u].astype(jnp.int32)
            k = jnp.minimum(k, jnp.int32(nk - 1))
            r = jax.lax.rem(y0, jnp.int32(8))
            x2 = x0 * 2
            rem = jax.lax.rem(x2, jnp.int32(128))
            y0a = pl.multiple_of(y0 - r, 8)
            x2a = pl.multiple_of(x2 - rem, 128)
            win = tile_ref[0, pl.ds(y0a, SH), pl.ds(x2a, SW)]
            # undo the gridder's placement rolls
            win = pltpu.roll(win, jnp.int32(SW) - rem, 1)
            win = pltpu.roll(win, jnp.int32(SH) - r, 0)
            w = win[:gh, :2 * gw]
            pa = w * bank_a_ref[k]
            pb = w * bank_b_ref[k]
            # sublane tree-reduce (gh<=16) → (1, 2*gw) lane partials
            ra = jnp.sum(pa, axis=0, keepdims=True)
            rb = jnp.sum(pb, axis=0, keepdims=True)
            return ra, rb

        def body(iu, _):
            # group UNROLL records; store their 2·UNROLL partial rows as one
            # 8-sublane-aligned block (dynamic sublane offsets must be
            # multiples of 8)
            rows = []
            for j in range(UNROLL):
                ra, rb = _one(iu * UNROLL + j)
                rows.append(ra)
                rows.append(rb)
            blockv = jnp.concatenate(rows, axis=0)   # (2*UNROLL, 2*gw)
            off = pl.multiple_of(iu * (2 * UNROLL), 8)
            stage[slot, pl.ds(off, 2 * UNROLL), : 2 * gw] = blockv
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0, unroll=False)

        pltpu.make_async_copy(
            stage.at[slot], out_hbm.at[b], sems.at[2 + slot]
        ).start()
        return 0

    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

    # drain the last (up to two) output DMAs before the next grid program
    # reuses the stage buffers
    @pl.when(nblocks >= 2)
    def _():
        s0 = jax.lax.rem(nblocks - 2, jnp.int32(2))
        pltpu.make_async_copy(
            stage.at[s0], out_hbm.at[b_lo + nblocks - 2], sems.at[2 + s0]
        ).wait()

    @pl.when(nblocks >= 1)
    def _():
        s1 = jax.lax.rem(nblocks - 1, jnp.int32(2))
        pltpu.make_async_copy(
            stage.at[s1], out_hbm.at[b_lo + nblocks - 1], sems.at[2 + s1]
        ).wait()


def _assemble_tiles(gp, nty: int, ntx: int):
    """Overlapping halo'd windows from the padded interleaved grid.

    Inverse of the gridder's ``_fold_tiles``: four dense strided slices.
    gp: [(nty+1)·TY, (ntx+1)·TXs] with TXs = 2·TX; returns
    [nty·ntx, TY+PAD, TXs+PADXs].
    """
    TXs, PADXs = 2 * TX, 2 * PADX
    rows = gp.reshape(nty + 1, TY, (ntx + 1) * TXs)

    def cols(block):  # block: [nty, TY|PAD, (ntx+1)·TXs]
        c = block.reshape(block.shape[0], block.shape[1], ntx + 1, TXs)
        core = c[:, :, :ntx, :]
        right = c[:, :, 1:, :PADXs]
        return jnp.concatenate([core, right], axis=-1)  # [..., ntx, TXs+PADXs]

    top = cols(rows[:nty])                       # [nty, TY, ntx, W']
    bot = cols(rows[1:, :PAD])                   # [nty, PAD, ntx, W']
    tiles = jnp.concatenate([top, bot], axis=1)  # [nty, TY+PAD, ntx, W']
    return tiles.transpose(0, 2, 1, 3).reshape(
        nty * ntx, TY + PAD, TXs + PADXs
    )


def _preprocess(grid_shape, qpx, gh, gw, p, wbin):
    """Record stream with CHUNK-aligned per-tile ranges (gather-padded).

    Returns (recs [nblk,8,CHUNK], tile starts, geometry, slot_of_sorted,
    order, valid) — the last three drive the dense unsort epilogue.
    """
    H, W = grid_shape
    Hp, Wp, nty, ntx = _geometry(H, W)
    ntiles = nty * ntx

    x, xf, y, yf = frac_coords((H, W), qpx, p)
    y0 = y - gh // 2
    x0 = x - gw // 2
    valid = (y0 > -gh) & (y0 < H) & (x0 > -gw) & (x0 < W)
    y0p = jnp.where(valid, y0 + PAD, 0)
    x0p = jnp.where(valid, x0 + PAD, 0)
    kidx = wbin * (qpx * qpx) + yf * qpx + xf

    ty = y0p // TY
    tx = x0p // TX
    t = jnp.where(valid, ty * ntx + tx, ntiles).astype(jnp.int32)

    # one fused multi-operand sort, with the original index as a payload
    # (an argsort + per-field gathers costs ~8 ms per 1M-element gather on
    # v5e — random access runs ~30M elem/s — and dominated this step)
    n = t.shape[0]
    # (ly, lx) packed into one f32-exact code (ly<144, lx<384 ⇒ 17 bits
    # < f32's 24-bit mantissa) — each padded-record field below costs one
    # ~9 ms n_pad-sized gather, so fewer fields is a direct win
    code = ((y0p - ty * TY) * 512 + (x0p - tx * TX)).astype(jnp.float32)
    t_s, r_code, r_k, order = jax.lax.sort(
        [t, code, kidx.astype(jnp.float32),
         jnp.arange(n, dtype=jnp.int32)],
        num_keys=1,
    )
    recs = jnp.stack([r_code, r_k])  # [2, n]

    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    counts_pad = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    starts_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts_pad).astype(jnp.int32)]
    )
    n_pad = _align(max(n, 1), CHUNK) + ntiles * CHUNK

    # per-slot tile id / range lookups via boundary-scatter + cumsum —
    # searchsorted over n_pad and any sub-128-minor-dim gather run 15-50×
    # below HBM bandwidth on TPU (BENCH.md), so neither is used here
    def spread(vals_at_tile_starts):
        buf = jnp.zeros((n_pad,), jnp.int32)
        deltas = vals_at_tile_starts - jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), vals_at_tile_starts[:-1]]
        )
        buf = buf.at[starts_pad[:-1]].add(deltas)
        return jnp.cumsum(buf)

    j = jnp.arange(n_pad, dtype=jnp.int32)
    starts_pad_j = spread(starts_pad[:-1])
    starts_j = spread(starts[:-1])
    counts_j = spread(counts)
    local = j - starts_pad_j
    ok = local < counts_j
    src = jnp.where(ok, starts_j + local, 0)
    okf = ok.astype(jnp.float32)
    recs_p = jnp.stack(
        [recs[0][src] * okf, recs[1][src] * okf]
        + [jnp.zeros((n_pad,), jnp.float32)] * 6
    )
    recs_p = recs_p.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    # padded slot of each sorted record — per-record tile values via the
    # same boundary-scatter+cumsum trick (gathers from even tiny tables
    # still pay the ~30M elem/s random-access rate)
    def spread_n(vals):
        buf = jnp.zeros((n,), jnp.int32)
        deltas = vals - jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), vals[:-1]]
        )
        buf = buf.at[starts[:-1]].add(deltas, mode="drop")
        return jnp.cumsum(buf)

    starts_at = spread_n(starts[:-1])
    startspad_at = spread_n(starts_pad[:-1])
    slot_of_sorted = jnp.clip(
        startspad_at + (jnp.arange(n, dtype=jnp.int32) - starts_at),
        0, n_pad - 1,
    )
    return recs_p, starts_pad, (Hp, Wp, nty, ntx), slot_of_sorted, order, valid


def wproj_degrid_planes(bank_re, bank_im, grid_re, grid_im, p, wbin,
                        interpret: bool = False):
    """Tile-batched degridding; real/imag planes in and out.

    Args:
      bank_re/bank_im: [nw, qpx, qpx, gh, gw] float32 kernel bank planes
        (RAW bank — the kernel applies the conjugate, matching
        ``ops.degrid_wproj``).
      grid_re/grid_im: [H, W] float32 uv-grid planes.
      p: [n, 3] scaled baselines; wbin: [n] int32.
    Returns:
      (vis_re, vis_im) [n] float32 predicted visibilities.
    """
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PADX
    H, W = grid_re.shape
    n = p.shape[0]
    recs, starts, (Hp, Wp, nty, ntx), slot, order, valid = _preprocess(
        (H, W), qpx, gh, gw, p, wbin
    )
    ntiles = nty * ntx
    nblk = recs.shape[0]
    TYP, TXP2 = TY + PAD, 2 * (TX + PADX)

    # padded interleaved grid + overlapping tile windows
    TXs = 2 * TX
    gp = jnp.zeros(((nty + 1) * TY, (ntx + 1) * TXs), jnp.float32)
    inter = jnp.stack([grid_re, grid_im], axis=-1).reshape(H, 2 * W)
    gp = gp.at[PAD:PAD + H, 2 * PAD:2 * PAD + 2 * W].set(inter)
    tiles = _assemble_tiles(gp, nty, ntx)

    bank_a, bank_b = _interleave_bank(
        bank_re.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
        bank_im.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # recs [nblk, 8, C]
            pl.BlockSpec((1, TYP, TXP2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),   # tile window
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank A
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank B
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # partials [nblk,2C,128]
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, CHUNK), jnp.float32),        # double-buffered in
            pltpu.VMEM((2, 2 * CHUNK, 128), jnp.float32),  # double-buffered out
            pltpu.SemaphoreType.DMA((4,)),                 # 2 in + 2 out
        ],
    )

    (out,) = pl.pallas_call(
        functools.partial(_kernel, gh=gh, gw=gw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblk, 2 * CHUNK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, tiles.reshape(ntiles, TYP, TXP2), bank_a, bank_b)

    # dense epilogue: lane reduce, select slots, unsort (one multi-operand
    # sort keyed by the original index — cheaper than argsort + gathers),
    # zero invalid
    partial = jnp.sum(out[:, :, :2 * gw], axis=-1).reshape(-1)  # [nblk·2C]
    re_s = partial[2 * slot]
    im_s = partial[2 * slot + 1]
    _, re_u, im_u = jax.lax.sort([order, re_s, im_s], num_keys=1)
    vis_re = jnp.where(valid, re_u, 0.0)
    vis_im = jnp.where(valid, im_u, 0.0)
    return vis_re, vis_im


def wproj_degridder_pallas(bank, grid, p, wbin, interpret: bool = False):
    """Complex-API wrapper matching ``ops.degrid_wproj``."""
    vr, vi = wproj_degrid_planes(
        jnp.real(bank).astype(jnp.float32),
        jnp.imag(bank).astype(jnp.float32),
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        p,
        wbin,
        interpret=interpret,
    )
    return jax.lax.complex(vr, vi)
