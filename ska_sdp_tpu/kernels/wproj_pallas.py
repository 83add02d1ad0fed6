"""Pallas TPU kernel: tile-privatized w-projection scatter-add.

The reference's hot loop is a combining ``permute (+)`` scatter of
kernel-weighted visibility patches onto the uv-grid
(``/root/reference/src/Gridding.hs:199-244``).  TPUs have no efficient
global atomics and XLA's scatter-add lowers to a serialized loop (measured
58.8K vis/s on v5e — see bench history).  This kernel restructures the
computation TPU-first:

1. **Bin & sort (jnp, on-device):** each visibility's patch is assigned to
   the grid tile containing its top-left corner; visibilities are sorted by
   tile id and CSR tile offsets are computed with ``searchsorted``.
2. **Tile privatization (Pallas):** the kernel walks tiles (the Pallas grid
   axis); each tile's accumulator lives in VMEM — a (TY+PAD, TX+PAD) halo'd
   scratch, so a patch never crosses its tile's scratch.  Per-visibility
   data streams HBM→SMEM/VMEM in fixed-size chunks via async DMA; the
   oversampled kernel bank is VMEM-resident.  Each visibility is one
   dynamic-offset multiply-accumulate of a gh×gw patch — no collisions by
   construction, no atomics, deterministic.
3. **Halo fold (jnp):** per-tile outputs [nty·ntx, TY+PAD, TX+PAD] are
   folded into the padded grid with four reshape-adds (core, right-halo,
   down-halo, corner), then cropped.  Out-of-bounds patch elements land in
   the crop margin and vanish — exactly the reference's ``fixoutofbounds``
   drop semantics (``src/Gridding.hs:883-891``).

Complex arithmetic is carried as separate re/im float planes (TPU-friendly;
also sidesteps complex-transfer limits of the PJRT runtime).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.coords import frac_coords

# Tile geometry. PAD must be >= kernel support (gh, gw) so a patch anchored
# anywhere in a TY×TX tile stays inside the halo'd scratch, and also >=
# the largest kernel support so OOB patches die in the crop margin.
TY, TX = 128, 256
PAD = 16          # halo rows; lane halo is 128 for alignment
PADX = 128
CHUNK = 256       # visibilities per DMA chunk


def _geometry(H: int, W: int):
    Hp = -(-(H + 2 * PAD) // TY) * TY
    Wp = -(-(W + 2 * PAD) // TX) * TX
    return Hp, Wp, Hp // TY, Wp // TX


def _shift_mats(gh: int, gw: int, r, c):
    """One-hot row/col shift matrices for sub-tile placement.

    Mosaic only supports (8, 128)-aligned dynamic VMEM offsets, so the
    store targets an aligned block and the residual (r, c) shift is folded
    into two small matmuls (MXU work, not masked VPU shuffles):

      S  [2·SH, 2·gh]: block-diag pair of row-shift one-hots (re & im lanes)
      T  [gw, SW]:     col-shift one-hot
      wide = S @ (P @ T)  where P = [[pr], [pi]] stacked (2·gh, gw).
    """
    SH = _align(gh + 7, 8)
    SW = _align(gw + 127, 128)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (2 * SH, 2 * gh), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (2 * SH, 2 * gh), 1)
    same_plane = (i2 // SH) == (j2 // gh)
    s_hit = (i2 % SH) == (j2 % gh) + r
    S = jnp.where(same_plane & s_hit, 1.0, 0.0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (gw, SW), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (gw, SW), 1)
    T = jnp.where(xx == jj + c, 1.0, 0.0).astype(jnp.float32)
    return S, T


def _align(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(starts_ref, recs_hbm, bank_re_ref, bank_im_ref,
            out_re_ref, out_im_ref, recs_s, acc, sems,
            *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)
    SW = _align(gw + 127, 128)

    acc[:] = jnp.zeros_like(acc)

    # Visibility records are stored in CHUNK-sized blocks; a tile's range
    # [start, end) may straddle block boundaries, so boundary blocks are
    # loaded by both neighbouring tile programs and masked.
    b_lo = start // CHUNK

    def chunk_body(c, _):
        b = b_lo + c
        cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
        cp.start()
        cp.wait()
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        UNROLL = 4

        def vis_body(iu, _):
            for u in range(UNROLL):
                _vis_one(iu * UNROLL + u, lo, hi)
            return 0

        def _vis_one(i, lo, hi):
            @pl.when((i >= lo) & (i < hi))
            def _():
                # records packed as f32 (indices are exact small ints)
                y0 = recs_s[0, i].astype(jnp.int32)
                x0 = recs_s[1, i].astype(jnp.int32)
                k = recs_s[2, i].astype(jnp.int32)
                vr = recs_s[3, i]
                vi = recs_s[4, i]
                kr = bank_re_ref[k]
                ki = bank_im_ref[k]
                pr = vr * kr - vi * ki
                pi = vr * ki + vi * kr
                # Mosaic requires (8,128)-aligned dynamic VMEM offsets: the
                # store targets an aligned (SH, SW) block and the residual
                # (r, c) placement happens in-register with two dynamic
                # vector rotates per plane (exact, single-pass VPU ops).
                r = jax.lax.rem(y0, jnp.int32(8))
                cc = jax.lax.rem(x0, jnp.int32(128))
                y0a = pl.multiple_of(y0 - r, 8)
                x0a = pl.multiple_of(x0 - cc, 128)
                pr = jnp.pad(pr, ((0, SH - gh), (0, SW - gw)))
                pi = jnp.pad(pi, ((0, SH - gh), (0, SW - gw)))
                pr = pltpu.roll(pltpu.roll(pr, r, 0), cc, 1)
                pi = pltpu.roll(pltpu.roll(pi, r, 0), cc, 1)
                acc[0, pl.ds(y0a, SH), pl.ds(x0a, SW)] += pr
                acc[1, pl.ds(y0a, SH), pl.ds(x0a, SW)] += pi

        jax.lax.fori_loop(0, CHUNK // UNROLL, vis_body, 0, unroll=False)
        return 0

    nblocks = jnp.where(
        end > start, (end - jnp.int32(1)) // CHUNK - b_lo + 1, 0
    )
    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

    out_re_ref[0] = acc[0]
    out_im_ref[0] = acc[1]


def _fold_tiles(tiles, nty: int, ntx: int):
    """Fold halo'd per-tile accumulators into the padded grid.

    tiles: [nty, ntx, TY+PAD, TX+PADX] → [nty*TY (+PAD crop), ntx*TX …]
    Four block types become four reshape-adds — pure data movement, no
    scatter.
    """
    TYP, TXP = TY + PAD, TX + PADX
    core = tiles[:, :, :TY, :TX]
    right = tiles[:, :, :TY, TX:]
    down = tiles[:, :, TY:, :TX]
    corner = tiles[:, :, TY:, TX:]

    g = jnp.zeros((nty + 1, TY, ntx + 1, TX), tiles.dtype)
    g = g.at[:nty, :, :ntx, :].add(core.transpose(0, 2, 1, 3))
    # right halo of tile (ty, tx) lands at rows ty, cols (tx+1)*TX + [0,PADX)
    g = g.at[:nty, :, 1:, :PADX].add(right.transpose(0, 2, 1, 3))
    # down halo lands at rows (ty+1)*TY + [0,PAD)
    g = g.at[1:, :PAD, :ntx, :].add(down.transpose(0, 2, 1, 3))
    g = g.at[1:, :PAD, 1:, :PADX].add(corner.transpose(0, 2, 1, 3))
    return g.reshape((nty + 1) * TY, (ntx + 1) * TX)


def _preprocess(grid_shape, qpx: int, gh: int, gw: int, p, wbin, vis_re,
                vis_im):
    """Bin, sort and pack per-visibility records for the kernel."""
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

    order = jnp.argsort(t)
    t_s = t[order]
    zero = jnp.zeros_like(vis_re)
    recs = jnp.stack(
        [
            (y0p - ty * TY)[order].astype(jnp.float32),
            (x0p - tx * TX)[order].astype(jnp.float32),
            kidx[order].astype(jnp.float32),
            jnp.where(valid, vis_re, 0.0)[order].astype(jnp.float32),
            jnp.where(valid, vis_im, 0.0)[order].astype(jnp.float32),
            zero.astype(jnp.float32),
            zero.astype(jnp.float32),
            zero.astype(jnp.float32),
        ]
    )  # [8, n] — 8 rows keep DMA blocks sublane-tile aligned

    # pad to whole blocks; block-index DMA needs no lane-offset alignment
    n = recs.shape[1]
    n_pad = _align(max(n, 1), CHUNK)
    recs = jnp.pad(recs, ((0, 0), (0, n_pad - n)))
    recs = recs.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    return recs, starts, (Hp, Wp, nty, ntx)


def wproj_scatter_planes(bank_re, bank_im, grid_shape: Tuple[int, int], p,
                         wbin, vis_re, vis_im, interpret: bool = False):
    """Tile-privatized scatter; real/imag planes in and out.

    Args:
      bank_re/bank_im: [nw, qpx, qpx, gh, gw] float32 kernel bank planes
        (pre-conjugated bank, like ``ops.convgrid_wproj``).
      grid_shape: (H, W) static.
      p: [n, 3] scaled baselines.
      wbin: [n] int32.
      vis_re/vis_im: [n] float32.
    Returns:
      (grid_re, grid_im) [H, W] float32.
    """
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PADX, "kernel support exceeds tile halo"
    H, W = grid_shape
    recs, starts, (Hp, Wp, nty, ntx) = _preprocess(
        grid_shape, qpx, gh, gw, p, wbin, vis_re, vis_im
    )
    ntiles = nty * ntx
    TYP, TXP = TY + PAD, TX + PADX

    bank_re_f = bank_re.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32)
    bank_im_f = bank_im.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # recs [nblk, 8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank re
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank im
        ],
        out_specs=[
            pl.BlockSpec((1, TYP, TXP), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TYP, TXP), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, CHUNK), jnp.float32),
            pltpu.VMEM((2, TYP, TXP), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )

    out_re, out_im = pl.pallas_call(
        functools.partial(_kernel, gh=gh, gw=gw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, TYP, TXP), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, TYP, TXP), jnp.float32),
        ],
        interpret=interpret,
    )(starts, recs, bank_re_f, bank_im_f)

    g_re = _fold_tiles(out_re.reshape(nty, ntx, TYP, TXP), nty, ntx)
    g_im = _fold_tiles(out_im.reshape(nty, ntx, TYP, TXP), nty, ntx)
    return (
        g_re[PAD : PAD + H, PAD : PAD + W],
        g_im[PAD : PAD + H, PAD : PAD + W],
    )


def wproj_gridder_pallas(bank_conj, grid_shape, p, wbin, vis,
                         interpret: bool = False):
    """Complex-API wrapper matching ``kernels.wproj_gridder``."""
    g_re, g_im = wproj_scatter_planes(
        jnp.real(bank_conj).astype(jnp.float32),
        jnp.imag(bank_conj).astype(jnp.float32),
        grid_shape,
        p,
        wbin,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        interpret=interpret,
    )
    return jax.lax.complex(g_re, g_im)
