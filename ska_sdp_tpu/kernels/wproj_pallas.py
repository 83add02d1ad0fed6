"""Pallas TPU kernel: tile-privatized w-projection scatter-add.

The reference's hot loop is a combining ``permute (+)`` scatter of
kernel-weighted visibility patches onto the uv-grid
(``/root/reference/src/Gridding.hs:199-244``).  TPUs have no efficient
global atomics and XLA's scatter-add lowers to a serialized loop (measured
58.8K vis/s on v5e).  This kernel restructures the computation TPU-first:

1. **Bin & sort (jnp, on-device):** each visibility's patch is assigned to
   the grid tile containing its top-left corner; visibilities are sorted by
   tile id and CSR tile offsets are computed with ``searchsorted``.
2. **Tile privatization (Pallas):** the kernel walks tiles (the Pallas grid
   axis); each tile's accumulator lives in VMEM — a halo'd scratch, so a
   patch never crosses its tile's scratch.  Per-visibility records stream
   HBM→SMEM in block-indexed async-DMA chunks; the oversampled kernel bank
   is VMEM-resident.  No collisions by construction, no atomics, fully
   deterministic.
3. **Patch placement:** Mosaic only allows (8,128)-aligned dynamic VMEM
   offsets, so each store targets an aligned block and the residual
   (row, col) placement happens in-register with two dynamic vector
   rotates (``pltpu.roll``).  Re/im planes are interleaved in the lane
   dimension (kernel bank pre-interleaved as A=(re,im), B=(-im,re) so the
   complex multiply is ``vr·A[k] + vi·B[k]``), halving the number of
   rolls and stores per visibility.  The store window is (24, 256) with a
   128-lane-aligned base (residual lane shift < 128).
4. **Software pipelining:** per-record compute (bank lookup, FMA, pad,
   rolls) is issued speculatively for a whole unrolled group of records
   with NO control flow between the chains, and only the accumulator
   read-modify-writes are guarded by ``pl.when`` on the tile's [lo, hi)
   record range.  This lets Mosaic interleave the long roll/FMA latency
   chains of independent records (+32% measured).  RMWs alternate between
   two disjoint accumulators to shorten store→load hazard chains; the two
   are summed once per tile on output.
5. **Halo fold (jnp):** per-tile outputs are folded into the padded grid
   with four dense reshape-adds (core, right-halo, down-halo, corner), then
   cropped.  Out-of-bounds patch elements land in the crop margin and
   vanish — exactly the reference's ``fixoutofbounds`` drop semantics
   (``src/Gridding.hs:883-891``).

Measured on TPU v5e (1M vis, 2400² grid, qpx=8, 15² kernels, nw=32):
XLA scatter 0.059 → matmul-shift kernel 3.1 → roll kernel 4.8 →
interleaved-roll 5.2 → split/pipelined dual-acc kernel (this file) ~7.0
Mvis/s — see BENCH logs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.coords import frac_coords

# Tile geometry (coarse-grid coordinates). PAD must be >= kernel support so
# a patch anchored anywhere in a TY×TX tile stays inside the halo'd scratch.
TY, TX = 128, 256
PAD = 16          # sublane halo
PADX = 128        # lane halo (coarse columns)
CHUNK = 256       # visibility records per DMA block
UNROLL = 32


def _align(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(H: int, W: int):
    Hp = -(-(H + 2 * PAD) // TY) * TY
    Wp = -(-(W + 2 * PAD) // TX) * TX
    return Hp, Wp, Hp // TY, Wp // TX


def _kernel(starts_ref, recs_hbm, bank_a_ref, bank_b_ref,
            out_ref, recs_s, acc, acc2, sems, *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)
    SW = _align(2 * gw + 127, 128)   # narrow window

    acc[:] = jnp.zeros_like(acc)
    acc2[:] = jnp.zeros_like(acc2)

    # Records are stored in CHUNK-sized blocks; a tile's range [start, end)
    # may straddle block boundaries, so boundary blocks are loaded by both
    # neighbouring tile programs and masked.  Record DMA is double-buffered:
    # block c+1 streams while block c is processed.
    b_lo = start // CHUNK
    nblocks = jnp.where(
        end > start, (end - jnp.int32(1)) // CHUNK - b_lo + 1, 0
    )

    def dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[b_lo + c], recs_s.at[slot], sems.at[slot]
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
        b = b_lo + c
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        nk = bank_a_ref.shape[0]

        def _compute(i):
            # out-of-range records (boundary blocks shared with the
            # neighbouring tile) are neutralized by zeroing their
            # visibility — two scalar selects instead of a pl.when branch
            # around the store (+18% measured; Mosaic pipelines the
            # branch-free stream much better)
            in_r = (i >= lo) & (i < hi)
            y0 = recs_s[slot, 0, i].astype(jnp.int32)
            x0 = recs_s[slot, 1, i].astype(jnp.int32)
            k = recs_s[slot, 2, i].astype(jnp.int32)
            k = jnp.minimum(k, jnp.int32(nk - 1))
            vr = jnp.where(in_r, recs_s[slot, 3, i], 0.0)
            vi = jnp.where(in_r, recs_s[slot, 4, i], 0.0)
            patch = vr * bank_a_ref[k] + vi * bank_b_ref[k]
            r = jax.lax.rem(y0, jnp.int32(8))
            x2 = x0 * 2
            rem = jax.lax.rem(x2, jnp.int32(128))
            y0a = pl.multiple_of(y0 - r, 8)
            x2a = pl.multiple_of(x2 - rem, 128)
            patch = jnp.pad(patch, ((0, SH - gh), (0, SW - 2 * gw)))
            patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
            return patch, y0a, x2a

        def vis_body(iu, _):
            items = [_compute(iu * UNROLL + u) for u in range(UNROLL)]
            for u, (patch, y0a, x2a) in enumerate(items):
                tgt = acc if u % 2 == 0 else acc2
                tgt[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, vis_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

    out_ref[0] = acc[:] + acc2[:]


def _fold_tiles(tiles, nty: int, ntx: int, xs: int = 1):
    """Fold halo'd per-tile accumulators into the padded grid.

    tiles: [nty, ntx, TY+PAD, xs·(TX+PADX)] — ``xs`` is the lane scale
    (2 when re/im are interleaved).  Four block types become four dense
    reshape-adds — pure data movement, no scatter.
    """
    TXs, PADXs = xs * TX, xs * PADX
    core = tiles[:, :, :TY, :TXs]
    right = tiles[:, :, :TY, TXs:]
    down = tiles[:, :, TY:, :TXs]
    corner = tiles[:, :, TY:, TXs:]

    g = jnp.zeros((nty + 1, TY, ntx + 1, TXs), tiles.dtype)
    g = g.at[:nty, :, :ntx, :].add(core.transpose(0, 2, 1, 3))
    # right halo of tile (ty, tx) lands at rows ty, cols (tx+1)·TXs+[0,PADXs)
    g = g.at[:nty, :, 1:, :PADXs].add(right.transpose(0, 2, 1, 3))
    # down halo lands at rows (ty+1)·TY + [0, PAD)
    g = g.at[1:, :PAD, :ntx, :].add(down.transpose(0, 2, 1, 3))
    g = g.at[1:, :PAD, 1:, :PADXs].add(corner.transpose(0, 2, 1, 3))
    return g.reshape((nty + 1) * TY, (ntx + 1) * TXs)


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

    # one fused multi-operand sort — an argsort + per-field gathers costs
    # ~8 ms per 1M-element gather on v5e (random access runs ~30M elem/s),
    # which made preprocessing dominate the whole step in round 1
    t_s, f0, f1, f2, f3, f4 = jax.lax.sort(
        [
            t,
            (y0p - ty * TY).astype(jnp.float32),
            (x0p - tx * TX).astype(jnp.float32),
            kidx.astype(jnp.float32),
            jnp.where(valid, vis_re, 0.0).astype(jnp.float32),
            jnp.where(valid, vis_im, 0.0).astype(jnp.float32),
        ],
        num_keys=1,
    )
    zero = jnp.zeros_like(f0)
    recs = jnp.stack(
        [f0, f1, f2, f3, f4, zero, zero, zero]
    )  # [8, n] — 8 rows keep DMA blocks sublane-tile aligned

    # pad to whole blocks; block-index DMA needs no lane-offset alignment
    n = recs.shape[1]
    n_pad = _align(max(n, 1), CHUNK)
    recs = jnp.pad(recs, ((0, 0), (0, n_pad - n)))
    recs = recs.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    return recs, starts, (Hp, Wp, nty, ntx)


def _interleave_bank(bank_re, bank_im):
    """A = (re, im) interleaved in lanes; B = (-im, re) interleaved."""
    nwq, gh, gw = bank_re.shape
    a = jnp.stack([bank_re, bank_im], axis=-1).reshape(nwq, gh, 2 * gw)
    b = jnp.stack([-bank_im, bank_re], axis=-1).reshape(nwq, gh, 2 * gw)
    return a, b


def wproj_scatter_from_records(bank_re, bank_im,
                               grid_shape: Tuple[int, int], recs, starts,
                               interpret: bool = False):
    """Tile-privatized scatter from a pre-binned record stream
    (``_preprocess`` output) — lets multi-channel runs amortize the
    ~30 ms/Mvis record sort (BENCH.md round 2): only the vis rows
    (recs[:, 3:5, :]) change between channels sharing uvw."""
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PADX, "kernel support exceeds tile halo"
    H, W = grid_shape
    Hp, Wp, nty, ntx = _geometry(H, W)
    ntiles = nty * ntx
    TYP, TXP2 = TY + PAD, 2 * (TX + PADX)

    bank_a, bank_b = _interleave_bank(
        bank_re.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
        bank_im.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # recs [nblk, 8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank A
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank B
        ],
        out_specs=[
            pl.BlockSpec((1, TYP, TXP2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, CHUNK), jnp.float32),
            pltpu.VMEM((TYP, TXP2), jnp.float32),
            pltpu.VMEM((TYP, TXP2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    (out,) = pl.pallas_call(
        functools.partial(_kernel, gh=gh, gw=gw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, TYP, TXP2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, bank_a, bank_b)

    g = _fold_tiles(out.reshape(nty, ntx, TYP, TXP2), nty, ntx, xs=2)
    g = g[PAD : PAD + H, 2 * PAD : 2 * (PAD + W)]
    return g[:, 0::2], g[:, 1::2]


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
    recs, starts, _ = _preprocess(
        grid_shape, qpx, gh, gw, p, wbin, vis_re, vis_im
    )
    return wproj_scatter_from_records(
        bank_re, bank_im, grid_shape, recs, starts, interpret=interpret
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
