"""Pallas TPU kernel: tile-privatized placement of per-visibility patches.

The AW-projection gridder (reference ``convgrid4``/``processOne2``,
``src/Gridding.hs:318-396``) scatters a *unique* kernel patch per
visibility — there is no shared bank to look up.  The TPU pipeline splits
the work:

  1. patches are built **densely, batched on the MXU** (spectral sandwich
     matmuls — ``ops.convolution.make_aw_kernels_batched``) and
     pre-multiplied by the visibility, re/im interleaved in lanes;
  2. this kernel only *places* them: same tile walk, halo'd VMEM
     accumulator, software-pipelined record groups and fold as the
     w-projection gridder (``wproj_pallas``), but each record's patch
     streams from HBM ((16, 128) per record, 2 MB per 256-record DMA
     block) instead of a VMEM bank lookup.

``convgrid_aw_pallas`` drives the full path in visibility slabs so the
patch stream never materializes more than ``slab`` patches in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.convolution import (akernel_spectra, make_aw_kernels_batched,
                               wkernel_tap_spectra)
from ..ops.coords import frac_coords
from .wproj_pallas import (CHUNK, PAD, PADX, TX, TY, _align, _fold_tiles,
                           _geometry)

UNROLL = 16
PR = 16            # sublane rows per stored patch (gh <= PR)


def _kernel(starts_ref, recs_hbm, patches_hbm, out_ref, recs_s, patches_s,
            acc, acc2, sems, *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)
    SW = _align(2 * gw + 127, 128)

    acc[:] = jnp.zeros_like(acc)
    acc2[:] = jnp.zeros_like(acc2)

    b_lo = start // CHUNK

    def chunk_body(c, _):
        b = b_lo + c
        cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
        cp.start()
        pp = pltpu.make_async_copy(patches_hbm.at[b], patches_s, sems.at[1])
        pp.start()
        cp.wait()
        pp.wait()
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        def _compute(i, u):
            in_r = (i >= lo) & (i < hi)
            y0 = recs_s[0, i].astype(jnp.int32)
            x0 = recs_s[1, i].astype(jnp.int32)
            off = pl.multiple_of(u * PR, PR)              # 16-aligned sublane
            patch = patches_s[pl.ds(off, PR), :]          # (PR, 128)
            patch = jnp.where(in_r, patch, 0.0)
            r = jax.lax.rem(y0, jnp.int32(8))
            x2 = x0 * 2
            rem = jax.lax.rem(x2, jnp.int32(128))
            y0a = pl.multiple_of(y0 - r, 8)
            x2a = pl.multiple_of(x2 - rem, 128)
            patch = jnp.pad(patch, ((0, SH - PR), (0, SW - 128)))
            patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
            return patch, y0a, x2a

        def vis_body(iu, _):
            items = [
                _compute(iu * UNROLL + u, iu * UNROLL + u)
                for u in range(UNROLL)
            ]
            for u, (patch, y0a, x2a) in enumerate(items):
                tgt = acc if u % 2 == 0 else acc2
                tgt[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, vis_body, 0, unroll=False)
        return 0

    nblocks = jnp.where(
        end > start, (end - jnp.int32(1)) // CHUNK - b_lo + 1, 0
    )
    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
    out_ref[0] = acc[:] + acc2[:]


def _preprocess(grid_shape, gh, gw, p, patches_inter):
    """Sort records + patches by grid tile; pad to whole DMA blocks."""
    H, W = grid_shape
    Hp, Wp, nty, ntx = _geometry(H, W)
    ntiles = nty * ntx

    y0 = p[:, 0]        # already integer cell anchors (see wrapper)
    x0 = p[:, 1]
    valid = (y0 > -gh) & (y0 < H) & (x0 > -gw) & (x0 < W)
    y0p = jnp.where(valid, y0 + PAD, 0)
    x0p = jnp.where(valid, x0 + PAD, 0)

    ty = y0p // TY
    tx = x0p // TX
    t = jnp.where(valid, ty * ntx + tx, ntiles).astype(jnp.int32)

    order = jnp.argsort(t)
    t_s = t[order]
    recs = jnp.stack(
        [
            (y0p - ty * TY)[order].astype(jnp.float32),
            (x0p - tx * TX)[order].astype(jnp.float32),
        ]
        + [jnp.zeros(y0.shape, jnp.float32)] * 6
    )
    n = recs.shape[1]
    n_pad = _align(max(n, 1), CHUNK)
    recs = jnp.pad(recs, ((0, 0), (0, n_pad - n)))
    recs = recs.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    # pad the minor dims to a full (PR, 128) tile BEFORE the gather: takes
    # with a sub-128 minor dimension run ~15-50x below HBM bandwidth
    pk_full = jnp.pad(
        patches_inter,
        ((0, 0), (0, PR - patches_inter.shape[1]),
         (0, 128 - patches_inter.shape[2])),
    )
    pk = jnp.where(valid[order, None, None], pk_full[order], 0.0)
    pk = jnp.pad(pk, ((0, n_pad - n), (0, 0), (0, 0)))
    pk = pk.reshape(n_pad // CHUNK, CHUNK * PR, 128)

    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    return recs, pk, starts, (Hp, Wp, nty, ntx)


def patch_scatter_planes(patches_inter, grid_shape: Tuple[int, int], y0, x0,
                         interpret: bool = False):
    """Place pre-multiplied interleaved patches; returns (re, im) planes.

    Args:
      patches_inter: [n, gh, 2·gw] float32 — re/im interleaved in lanes,
        visibility factor already applied.
      grid_shape: (H, W) static.
      y0, x0: [n] int32 top-left anchor cells (may be out of bounds:
        partially-OOB elements are dropped, fully-OOB patches ignored).
    """
    n, gh, gw2 = patches_inter.shape
    gw = gw2 // 2
    assert gh <= PR and gh <= PAD and gw <= PADX
    H, W = grid_shape
    anchors = jnp.stack([y0, x0], axis=1)
    recs, pk, starts, (Hp, Wp, nty, ntx) = _preprocess(
        grid_shape, gh, gw, anchors, patches_inter
    )
    ntiles = nty * ntx
    TYP, TXP2 = TY + PAD, 2 * (TX + PADX)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # recs [nblk, 8, C]
            pl.BlockSpec(memory_space=pl.ANY),   # patches [nblk, C·PR, 128]
        ],
        out_specs=[
            pl.BlockSpec((1, TYP, TXP2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK * PR, 128), jnp.float32),
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
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, pk)

    g = _fold_tiles(out.reshape(nty, ntx, TYP, TXP2), nty, ntx, xs=2)
    g = g[PAD: PAD + H, 2 * PAD: 2 * (PAD + W)]
    return g[:, 0::2], g[:, 1::2]


def convgrid_aw_pallas(wkerns, akerns, guv, p, wbin, a1, a2, vis,
                       slab: int = 1 << 16, interpret: bool = False):
    """AW-projection gridding: MXU patch synthesis + Pallas placement.

    Same semantics as ``ops.gridding.convgrid_aw`` (on-the-fly
    conj(A1 ⊛ A2 ⊛ W[wbin, yf, xf]) kernels).  Processes visibilities in
    ``slab``-sized batches to bound the HBM patch stream.
    """
    nw, qpx, _, gh, gw = wkerns.shape
    H, W = guv.shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    y0 = y - gh // 2
    x0 = x - gw // 2

    a_spec = akernel_spectra(akerns)
    w_spec = wkernel_tap_spectra(wkerns)
    build = make_aw_kernels_batched(gh)

    # Pair factorization: the A1⊛A2 half of the chain depends only on the
    # antenna pair — precompute it for every pair once (gathers dominate
    # the per-visibility cost on TPU), unless the pair table would be
    # larger than the visibility batch itself.
    nant = akerns.shape[0]
    pair_tab = None
    if nant * nant <= 16384:
        from ..ops.convolution import _analysis_mat, _sandwich, _synthesis_mat

        m = a_spec.shape[-1]
        T = _analysis_mat(gh, m) @ _synthesis_mat(gh, m)
        prod = a_spec[:, None] * a_spec[None, :]          # [nant, nant, m, m]
        # stored flat: gathers of lane-tile-aligned [b, m²] rows are ~2×
        # faster on TPU than [b, m, m] blocks with a sub-128 minor dim
        pair_tab = _sandwich(T, prod).reshape(nant * nant, m * m)

    n = vis.shape[0]
    g_re = jnp.real(guv).astype(jnp.float32)
    g_im = jnp.imag(guv).astype(jnp.float32)
    a1 = a1.astype(jnp.int32)
    a2 = a2.astype(jnp.int32)

    for s0 in range(0, max(n, 1), slab):
        sl = slice(s0, min(s0 + slab, n))
        if pair_tab is not None:
            from ..ops.convolution import _sandwich, _synthesis_mat

            m = a_spec.shape[-1]
            spec2 = pair_tab[a1[sl] * nant + a2[sl]]      # [b, m²] flat
            wflat = w_spec.reshape(nw * qpx * qpx, m * m)
            kidx = (wbin[sl] * qpx + yf[sl]) * qpx + xf[sl]
            wtap = wflat[kidx]                            # [b, m²] flat
            prod2 = (spec2 * wtap).reshape(-1, m, m)
            awk = jnp.conj(
                _sandwich(jnp.asarray(_synthesis_mat(gh, m)), prod2)
            )
        else:
            awk = build(a_spec, w_spec, a1[sl], a2[sl], wbin[sl], yf[sl],
                        xf[sl])
        cpatch = vis[sl, None, None] * awk               # [b, gh, gw] c64
        inter = jnp.stack(
            [jnp.real(cpatch), jnp.imag(cpatch)], axis=-1
        ).reshape(cpatch.shape[0], gh, 2 * gw).astype(jnp.float32)
        dre, dim = patch_scatter_planes(
            inter, (H, W), y0[sl], x0[sl], interpret=interpret
        )
        g_re = g_re + dre
        g_im = g_im + dim
    return jax.lax.complex(g_re, g_im).astype(guv.dtype)
