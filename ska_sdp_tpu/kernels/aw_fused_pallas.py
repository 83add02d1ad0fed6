"""Pallas TPU kernel: fully fused AW-projection gridder.

One kernel does, per visibility: spectra lookup → spectral product → the
synthesis DFT sandwich (on the MXU) → visibility multiply → patch placement
into the tile-privatized accumulator.  Nothing per-visibility ever touches
HBM except the 32-byte record — the XLA AW path's bottleneck (two 8 KB/vis
spectra gathers running far below HBM bandwidth) disappears because the
pair and w-tap spectral tables are VMEM-resident.

Math.  The AW patch is ``vis · conj(aw)`` with
``aw = S @ (spec2[pair] ⊙ wtap[kidx]) @ Sᵀ`` (S = synthesis DFT matrix,
``ops.convolution._synthesis_mat``; spec2 = pair table from
``patch_scatter_pallas``).  Rearranged for the MXU with re/im interleaved
in lanes:

  X*   = conj(spec2) ⊙ conj(wtap)                      (elementwise, VPU)
  R    = Xr* @ C1 + Xi* @ C2                           (m → interleaved 2s)
  I    = BDr @ R_all + BDi @ swapneg(R_all)            (block-diag left S*)
  patch = vr·I + vi·swapneg(I)                         (vis multiply)

where C1/C2 fold S*ᵀ and the lane interleaving, BDr/BDi are block-diagonal
stacks of Re/Im(S*) over the unrolled record group (16-row spacing so the
per-record slices are sublane-tile aligned), and ``swapneg`` is the
interleaved multiply-by-i lane shuffle.  The two big matmuls amortize the
MXU across the whole group.  Placement (pad → two rolls → guarded RMW on
dual accumulators) is identical to ``wproj_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.convolution import (_analysis_mat, _sandwich, _synthesis_mat,
                               akernel_spectra, wkernel_tap_spectra)
from ..ops.coords import frac_coords
from .wproj_pallas import (CHUNK, PAD, PADX, TX, TY, _align, _fold_tiles,
                           _geometry)

UNROLL = 16
ROWSP = 16          # per-record row spacing in the stacked patch matrix


def _swapneg(x):
    """Interleaved multiply-by-(−i)ᴴ helper: (re, im) → (−im, re) lanes."""
    left = pltpu.roll(x, x.shape[1] - 1, 1)   # left[2j] = x[2j+1]
    right = pltpu.roll(x, 1, 1)               # right[2j+1] = x[2j]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane % 2 == 0, -left, right)


# MXU precision tier of the AW sandwich matmuls, shared by this tiled
# kernel and the resident variant so the SAME env var controls the SAME
# accuracy everywhere (ADVICE r3: the two kernels must not silently
# diverge by two orders of magnitude when the VMEM gate flips).  Tiers:
#   fast   — Mosaic's DEFAULT f32 dot: ONE bf16 pass, ~2.5e-3 relative.
#   split3 — DEFAULT tier.  In the resident kernel this is the 3-pass
#            bf16 hi/lo split (~1.5e-5); HERE it maps to exact f32
#            (Precision.HIGHEST, ~1e-7) because the hand-rolled split
#            measured slower than exact in this kernel's group structure
#            (2.7 M vis/s + 410 s Mosaic compile vs 3.4 M exact —
#            experiments/probe_idg_bf16.py notes).  Accuracy is therefore
#            ≥ the resident kernel's at every tier.
#   exact  — Precision.HIGHEST (exact f32, 6.0 → 3.4 M vis/s measured).
#   SKA_SDP_TPU_AW_PRECISION = fast | split3 | exact   (default: split3)
# (legacy SKA_SDP_TPU_AW_EXACT=1 still forces "exact".)  Read PER CALL,
# not at import, so tests/CLI can flip it at runtime.
import os as _os


def aw_tier() -> str:
    """Resolve the AW matmul precision tier from the environment."""
    if _os.environ.get("SKA_SDP_TPU_AW_EXACT") == "1":   # legacy flag
        return "exact"
    tier = _os.environ.get("SKA_SDP_TPU_AW_PRECISION", "split3")
    if tier not in ("fast", "split3", "exact"):
        raise ValueError(
            f"SKA_SDP_TPU_AW_PRECISION must be fast|split3|exact, got {tier!r}"
        )
    return tier


def _tier_precision(tier: str):
    return (jax.lax.Precision.DEFAULT if tier == "fast"
            else jax.lax.Precision.HIGHEST)


def _kernel(starts_ref, recs_hbm, pair_r, pair_i, wsp_r, wsp_i,
            c1_ref, c2_ref, bdr_ref, bdi_ref,
            out_ref, recs_s, acc, acc2, sems, *, m: int, s: int,
            precision):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(s + 7, 8)             # 24 for s=15
    SW = _align(2 * s + 127, 128)     # 256
    npair = pair_r.shape[0]
    nwq = wsp_r.shape[0]

    acc[:] = jnp.zeros_like(acc)
    acc2[:] = jnp.zeros_like(acc2)

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

        pv = 128 // m              # original rows per packed 128-lane row

        def _spectral(i):
            # tables are (8, 128)-packed rows of the (m, m) spectra —
            # exactly one vreg per read, zero VMEM padding waste
            pid = jnp.minimum(recs_s[slot, 2, i].astype(jnp.int32),
                              jnp.int32(npair - 1))
            kid = jnp.minimum(recs_s[slot, 3, i].astype(jnp.int32),
                              jnp.int32(nwq - 1))
            xr = pair_r[pid] * wsp_r[kid] - pair_i[pid] * wsp_i[kid]
            xi = pair_r[pid] * wsp_i[kid] + pair_i[pid] * wsp_r[kid]
            return xr, -xi             # conj(P ⊙ W), packed (m²/128, 128)

        def group_body(iu, _):
            i0 = iu * UNROLL
            xs = [_spectral(i0 + j) for j in range(UNROLL)]
            # stacked packed product: (U·m²/128, 128)
            xr_all = jnp.concatenate([x[0] for x in xs], axis=0)
            xi_all = jnp.concatenate([x[1] for x in xs], axis=0)
            # packed right product: C4 matrices carry the packing structure
            # (see _matrices); rows stay packed, columns hold nv blocks of
            # the 2s interleaved patch columns
            r_all = (
                jnp.dot(xr_all, c1_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
                + jnp.dot(xi_all, c2_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=precision)
            )                                     # (U·m²/128, pv·2s)
            rs_all = _swapneg(r_all)
            # block-structured left product, one matmul pair per packed
            # sub-row class v, summed over v
            i_all = None
            for v in range(pv):
                cols = slice(v * 2 * s, (v + 1) * 2 * s)
                term = (
                    jnp.dot(bdr_ref[v], r_all[:, cols],
                            preferred_element_type=jnp.float32,
                            precision=precision)
                    + jnp.dot(bdi_ref[v], rs_all[:, cols],
                              preferred_element_type=jnp.float32,
                              precision=precision)
                )
                i_all = term if i_all is None else i_all + term

            for j in range(UNROLL):
                i = i0 + j
                in_r = (i >= lo) & (i < hi)
                y0 = recs_s[slot, 0, i].astype(jnp.int32)
                x0 = recs_s[slot, 1, i].astype(jnp.int32)
                vr = jnp.where(in_r, recs_s[slot, 4, i], 0.0)
                vi = jnp.where(in_r, recs_s[slot, 5, i], 0.0)
                pj = i_all[j * ROWSP:(j + 1) * ROWSP]      # (16, 2s)
                patch = vr * pj + vi * _swapneg(pj)
                r = jax.lax.rem(y0, jnp.int32(8))
                x2 = x0 * 2
                rem = jax.lax.rem(x2, jnp.int32(128))
                y0a = pl.multiple_of(y0 - r, 8)
                x2a = pl.multiple_of(x2 - rem, 128)
                patch = jnp.pad(patch, ((0, SH - ROWSP), (0, SW - 2 * s)))
                patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
                tgt = acc if j % 2 == 0 else acc2
                tgt[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, group_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
    out_ref[0] = acc[:] + acc2[:]


@functools.lru_cache(maxsize=None)
def _matrices(s: int, m: int):
    """Constant matmul factors for the packed formulation (numpy, f32).

    Packing: X' (m, m) row-major → (m²/128, 128); packed[u, m·v + t]
    = X'(pv·u + v, t) with pv = 128/m.  The right factor is expanded to
    C4 (128, pv·2s) carrying the per-v block structure; the left factor
    becomes pv per-class matrices L_v[o, u] = S*(o, pv·u + v), block-
    diagonalized over the unrolled record group with ROWSP row spacing.
    """
    assert 128 % m == 0 and (m * m) % 128 == 0
    pv = 128 // m
    nrow = m * m // 128                        # packed rows per record
    S = np.conj(_synthesis_mat(s, m))          # S* (s, m) complex
    M = S.T                                    # right factor S*ᵀ (m, s)
    c1 = np.zeros((128, pv * 2 * s), np.float32)
    c2 = np.zeros((128, pv * 2 * s), np.float32)
    for v in range(pv):
        c1[m * v:m * (v + 1), 2 * s * v + 0::][:, 0:2 * s:2] = M.real
        c1[m * v:m * (v + 1), 2 * s * v + 1::][:, 0:2 * s:2] = M.imag
        c2[m * v:m * (v + 1), 2 * s * v + 0::][:, 0:2 * s:2] = -M.imag
        c2[m * v:m * (v + 1), 2 * s * v + 1::][:, 0:2 * s:2] = M.real
    bdr = np.zeros((pv, UNROLL * ROWSP, UNROLL * nrow), np.float32)
    bdi = np.zeros((pv, UNROLL * ROWSP, UNROLL * nrow), np.float32)
    for v in range(pv):
        lv = S[:, v::pv]                       # (s, nrow): cols pv·u + v
        for j in range(UNROLL):
            bdr[v, j * ROWSP:j * ROWSP + s,
                j * nrow:(j + 1) * nrow] = lv.real
            bdi[v, j * ROWSP:j * ROWSP + s,
                j * nrow:(j + 1) * nrow] = lv.imag
    return c1, c2, bdr, bdi


def _preprocess(grid_shape, qpx, s, p, wbin, a1, a2, nant, vis_re, vis_im):
    H, W = grid_shape
    Hp, Wp, nty, ntx = _geometry(H, W)
    ntiles = nty * ntx

    x, xf, y, yf = frac_coords((H, W), qpx, p)
    y0 = y - s // 2
    x0 = x - s // 2
    valid = (y0 > -s) & (y0 < H) & (x0 > -s) & (x0 < W)
    y0p = jnp.where(valid, y0 + PAD, 0)
    x0p = jnp.where(valid, x0 + PAD, 0)
    pid = a1 * nant + a2
    kidx = (wbin * qpx + yf) * qpx + xf

    ty = y0p // TY
    tx = x0p // TX
    t = jnp.where(valid, ty * ntx + tx, ntiles).astype(jnp.int32)

    # one fused multi-operand sort instead of argsort + per-field gathers
    # (random-access gathers run ~30M elem/s on v5e — BENCH.md round 2)
    t_s, f0, f1, f2, f3, f4, f5 = jax.lax.sort(
        [
            t,
            (y0p - ty * TY).astype(jnp.float32),
            (x0p - tx * TX).astype(jnp.float32),
            pid.astype(jnp.float32),
            kidx.astype(jnp.float32),
            jnp.where(valid, vis_re, 0.0).astype(jnp.float32),
            jnp.where(valid, vis_im, 0.0).astype(jnp.float32),
        ],
        num_keys=1,
    )
    zero = jnp.zeros_like(f0)
    recs = jnp.stack([f0, f1, f2, f3, f4, f5, zero, zero])
    n = recs.shape[1]
    n_pad = _align(max(n, 1), CHUNK)
    recs = jnp.pad(recs, ((0, 0), (0, n_pad - n)))
    recs = recs.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    return recs, starts, (Hp, Wp, nty, ntx)


def aw_fused_scatter_planes(pair_r, pair_i, wsp_r, wsp_i, grid_shape,
                            qpx: int, s: int, nant: int, p, wbin, a1, a2,
                            vis_re, vis_im, interpret: bool = False):
    """Fused AW gridder on (re, im) planes.

    Args:
      pair_r/pair_i: [nant², m, m] pair spectral table planes (raw, not
        conjugated — the kernel conjugates).
      wsp_r/wsp_i: [nw·qpx², m, m] w-tap spectra planes.
      p: [n, 3]; wbin/a1/a2: [n] int32; vis planes [n] float32.
    """
    m = int(np.sqrt(pair_r.shape[-1] * pair_r.shape[-2]))
    H, W = grid_shape
    recs, starts, (Hp, Wp, nty, ntx) = _preprocess(
        grid_shape, qpx, s, p, wbin, a1.astype(jnp.int32),
        a2.astype(jnp.int32), nant, vis_re, vis_im
    )
    ntiles = nty * ntx
    TYP, TXP2 = TY + PAD, 2 * (TX + PADX)

    c1, c2, bdr, bdi = _matrices(s, m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # recs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pair_r
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pair_i
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wsp_r
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wsp_i
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,  # c1 c2 bdr bdi
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
        functools.partial(_kernel, m=m, s=s,
                          precision=_tier_precision(aw_tier())),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, TYP, TXP2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, pair_r, pair_i, wsp_r, wsp_i,
      jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(bdr), jnp.asarray(bdi))

    g = _fold_tiles(out.reshape(nty, ntx, TYP, TXP2), nty, ntx, xs=2)
    g = g[PAD: PAD + H, 2 * PAD: 2 * (PAD + W)]
    return g[:, 0::2], g[:, 1::2]


def convgrid_aw_fused(wkerns, akerns, guv, p, wbin, a1, a2, vis,
                      interpret: bool = False):
    """Drop-in fused-AW equivalent of ``ops.convgrid_aw`` (TPU hot path).

    Requires nant² + nw·qpx² spectral tables to fit VMEM (~50 MB at the
    SKA1_Low scale).  The caller (``kernels.aw_gridder``) falls back to the
    slab patch-stream path when they do not.
    """
    nw, qpx, _, s, _ = wkerns.shape
    nant = akerns.shape[0]
    H, W = guv.shape

    a_spec = akernel_spectra(akerns)
    m = a_spec.shape[-1]
    assert (m * m) % 128 == 0, "packed spectral tables need m² % 128 == 0"
    T = _analysis_mat(s, m) @ _synthesis_mat(s, m)
    prod = a_spec[:, None] * a_spec[None, :]
    # (8, 128)-packed rows: zero VMEM padding waste vs a (m, m) minor shape
    pair_tab = _sandwich(T, prod).reshape(nant * nant, (m * m) // 128, 128)
    w_spec = wkernel_tap_spectra(wkerns).reshape(
        nw * qpx * qpx, (m * m) // 128, 128
    )

    g_re, g_im = aw_fused_scatter_planes(
        jnp.real(pair_tab).astype(jnp.float32),
        jnp.imag(pair_tab).astype(jnp.float32),
        jnp.real(w_spec).astype(jnp.float32),
        jnp.imag(w_spec).astype(jnp.float32),
        (H, W), qpx, s, nant, p, wbin, a1, a2,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        interpret=interpret,
    )
    return guv + jax.lax.complex(g_re, g_im).astype(guv.dtype)
