"""Pallas TPU kernel: resident-grid w-projection scatter — NO binning.

The round-2 tile-privatized kernel (``wproj_pallas``) sorts records by grid
tile so each tile's accumulator fits VMEM.  Round-3 measurement showed the
whole padded 2400² interleaved uv-grid (~50 MB f32) fits v5e VMEM alongside
the oversampled kernel bank, so this kernel keeps the ENTIRE grid as one
VMEM accumulator and consumes visibility records in ARBITRARY order:

* no record sort, no CSR tile offsets, no halo fold, no boundary-block
  masking — preprocessing is just ``frac_coords`` + field packing;
* the per-record pipeline is the tuned round-2 inner loop unchanged
  (bank lookup → interleaved FMA → pad → two ``pltpu.roll`` placements →
  one aligned (24, 256) read-modify-write), writing straight into the
  resident grid;
* measured (dispatch-floor-corrected, BENCH.md round 3): ~30 ms/Mvis vs
  the tiled kernel's ~36 ms — and the sorted-record requirement disappears.

Semantics match ``ops.gridding.convgrid_wproj`` (the reference's
``convgrid2``, /root/reference/src/Gridding.hs:199-244): out-of-bounds
patch cells land in the PAD crop margin and are dropped — the reference's
``fixoutofbounds`` drop (:883-891); fully-invalid records are zeroed.

Fits-gate: ``resident_fits`` — used by ``kernels.wproj_gridder`` dispatch;
larger grids fall back to the tiled kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.coords import frac_coords
from .wproj_pallas import _align, _interleave_bank

PAD = 16      # crop margin ≥ kernel support (gh, gw ≤ PAD like the tiled halo)
SH = 24       # padded patch rows (8-aligned ≥ gh + 7 for the sublane roll)
SW = 256      # padded patch lanes (≥ 2·gw + 127 for the lane roll)
C = 1024      # records per grid program (SMEM block)

# VMEM budget for acc + bank + pipeline buffers.  The v5e compiles and runs
# ~112 MB of live buffers (measured round 3); leave headroom for Mosaic.
VMEM_BUDGET = 100 * 1024 * 1024


def _align_down(x: int, m: int) -> int:
    return (x // m) * m


def _geometry(H: int, W: int) -> Tuple[int, int]:
    """Padded resident accumulator shape (rows, interleaved lanes)."""
    HP = _align_down(H + PAD - 1, 8) + SH
    WP2 = _align(2 * (W + PAD), 128) - 128 + SW
    return HP, WP2


def resident_fits(H: int, W: int, nwq: int, gh: int, gw: int) -> bool:
    """Does grid + interleaved bank (+ slack) fit the VMEM budget?

    The bank's (gh, 2·gw) planes are lane-padded to 128 by Mosaic, so the
    budget uses the padded footprint.
    """
    if gh > PAD or gw > PAD:
        return False
    HP, WP2 = _geometry(H, W)
    acc = HP * WP2 * 4
    bank = 2 * nwq * _align(gh, 8) * 128 * 4
    slack = 4 * 1024 * 1024
    return acc + bank + slack <= VMEM_BUDGET


def _kernel(recs_ref, bank_a_ref, bank_b_ref, out_ref, *, unroll: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nk = bank_a_ref.shape[0]
    gh = bank_a_ref.shape[1]
    gw2 = bank_a_ref.shape[2]

    def _compute(i):
        y0 = recs_ref[0, 0, i].astype(jnp.int32)
        x0 = recs_ref[0, 1, i].astype(jnp.int32)
        k = jnp.minimum(recs_ref[0, 2, i].astype(jnp.int32), jnp.int32(nk - 1))
        vr = recs_ref[0, 3, i]
        vi = recs_ref[0, 4, i]
        patch = vr * bank_a_ref[k] + vi * bank_b_ref[k]
        r = jax.lax.rem(y0, jnp.int32(8))
        x2 = x0 * 2
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - r, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, SH - gh), (0, SW - gw2)))
        patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
        return patch, y0a, x2a

    def vis_body(iu, _):
        items = [_compute(iu * unroll + u) for u in range(unroll)]
        for patch, y0a, x2a in items:
            out_ref[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch
        return 0

    jax.lax.fori_loop(0, C // unroll, vis_body, 0, unroll=False)


def wproj_resident_records(grid_shape, qpx: int, gh: int, gw: int, p, wbin,
                           vis_re, vis_im, return_valid: bool = False):
    """Pack per-visibility records [nblk, 8, C] — no sort, input order.

    Row layout: 0=y0p, 1=x0p, 2=kidx, 3=vr, 4=vi (rows 5-7 zero; 8 rows
    keep the SMEM block sublane-aligned).  Invalid (fully out-of-bounds)
    records keep position (0, 0) with zeroed vis — a zero patch.
    ``return_valid=True`` also returns the [n] validity mask (the degrid
    epilogue needs it; one shared predicate, not a copy).
    """
    H, W = grid_shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    y0 = y - gh // 2
    x0 = x - gw // 2
    valid = (y0 > -gh) & (y0 < H) & (x0 > -gw) & (x0 < W)
    y0p = jnp.where(valid, y0 + PAD, 0).astype(jnp.float32)
    x0p = jnp.where(valid, x0 + PAD, 0).astype(jnp.float32)
    kidx = (wbin * (qpx * qpx) + yf * qpx + xf).astype(jnp.float32)
    vr = jnp.where(valid, vis_re, 0.0).astype(jnp.float32)
    vi = jnp.where(valid, vis_im, 0.0).astype(jnp.float32)

    n = y0p.shape[0]
    n_pad = _align(max(n, 1), C)
    zero = jnp.zeros((n_pad,), jnp.float32)
    rows = [jnp.concatenate([r, zero[: n_pad - n]])
            for r in (y0p, x0p, kidx, vr, vi)]
    rows += [zero] * 3
    recs = jnp.stack(rows).reshape(8, n_pad // C, C).transpose(1, 0, 2)
    return (recs, valid) if return_valid else recs


def wproj_resident_from_records(bank_re, bank_im, grid_shape, recs,
                                unroll: int = 64, interpret: bool = False):
    """Scatter a packed record stream onto the resident grid.

    ``recs``: [nblk, 8, C] from :func:`wproj_resident_records` — records in
    any order (multi-channel runs reuse the uvw-derived rows and swap only
    rows 3:5, with no re-binning at all).
    """
    nw, qpx, _, gh, gw = bank_re.shape
    H, W = grid_shape
    HP, WP2 = _geometry(H, W)
    nblk = recs.shape[0]

    bank_a, bank_b = _interleave_bank(
        bank_re.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
        bank_im.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, unroll=unroll),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(recs, bank_a, bank_b)

    g = out[PAD:PAD + H, 2 * PAD:2 * PAD + 2 * W]
    return g[:, 0::2], g[:, 1::2]


def wproj_scatter_resident(bank_re, bank_im, grid_shape: Tuple[int, int], p,
                           wbin, vis_re, vis_im, interpret: bool = False):
    """Resident-grid scatter; real/imag planes in and out (cf. the tiled
    ``wproj_pallas.wproj_scatter_planes`` — same contract, no binning)."""
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PAD, "kernel support exceeds crop margin"
    recs = wproj_resident_records(grid_shape, qpx, gh, gw, p, wbin,
                                  vis_re, vis_im)
    return wproj_resident_from_records(bank_re, bank_im, grid_shape, recs,
                                       interpret=interpret)


def wproj_gridder_resident(bank_conj, grid_shape, p, wbin, vis,
                           interpret: bool = False):
    """Complex-API wrapper matching ``kernels.wproj_gridder``."""
    g_re, g_im = wproj_scatter_resident(
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
