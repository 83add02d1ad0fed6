"""Pallas TPU kernel: resident-grid w-projection degridding (grid→vis).

The adjoint gather with the WHOLE padded interleaved uv-grid resident in
VMEM (see ``wproj_resident_pallas`` for the capacity argument).  Records
are consumed in INPUT order:

* no record sort, no per-tile CHUNK padding, no gather-padded range
  machinery (the three n_pad-sized gathers of the tiled degridder's
  preprocessing — VERDICT r2 #5 — simply no longer exist), and no unsort:
  per-record partials come out in visibility order;
* per record: one aligned (24, 256) dynamic window read from the resident
  grid, two reverse rolls (undoing the scatter placement), interleaved
  products against the A/B tap planes, and a sublane tree-reduce to a
  (1, 128) lane-partial row (zero-padded past 2·gw) written straight into
  the auto-pipelined output block;
* epilogue: one dense lane reduction + validity mask.

Exact linear adjoint of ``wproj_resident_pallas`` (dot-product test in
``tests/test_pallas_degrid.py``); matches ``ops.degrid_wproj`` semantics
(OOB window cells read the zeroed margin → 0, as the XLA gather's OOB→0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wproj_pallas import _interleave_bank
from .wproj_resident_pallas import C, PAD, SH, SW, VMEM_BUDGET, _geometry, \
    wproj_resident_records

UNROLL = 16


def _kernel(recs_ref, gp_ref, bank_a_ref, bank_b_ref, out_ref, *,
            gh: int, gw: int, unroll: int):
    nk = bank_a_ref.shape[0]

    def _one(i):
        y0 = recs_ref[0, 0, i].astype(jnp.int32)
        x0 = recs_ref[0, 1, i].astype(jnp.int32)
        k = jnp.minimum(recs_ref[0, 2, i].astype(jnp.int32), jnp.int32(nk - 1))
        r = jax.lax.rem(y0, jnp.int32(8))
        x2 = x0 * 2
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - r, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        win = gp_ref[pl.ds(y0a, SH), pl.ds(x2a, SW)]
        win = pltpu.roll(win, jnp.int32(SW) - rem, 1)
        win = pltpu.roll(win, jnp.int32(SH) - r, 0)
        w = win[:gh, :2 * gw]
        ra = jnp.sum(w * bank_a_ref[k], axis=0, keepdims=True)
        rb = jnp.sum(w * bank_b_ref[k], axis=0, keepdims=True)
        return ra, rb

    def body(iu, _):
        rows = []
        for j in range(unroll):
            ra, rb = _one(iu * unroll + j)
            rows.append(ra)
            rows.append(rb)
        blockv = jnp.concatenate(rows, axis=0)          # (2·unroll, 2·gw)
        blockv = jnp.pad(blockv, ((0, 0), (0, 128 - 2 * gw)))
        off = pl.multiple_of(iu * (2 * unroll), 8)
        out_ref[0, pl.ds(off, 2 * unroll), :] = blockv
        return 0

    jax.lax.fori_loop(0, C // unroll, body, 0, unroll=False)


def wproj_degrid_resident_planes(bank_re, bank_im, grid_re, grid_im, p, wbin,
                                 interpret: bool = False):
    """Resident-grid degridding; real/imag planes in and out.

    Args mirror ``wproj_degrid_pallas.wproj_degrid_planes`` (RAW bank —
    the interleaved A/B planes apply the conjugate).
    """
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PAD, "kernel support exceeds crop margin"
    assert 2 * gw <= 128
    H, W = grid_re.shape
    n = p.shape[0]
    HP, WP2 = _geometry(H, W)

    # packed records in input order (vis rows unused by the gather);
    # the packer also hands back the validity mask for the output epilogue
    zeros = jnp.zeros((n,), jnp.float32)
    recs, valid = wproj_resident_records((H, W), qpx, gh, gw, p, wbin,
                                         zeros, zeros, return_valid=True)
    nblk = recs.shape[0]

    gp = jnp.zeros((HP, WP2), jnp.float32)
    inter = jnp.stack([grid_re.astype(jnp.float32),
                       grid_im.astype(jnp.float32)], axis=-1).reshape(H, 2 * W)
    gp = gp.at[PAD:PAD + H, 2 * PAD:2 * PAD + 2 * W].set(inter)

    bank_a, bank_b = _interleave_bank(
        bank_re.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
        bank_im.reshape(nw * qpx * qpx, gh, gw).astype(jnp.float32),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, gh=gh, gw=gw, unroll=UNROLL),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # resident grid
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank A
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bank B
        ],
        out_specs=pl.BlockSpec((1, 2 * C, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, 2 * C, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(recs, gp, bank_a, bank_b)

    # dense epilogue: lane reduce; rows alternate (re, im) per record in
    # input order — reshape instead of strided slicing (sub-128-minor
    # strided reads are the known slow path, BENCH.md)
    partial = jnp.sum(out, axis=-1).reshape(-1, 2)      # [n_pad, 2]
    vis_re = jnp.where(valid, partial[:n, 0], 0.0)
    vis_im = jnp.where(valid, partial[:n, 1], 0.0)
    return vis_re, vis_im


def wproj_degridder_resident(bank, grid, p, wbin, interpret: bool = False):
    """Complex-API wrapper matching ``ops.degrid_wproj``."""
    vr, vi = wproj_degrid_resident_planes(
        jnp.real(bank).astype(jnp.float32),
        jnp.imag(bank).astype(jnp.float32),
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        p,
        wbin,
        interpret=interpret,
    )
    return jax.lax.complex(vr, vi)
