"""Pallas TPU kernel: IDG-AW — pair-chunked subgrid matmuls, A-screens,
resident-grid placement.

The TPU realization of ``ops.idg_aw.idg_grid_aw`` (the XLA path is the
oracle).  One grid program per pair-chunk:

* the chunk's records stream in as a pipelined [8, C] VMEM block (rows
  dy, dx, w, vr, vi from the shared ``_chunk_pair_runs`` prep — records
  already grouped by antenna pair and masked for fit/pair/OOB);
* phase matrices are built vectorized over the C record lanes and the
  visibility-weighted outer-product sum runs as four (S, C)×(C, S) MXU
  matmuls — identical inner loop to ``idg_pallas``;
* the chunk's subgrid image is multiplied ONCE by the conjugated pair
  screen ``conj(A[a1]·A[a2])`` (two dynamic VMEM row gathers + one
  elementwise complex multiply — the whole AW surcharge over plain IDG);
* the taper is folded into the DFT factors; the second sandwich factor
  is pre-interleaved (re|im lane pairs) so the patch emerges in the
  resident grid's interleaved layout straight off the MXU;
* the (S, 2S) patch is placed at the chunk's own uv origin into the
  WHOLE padded uv-grid kept resident in VMEM (the
  ``wproj_resident_pallas`` pattern: pad → two ``pltpu.roll`` → one
  aligned read-modify-write) — subgrid origins are per-chunk dynamic,
  so the fixed-tiling overlap-add fold does not apply.

Empty chunks (run-padding tails) are skipped via a per-chunk live flag.

VMEM: resident padded grid (~53 MB at 2400², S=64) + screens
(nant·S·S·8 B) + F factors; ``idg_aw_resident_fits`` gates dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.idg_aw import CHUNK_AW, _chunk_pair_runs
from .wproj_pallas import _align

# VMEM budget (measured ~112 MB live works on v5e; leave slack for Mosaic)
IDG_AW_VMEM_BUDGET = 100 * 1024 * 1024


def _geometry(N: int, Nx: int, S: int):
    """Resident padded accumulator (rows, interleaved lanes) for subgrid
    placement: margin S each side (chunk origins are clipped to
    [0, N+2S-S]) + roll slop (8 sublanes / 128 lanes)."""
    HP = _align(N + 2 * S, 8) + 8
    WP2 = _align(2 * (Nx + 2 * S), 128) + 128
    return HP, WP2


def idg_aw_resident_fits(N: int, Nx: int, nant: int, S: int = 64) -> bool:
    if S != 64:
        return False          # window/roll geometry derived for S=64
    HP, WP2 = _geometry(N, Nx, S)
    acc = HP * WP2 * 4
    screens = nant * S * 128 * 4 * 2          # lane-padded to 128
    mats = 6 * S * 2 * S * 4
    slack = 8 * 1024 * 1024
    return acc + screens + mats + slack <= IDG_AW_VMEM_BUDGET


def _kernel(y0_ref, x0_ref, a1_ref, a2_ref, live_ref, recs_ref,
            sr_ref, si_ref, fre_ref, fim_ref, hr_ref, hi_ref, out_ref,
            *, S: int, theta: float, theta_x: float):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_ref[c] > 0)
    def _():
        C = recs_ref.shape[2]
        cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
              ).astype(jnp.float32)
        lq2y = (cq * (theta / S)) ** 2
        lq2x = (cq * (theta_x / S)) ** 2

        dy = recs_ref[0, 0:1, :]
        dx = recs_ref[0, 1:2, :]
        w = recs_ref[0, 2:3, :]
        vr = recs_ref[0, 3:4, :]
        vi = recs_ref[0, 4:5, :]

        two_pi_s = jnp.float32(2.0 * np.pi / S)
        pi_ = jnp.float32(np.pi)
        ph_y = two_pi_s * cq * dy - pi_ * lq2y * w          # (S, C)
        ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
        ey_re = jnp.cos(ph_y)
        ey_im = jnp.sin(ph_y)
        ex_re = jnp.cos(ph_x)
        ex_im = jnp.sin(ph_x)

        u_re = ey_re * vr - ey_im * vi
        u_im = ey_re * vi + ey_im * vr

        dn = (((1,), (1,)), ((), ()))                        # contract lanes
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        a_re = (
            jax.lax.dot_general(u_re, ex_re, dn, preferred_element_type=f32,
                                precision=hp)
            - jax.lax.dot_general(u_im, ex_im, dn, preferred_element_type=f32,
                                  precision=hp)
        )
        a_im = (
            jax.lax.dot_general(u_re, ex_im, dn, preferred_element_type=f32,
                                precision=hp)
            + jax.lax.dot_general(u_im, ex_re, dn, preferred_element_type=f32,
                                  precision=hp)
        )

        # pair screen: conj(A[a1] · A[a2]) — the whole AW surcharge
        nant = sr_ref.shape[0]
        i1 = jnp.minimum(a1_ref[c], nant - 1)
        i2 = jnp.minimum(a2_ref[c], nant - 1)
        r1, im1 = sr_ref[i1], si_ref[i1]
        r2, im2 = sr_ref[i2], si_ref[i2]
        p_re = r1 * r2 - im1 * im2
        p_im = -(r1 * im2 + im1 * r2)                        # conjugated
        t_re = a_re * p_re - a_im * p_im
        t_im = a_re * p_im + a_im * p_re

        # sandwich: b = F·a' (taper folded into F), then the interleaving
        # factors H emit the patch as re|im lane pairs directly
        dn_nt = (((1,), (0,)), ((), ()))
        b_re = (
            jax.lax.dot_general(fre_ref[:], t_re, dn_nt,
                                preferred_element_type=f32, precision=hp)
            - jax.lax.dot_general(fim_ref[:], t_im, dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )
        b_im = (
            jax.lax.dot_general(fre_ref[:], t_im, dn_nt,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(fim_ref[:], t_re, dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )
        patch = (
            jax.lax.dot_general(b_re, hr_ref[:], dn_nt,
                                preferred_element_type=f32, precision=hp)
            + jax.lax.dot_general(b_im, hi_ref[:], dn_nt,
                                  preferred_element_type=f32, precision=hp)
        )                                                     # (S, 2S)

        y0 = y0_ref[c]
        x2 = x0_ref[c] * 2
        r = jax.lax.rem(y0, jnp.int32(8))
        rem = jax.lax.rem(x2, jnp.int32(128))
        y0a = pl.multiple_of(y0 - r, 8)
        x2a = pl.multiple_of(x2 - rem, 128)
        patch = jnp.pad(patch, ((0, 8), (0, 128)))
        patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
        out_ref[pl.ds(y0a, S + 8), pl.ds(x2a, 2 * S + 128)] += patch


def idg_aw_grid_pallas(grid_shape, p, a1, a2, w, vis_re, vis_im, scr_re,
                       scr_im, *, theta: float, subgrid: int = 64,
                       chunk: int = CHUNK_AW, support: int = 15,
                       taper_beta: float = 12.0, max_runs: int = 4096,
                       fit_margin: int = 0, interpret: bool = False):
    """IDG-AW gridding on TPU; returns (grid_re, grid_im, n_dropped).

    Same contract as ``ops.idg_aw.idg_grid_aw`` (the oracle): ``scr_re/im``
    are the UNconjugated [nant, S, S] screens from ``aw_screens`` split
    into planes; the dirty image must be divided by ``taper_fine``.
    """
    N, Nx = grid_shape
    S = subgrid
    if fit_margin == 0:
        fit_margin = S // 2 - support // 2 - 12
    assert fit_margin > 0, "subgrid too small for support + taper margin"
    vis = jax.lax.complex(vis_re.astype(jnp.float32),
                          vis_im.astype(jnp.float32))
    dy, dx, wv, vv, y0, x0, ia1, ia2, n_dropped, geom, _ = _chunk_pair_runs(
        grid_shape, p, a1, a2, w, vis, subgrid=S, chunk=chunk,
        support=support, max_runs=max_runs, fit_margin=fit_margin,
    )
    S_, PADM, HPx, WPx, n_chunks = geom
    HP, WP2 = _geometry(N, Nx, S)

    vr = jnp.real(vv)
    vi = jnp.imag(vv)
    live = jnp.any(vv != 0, axis=1).astype(jnp.int32)
    zero = jnp.zeros_like(dy)
    recs = jnp.stack(
        [dy.astype(jnp.float32), dx.astype(jnp.float32),
         wv.astype(jnp.float32), vr, vi, zero, zero, zero], axis=0
    ).transpose(1, 0, 2)                                  # [n_chunks, 8, C]

    # DFT factor with taper folded (1/S per factor ⇒ 1/S² total) and the
    # lane-interleaving second factors H (patch[y, 2j|2j+1] = re|im)
    k = np.arange(S, dtype=np.float64) - S // 2
    F = np.exp(-2j * np.pi * np.outer(k, k) / S) / S
    if taper_beta > 0:
        x_ = k / (S / 2)
        t1 = np.i0(taper_beta * np.sqrt(np.clip(1.0 - x_ * x_, 0.0, 1.0)))
        F = F * (t1 / np.i0(taper_beta))[None, :]
    Hr = np.zeros((S, 2 * S))
    Hi = np.zeros((S, 2 * S))
    Hr[:, 0::2] = F.real.T
    Hr[:, 1::2] = F.imag.T
    Hi[:, 0::2] = -F.imag.T
    Hi[:, 1::2] = F.real.T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, chunk), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scr im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # F im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # H im
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HP, WP2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=IDG_AW_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y0, x0, ia1, ia2, live, recs,
      scr_re.astype(jnp.float32), scr_im.astype(jnp.float32),
      jnp.asarray(F.real, jnp.float32), jnp.asarray(F.imag, jnp.float32),
      jnp.asarray(Hr, jnp.float32), jnp.asarray(Hi, jnp.float32))

    g = out[:N + 2 * PADM, :2 * (Nx + 2 * PADM)][
        PADM:PADM + N, 2 * PADM:2 * PADM + 2 * Nx]
    return g[:, 0::2], g[:, 1::2], n_dropped


def idg_aw_gridder_pallas(grid_shape, p, a1, a2, w, vis, screens, *,
                          theta: float, subgrid: int = 64,
                          chunk: int = CHUNK_AW, support: int = 15,
                          taper_beta: float = 12.0, max_runs: int = 4096,
                          fit_margin: int = 0, interpret: bool = False):
    """Complex wrapper matching ``ops.idg_aw.idg_grid_aw``'s signature;
    returns (guv, n_dropped)."""
    g_re, g_im, nd = idg_aw_grid_pallas(
        grid_shape, p, a1, a2, w,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        jnp.real(screens).astype(jnp.float32),
        jnp.imag(screens).astype(jnp.float32),
        theta=theta, subgrid=subgrid, chunk=chunk, support=support,
        taper_beta=taper_beta, max_runs=max_runs, fit_margin=fit_margin,
        interpret=interpret,
    )
    return jax.lax.complex(g_re, g_im), nd
