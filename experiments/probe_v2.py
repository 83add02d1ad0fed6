"""Probe: v2 w-proj gridder kernel.

Changes vs ska_sdp_tpu/kernels/wproj_pallas.py:
  1. store window (24, 256) with 128-lane-aligned dynamic offset (was
     (24, 384) with 256-lane alignment) — fewer vregs per pad/roll/RMW.
  2. per-tile record ranges padded to whole CHUNK blocks in preprocessing
     (gather-based), so the inner loop has no lo/hi branch per visibility.

Run on TPU: correctness vs ops.convgrid_wproj on a small case, then 1M-vis
timing on the bench shape.
"""

from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ska_sdp_tpu.ops.coords import frac_coords
from ska_sdp_tpu.utils import oracle

TY, TX = 128, 256
PAD = 16
PADX = 128
CHUNK = 256
UNROLL = 8


def _align(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(H: int, W: int):
    Hp = -(-(H + 2 * PAD) // TY) * TY
    Wp = -(-(W + 2 * PAD) // TX) * TX
    return Hp, Wp, Hp // TY, Wp // TX


def _kernel(starts_ref, recs_hbm, bank_a_ref, bank_b_ref,
            out_ref, recs_s, acc, sems, *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)            # 24
    SW = _align(2 * gw + 127, 128)    # 256: rem<128 (even) + 2*gw <= 156

    acc[:] = jnp.zeros_like(acc)

    b_lo = start // CHUNK             # starts are CHUNK-aligned

    def chunk_body(c, _):
        b = b_lo + c
        cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
        cp.start()
        cp.wait()

        def _vis_one(i):
            k0 = recs_s[2, i].astype(jnp.int32)

            @pl.when(k0 >= 0)
            def _():
                _vis_inner(i, k0)

        def _vis_inner(i, k):
            y0 = recs_s[0, i].astype(jnp.int32)
            x0 = recs_s[1, i].astype(jnp.int32)
            vr = recs_s[3, i]
            vi = recs_s[4, i]
            patch = vr * bank_a_ref[k] + vi * bank_b_ref[k]
            r = jax.lax.rem(y0, jnp.int32(8))
            x2 = x0 * 2
            rem = jax.lax.rem(x2, jnp.int32(128))
            y0a = pl.multiple_of(y0 - r, 8)
            x2a = pl.multiple_of(x2 - rem, 128)
            patch = jnp.pad(patch, ((0, SH - gh), (0, SW - 2 * gw)))
            patch = pltpu.roll(pltpu.roll(patch, r, 0), rem, 1)
            acc[pl.ds(y0a, SH), pl.ds(x2a, SW)] += patch

        def vis_body(iu, _):
            for u in range(UNROLL):
                _vis_one(iu * UNROLL + u)
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, vis_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, (end - start) // CHUNK, chunk_body, 0, unroll=False)
    out_ref[0] = acc[:]


def _fold_tiles(tiles, nty: int, ntx: int, xs: int = 1):
    TXs, PADXs = xs * TX, xs * PADX
    core = tiles[:, :, :TY, :TXs]
    right = tiles[:, :, :TY, TXs:]
    down = tiles[:, :, TY:, :TXs]
    corner = tiles[:, :, TY:, TXs:]
    g = jnp.zeros((nty + 1, TY, ntx + 1, TXs), tiles.dtype)
    g = g.at[:nty, :, :ntx, :].add(core.transpose(0, 2, 1, 3))
    g = g.at[:nty, :, 1:, :PADXs].add(right.transpose(0, 2, 1, 3))
    g = g.at[1:, :PAD, :ntx, :].add(down.transpose(0, 2, 1, 3))
    g = g.at[1:, :PAD, 1:, :PADXs].add(corner.transpose(0, 2, 1, 3))
    return g.reshape((nty + 1) * TY, (ntx + 1) * TXs)


def _preprocess(grid_shape, qpx, gh, gw, p, wbin, vis_re, vis_im):
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
    recs = jnp.stack(
        [
            (y0p - ty * TY)[order].astype(jnp.float32),
            (x0p - tx * TX)[order].astype(jnp.float32),
            kidx[order].astype(jnp.float32),
            jnp.where(valid, vis_re, 0.0)[order].astype(jnp.float32),
            jnp.where(valid, vis_im, 0.0)[order].astype(jnp.float32),
        ]
    )  # [5, n]

    n = recs.shape[1]
    starts = jnp.searchsorted(t_s, jnp.arange(ntiles + 1)).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    counts_pad = _align_arr(counts, CHUNK)
    starts_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_pad).astype(jnp.int32)]
    )
    # static worst case: every tile wastes < CHUNK slots
    n_pad = _align(n, CHUNK) + ntiles * CHUNK

    # gather: padded slot j in tile tj reads source start[tj] + local
    j = jnp.arange(n_pad, dtype=jnp.int32)
    tj = jnp.searchsorted(starts_pad, j, side="right") - 1
    tj = jnp.clip(tj, 0, ntiles - 1)
    local = j - starts_pad[tj]
    ok = local < counts[tj]
    src = jnp.where(ok, starts[tj] + local, 0)
    recs_p = jnp.where(ok[None, :], recs[:, src], 0.0)
    recs_p = recs_p.at[2].set(jnp.where(ok, recs_p[2], -1.0))
    recs_p = jnp.concatenate(
        [recs_p, jnp.zeros((3, n_pad), jnp.float32)], axis=0
    )  # 8 rows for sublane alignment
    recs_p = recs_p.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)
    return recs_p, starts_pad, (Hp, Wp, nty, ntx)


def _align_arr(x, m):
    return ((x + m - 1) // m) * m


def _interleave_bank(bank_re, bank_im):
    nwq, gh, gw = bank_re.shape
    a = jnp.stack([bank_re, bank_im], axis=-1).reshape(nwq, gh, 2 * gw)
    b = jnp.stack([-bank_im, bank_re], axis=-1).reshape(nwq, gh, 2 * gw)
    return a, b


def wproj_scatter_planes_v2(bank_re, bank_im, grid_shape, p, wbin,
                            vis_re, vis_im, interpret=False):
    nw, qpx, _, gh, gw = bank_re.shape
    assert gh <= PAD and gw <= PADX
    H, W = grid_shape
    recs, starts, (Hp, Wp, nty, ntx) = _preprocess(
        grid_shape, qpx, gh, gw, p, wbin, vis_re, vis_im
    )
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TYP, TXP2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, CHUNK), jnp.float32),
            pltpu.VMEM((TYP, TXP2), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
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
    g = g[PAD: PAD + H, 2 * PAD: 2 * (PAD + W)]
    return g[:, 0::2], g[:, 1::2]


def main():
    rng = np.random.default_rng(0)

    # --- correctness: small case vs XLA oracle ---
    NW, QPX, S = 4, 4, 15
    H = W = 512
    n = 20000
    bank = (rng.standard_normal((NW, QPX, QPX, S, S))
            + 1j * rng.standard_normal((NW, QPX, QPX, S, S))).astype(np.complex64)
    p = rng.uniform(-0.49, 0.49, size=(n, 3)).astype(np.float32)
    wbin = rng.integers(0, NW, size=n).astype(np.int32)
    vis = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    f = jax.jit(functools.partial(wproj_scatter_planes_v2, grid_shape=(H, W)))
    gr, gi = f(jnp.asarray(bank.real), jnp.asarray(bank.imag),
               p=jnp.asarray(p), wbin=jnp.asarray(wbin),
               vis_re=jnp.asarray(vis.real), vis_im=jnp.asarray(vis.imag))
    got = np.asarray(gr) + 1j * np.asarray(gi)

    from ska_sdp_tpu.kernels.wproj_pallas import wproj_scatter_planes
    f1 = jax.jit(functools.partial(wproj_scatter_planes, grid_shape=(H, W)))
    r1, i1 = f1(jnp.asarray(bank.real), jnp.asarray(bank.imag),
                p=jnp.asarray(p), wbin=jnp.asarray(wbin),
                vis_re=jnp.asarray(vis.real), vis_im=jnp.asarray(vis.imag))
    ref = np.asarray(r1) + 1j * np.asarray(i1)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
    print("rel err vs production v1 kernel:", err)
    assert err < 2e-5, err

    # --- timing: bench shape ---
    NW, QPX, S = 32, 8, 15
    THETA, LAM = 0.008, 300000
    n_grid = int(round(THETA * LAM))
    N = 1 << 20
    bank = (rng.standard_normal((NW, QPX, QPX, S, S))
            + 1j * rng.standard_normal((NW, QPX, QPX, S, S))).astype(np.complex64)
    uvw = rng.uniform(-0.42, 0.42, size=(N, 3)).astype(np.float32)
    wbin = rng.integers(0, NW, size=N).astype(np.int32)
    vis = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(np.complex64)

    @jax.jit
    def step(br, bi, p, wbin, vr, vi, salt):
        gr, gi = wproj_scatter_planes_v2(br, bi, (n_grid, n_grid), p, wbin,
                                         vr, vi + salt)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    args = (jnp.asarray(bank.real), jnp.asarray(bank.imag), jnp.asarray(uvw),
            jnp.asarray(wbin), jnp.asarray(vis.real), jnp.asarray(vis.imag))
    chk = float(step(*args, jnp.float32(0.0)))
    assert np.isfinite(chk)
    t0 = time.perf_counter()
    STEPS = 5
    for k in range(STEPS):
        chk = float(step(*args, jnp.float32(1e-6 * (k + 1))))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"v2: {N/dt/1e6:.2f} M vis/s  ({dt*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
