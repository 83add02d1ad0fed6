"""Probe v4: grouped shared-lane-roll w-proj gridder.

Records are sorted by (tile, cc) where cc = x0 mod 128 (the lane-shift
class). Each (tile, cc) run is padded to a multiple of G=8 null records, so
the kernel can process groups of 8 records that all share one lane shift:

  per group:  8x [FMA + pad + sublane-roll + concat]  ->  (192, 384) block
              ONE lane roll by 2*cc                   (amortized 8x)
              8x dynamic RMW into the tile accumulator

The lane roll was measured at ~67 ns/vis in the production kernel (see
BENCH.md ablations); amortizing it 8x should save ~55 ns/vis at the price
of ~9% padded null records.
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

TY, TX = 128, 256
PAD = 16
PADX = 128
CHUNK = 256
G = 8                      # records per roll group


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
    SH = _align(gh + 7, 8)
    SW = _align(2 * gw + 255, 128)

    acc[:] = jnp.zeros_like(acc)

    b_lo = start // CHUNK

    def chunk_body(c, _):
        b = b_lo + c
        cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
        cp.start()
        cp.wait()
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        def group_body(g, _):
            i0 = g * G

            @pl.when((i0 >= lo) & (i0 < hi))
            def _():
                # shared lane-shift class for the group
                x00 = recs_s[1, i0].astype(jnp.int32)
                cc = jax.lax.rem(x00, jnp.int32(128))
                parts = []
                ys = []
                xs = []
                for j in range(G):
                    i = i0 + j
                    y0 = recs_s[0, i].astype(jnp.int32)
                    x0 = recs_s[1, i].astype(jnp.int32)
                    k = recs_s[2, i].astype(jnp.int32)
                    vr = recs_s[3, i]
                    vi = recs_s[4, i]
                    patch = vr * bank_a_ref[k] + vi * bank_b_ref[k]
                    r = jax.lax.rem(y0, jnp.int32(8))
                    patch = jnp.pad(patch, ((0, SH - gh), (0, SW - 2 * gw)))
                    patch = pltpu.roll(patch, r, 0)
                    parts.append(patch)
                    ys.append(pl.multiple_of(y0 - r, 8))
                    xs.append(pl.multiple_of((x0 - cc) * 2, 256))
                big = jnp.concatenate(parts, axis=0)       # (G*SH, SW)
                big = pltpu.roll(big, 2 * cc, 1)           # ONE lane roll
                for j in range(G):
                    acc[pl.ds(ys[j], SH), pl.ds(xs[j], SW)] += (
                        big[j * SH:(j + 1) * SH]
                    )

            return 0

        jax.lax.fori_loop(0, CHUNK // G, group_body, 0, unroll=False)
        return 0

    nblocks = jnp.where(
        end > start, (end - jnp.int32(1)) // CHUNK - b_lo + 1, 0
    )
    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
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
    """Sort by (tile, cc); pad each (tile, cc) run to a multiple of G.

    Group padding is gather-based: padded slot j maps back to a source
    record or to a null record (vr=vi=0) whose x0 carries the run's cc so
    the group's shared shift stays consistent.
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
    x0l = (x0p - tx * TX).astype(jnp.int32)
    cc = jax.lax.rem(x0l, jnp.int32(128))
    run = t * 128 + cc                      # (tile, cc) run id; invalid last
    nruns = ntiles * 128

    order = jnp.argsort(run)
    run_s = run[order]
    recs = jnp.stack(
        [
            (y0p - ty * TY)[order].astype(jnp.float32),
            x0l[order].astype(jnp.float32),
            kidx[order].astype(jnp.float32),
            jnp.where(valid, vis_re, 0.0)[order].astype(jnp.float32),
            jnp.where(valid, vis_im, 0.0)[order].astype(jnp.float32),
        ]
    )  # [5, n]
    n = recs.shape[1]

    run_starts = jnp.searchsorted(run_s, jnp.arange(nruns + 1)).astype(
        jnp.int32
    )
    run_counts = run_starts[1:] - run_starts[:-1]
    run_counts_pad = ((run_counts + G - 1) // G) * G
    run_starts_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(run_counts_pad).astype(jnp.int32)]
    )
    # static worst case; actual live prefix is run_starts_pad[-1]
    n_pad = _align(_align(n, G) + nruns * G, CHUNK)

    j = jnp.arange(n_pad, dtype=jnp.int32)
    rj = jnp.searchsorted(run_starts_pad, j, side="right") - 1
    rj = jnp.clip(rj, 0, nruns - 1)
    local = j - run_starts_pad[rj]
    ok = local < run_counts[rj]
    src = jnp.where(ok, run_starts[rj] + local, 0)
    recs_p = jnp.where(ok[None, :], recs[:, src], 0.0)
    # null records: keep the run's cc in x0 so group shift is uniform;
    # y0=0, k=0, vr=vi=0 make them no-ops.
    cc_of_run = (rj % 128).astype(jnp.float32)
    recs_p = recs_p.at[1].set(jnp.where(ok, recs_p[1], cc_of_run))
    recs_p = jnp.concatenate(
        [recs_p, jnp.zeros((3, n_pad), jnp.float32)], axis=0
    )
    recs_p = recs_p.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    # per-tile starts in the padded stream
    tile_starts = run_starts_pad[jnp.arange(ntiles + 1) * 128]
    return recs_p, tile_starts.astype(jnp.int32), (Hp, Wp, nty, ntx)


def _interleave_bank(bank_re, bank_im):
    nwq, gh, gw = bank_re.shape
    a = jnp.stack([bank_re, bank_im], axis=-1).reshape(nwq, gh, 2 * gw)
    b = jnp.stack([-bank_im, bank_re], axis=-1).reshape(nwq, gh, 2 * gw)
    return a, b


def wproj_scatter_planes_v4(bank_re, bank_im, grid_shape, p, wbin,
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
    from ska_sdp_tpu.kernels.wproj_pallas import wproj_scatter_planes as v1

    # correctness vs production v1 kernel
    NW, QPX, S = 4, 4, 15
    H = W = 512
    n = 20000
    bank_re = rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32)
    bank_im = rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32)
    p = rng.uniform(-0.49, 0.49, size=(n, 3)).astype(np.float32)
    wbin = rng.integers(0, NW, size=n).astype(np.int32)
    vr = rng.standard_normal(n).astype(np.float32)
    vi = rng.standard_normal(n).astype(np.float32)

    a = (jnp.asarray(bank_re), jnp.asarray(bank_im), jnp.asarray(p),
         jnp.asarray(wbin), jnp.asarray(vr), jnp.asarray(vi))
    g4 = jax.jit(functools.partial(wproj_scatter_planes_v4,
                                   grid_shape=(H, W)))(
        a[0], a[1], p=a[2], wbin=a[3], vis_re=a[4], vis_im=a[5])
    g1 = jax.jit(functools.partial(v1, grid_shape=(H, W)))(
        a[0], a[1], p=a[2], wbin=a[3], vis_re=a[4], vis_im=a[5])
    err = max(
        float(jnp.abs(g4[0] - g1[0]).max()),
        float(jnp.abs(g4[1] - g1[1]).max()),
    ) / float(jnp.abs(g1[0]).max())
    print("v4 rel err vs v1:", err)
    assert err < 2e-5, err

    # timing, bench shape
    NW, QPX, S = 32, 8, 15
    n_grid = 2400
    N = 1 << 20
    bank_re = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    bank_im = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-0.42, 0.42, size=(N, 3)).astype(np.float32))
    wbin = jnp.asarray(rng.integers(0, NW, size=N).astype(np.int32))
    vr = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    @jax.jit
    def step(br, bi, p, wb, vr, vi, salt):
        gr, gi = wproj_scatter_planes_v4(br, bi, (n_grid, n_grid), p, wb,
                                         vr, vi + salt)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    args = (bank_re, bank_im, p, wbin, vr, vi)
    chk = float(step(*args, jnp.float32(0.0)))
    t0 = time.perf_counter()
    K = 5
    for k in range(K):
        chk = float(step(*args, jnp.float32(1e-6 * (k + 1))))
    dt = (time.perf_counter() - t0) / K
    print(f"v4: {N/dt/1e6:.2f} M vis/s  ({dt*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
