"""Probe: pair-merged stores for the w-proj gridder.

Records are sorted by (tile, destination-block class) where class =
(y0a/8, x2a/128); each class run is padded to even length (cheap:
boundary-scatter+cumsum lookups + per-field 1-D takes).  The kernel then
merges each record pair into ONE accumulator RMW — pairs are guaranteed to
share their aligned destination block, and the select-mask zeroing makes
boundary/pad records harmless inside a merged pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ska_sdp_tpu.ops.coords import frac_coords
from ska_sdp_tpu.kernels.wproj_pallas import (CHUNK, PAD, PADX, TX, TY,
                                              _align, _fold_tiles, _geometry,
                                              _interleave_bank)

UNROLL = 32
G = 2       # records merged per RMW (classes padded to multiples of G)
NCLS = (TY // 8) * ((2 * TX) // 128)    # destination blocks per tile


def _kernel(starts_ref, recs_hbm, bank_a_ref, bank_b_ref,
            out_ref, recs_s, acc, acc2, sems, *, gh: int, gw: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    SH = _align(gh + 7, 8)
    SW = _align(2 * gw + 127, 128)
    nk = bank_a_ref.shape[0]

    acc[:] = jnp.zeros_like(acc)
    acc2[:] = jnp.zeros_like(acc2)

    b_lo = start // CHUNK

    def chunk_body(c, _):
        b = b_lo + c
        cp = pltpu.make_async_copy(recs_hbm.at[b], recs_s, sems.at[0])
        cp.start()
        cp.wait()
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        def _compute(i):
            in_r = (i >= lo) & (i < hi)
            y0 = recs_s[0, i].astype(jnp.int32)
            x0 = recs_s[1, i].astype(jnp.int32)
            k = recs_s[2, i].astype(jnp.int32)
            k = jnp.minimum(k, jnp.int32(nk - 1))
            vr = jnp.where(in_r, recs_s[3, i], 0.0)
            vi = jnp.where(in_r, recs_s[4, i], 0.0)
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
            for u in range(0, UNROLL, G):
                merged = items[u][0]
                for g in range(1, G):
                    merged = merged + items[u + g][0]
                y0a, x2a = items[u][1], items[u][2]
                tgt = acc if (u // G) % 2 == 0 else acc2
                tgt[pl.ds(y0a, SH), pl.ds(x2a, SW)] += merged
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, vis_body, 0, unroll=False)
        return 0

    nblocks = jnp.where(
        end > start, (end - jnp.int32(1)) // CHUNK - b_lo + 1, 0
    )
    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)
    out_ref[0] = acc[:] + acc2[:]


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
    y0l = y0p - ty * TY
    x0l = x0p - tx * TX
    cls = (y0l // 8) * ((2 * TX) // 128) + (2 * x0l) // 128
    run = jnp.where(valid, t * NCLS + cls, ntiles * NCLS).astype(jnp.int32)
    nruns = ntiles * NCLS

    order = jnp.argsort(run)
    run_s = run[order]
    fields = [
        y0l.astype(jnp.float32), x0l.astype(jnp.float32),
        kidx.astype(jnp.float32),
        jnp.where(valid, vis_re, 0.0).astype(jnp.float32),
        jnp.where(valid, vis_im, 0.0).astype(jnp.float32),
    ]
    fields = [f[order] for f in fields]
    n = fields[0].shape[0]

    run_starts = jnp.searchsorted(run_s, jnp.arange(nruns + 1)).astype(
        jnp.int32
    )
    run_counts = run_starts[1:] - run_starts[:-1]
    run_counts_pad = ((run_counts + G - 1) // G) * G
    run_starts_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(run_counts_pad).astype(jnp.int32)]
    )
    n_pad = _align(_align(n, G) + nruns * G, CHUNK)

    def spread(vals):      # per-run values → per-padded-slot via cumsum
        buf = jnp.zeros((n_pad,), jnp.int32)
        deltas = vals - jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), vals[:-1]]
        )
        buf = buf.at[run_starts_pad[:-1]].add(deltas)
        return jnp.cumsum(buf)

    j = jnp.arange(n_pad, dtype=jnp.int32)
    sp_j = spread(run_starts_pad[:-1])
    s_j = spread(run_starts[:-1])
    c_j = spread(run_counts)
    local = j - sp_j
    ok = local < c_j
    src = jnp.where(ok, s_j + local, 0)
    okf = ok.astype(jnp.float32)
    rows = [f[src] * okf for f in fields] + [
        jnp.zeros((n_pad,), jnp.float32)] * 3
    recs = jnp.stack(rows)
    recs = recs.reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)

    tile_starts = run_starts_pad[jnp.arange(ntiles + 1) * NCLS]
    return recs, tile_starts.astype(jnp.int32), (Hp, Wp, nty, ntx)


def wproj_scatter_planes_pm(bank_re, bank_im, grid_shape, p, wbin,
                            vis_re, vis_im, interpret=False):
    nw, qpx, _, gh, gw = bank_re.shape
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
