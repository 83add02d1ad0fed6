"""Pallas TPU kernel: image-domain gridding (IDG) — MXU subgrid matmuls.

The MXU-native gridding mode (``ops/idg.py`` documents the math).  The
XLA realization of IDG is bound by record rearrangement (random-access
gathers/scatters of padded record slots run ~30M elem/s on v5e); this
kernel removes every padded intermediate by walking SUBGRIDS the same way
``wproj_pallas`` walks tiles:

* records are sorted by subgrid id once in XLA (one fused multi-operand
  ``lax.sort``), packed [8, n] and streamed HBM→VMEM in CHUNK-record
  blocks; a subgrid's [start, end) range comes from prefetched CSR
  offsets, boundary blocks are shared with neighbouring programs and
  neutralized by zeroing the visibility (two vector selects — the
  branch-free pattern from the w-proj kernel, BENCH.md).
* per block, phase matrices are built **vectorized over the 128 record
  lanes**: ``ph[q, b] = (2π/S)·c_q·dy_b − π·w_b·l_q²`` is two rank-1
  broadcasts; sin/cos run on the VPU transcendental unit.
* the visibility-weighted outer-product sum ``a[q,r] = Σ_b v_b E_y[q,b]
  E_x[r,b]`` is four real (S,128)×(128,S) MXU matmuls per block —
  contraction over record lanes, ~1-2 cycles/visibility.
* the subgrid's uv patch is the centered DFT sandwich ``F·a·Fᵀ`` (taper
  folded into F — zero extra cost), emitted as an (S, 2S) re|im
  lane-concatenated block through the output pipeline; XLA folds the
  overlapping patches densely (``ops.idg._fold_overlap``).

Geometry: S = subgrid, T = S/2 stride; a visibility whose support anchor
sits in stride cell t of subgrid g has ≥ (S−T−s//2) cells of taper margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.idg import _fold_overlap, kaiser_taper

CHUNK = 256


def _align(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(starts_ref, recs_hbm, fre_ref, fim_ref, out_ref,
            recs_v, a_re, a_im, sems, *, S: int, theta: float,
            theta_x: float):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]

    a_re[:] = jnp.zeros_like(a_re)
    a_im[:] = jnp.zeros_like(a_im)

    cq = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) - (S // 2)
          ).astype(jnp.float32)
    lq2y = (cq * (theta / S)) ** 2
    lq2x = (cq * (theta_x / S)) ** 2
    b_lo = start // CHUNK
    nblocks = jnp.where(end > start, (end - 1) // CHUNK - b_lo + 1, 0)

    def dma(slot, c):
        return pltpu.make_async_copy(
            recs_hbm.at[b_lo + c], recs_v.at[slot], sems.at[slot]
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

        @pl.when(c + 1 < nblocks)
        def _():
            dma(1 - slot, c + 1).start()    # overlap next block's DMA

        dma(slot, c).wait()
        b = b_lo + c
        lo = jnp.maximum(start - b * CHUNK, 0)
        hi = jnp.minimum(end - b * CHUNK, CHUNK)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        ok = ((lane >= lo) & (lane < hi)).astype(jnp.float32)

        dy = recs_v[slot, 0:1, :]
        dx = recs_v[slot, 1:2, :]
        w = recs_v[slot, 2:3, :]
        vr = recs_v[slot, 3:4, :] * ok
        vi = recs_v[slot, 4:5, :] * ok

        two_pi_s = jnp.float32(2.0 * np.pi / S)
        pi_ = jnp.float32(np.pi)
        ph_y = two_pi_s * cq * dy - pi_ * lq2y * w     # (S, CHUNK)
        ph_x = two_pi_s * cq * dx - pi_ * lq2x * w
        ey_re = jnp.cos(ph_y)
        ey_im = jnp.sin(ph_y)
        ex_re = jnp.cos(ph_x)
        ex_im = jnp.sin(ph_x)

        u_re = ey_re * vr - ey_im * vi                 # (S, CHUNK)
        u_im = ey_re * vi + ey_im * vr

        dn = (((1,), (1,)), ((), ()))                  # contract lanes
        f32 = jnp.float32
        hp = jax.lax.Precision.HIGHEST
        a_re[:] += (
            jax.lax.dot_general(u_re, ex_re, dn, preferred_element_type=f32,
                                precision=hp)
            - jax.lax.dot_general(u_im, ex_im, dn, preferred_element_type=f32,
                                  precision=hp)
        )
        a_im[:] += (
            jax.lax.dot_general(u_re, ex_im, dn, preferred_element_type=f32,
                                precision=hp)
            + jax.lax.dot_general(u_im, ex_re, dn, preferred_element_type=f32,
                                  precision=hp)
        )
        return 0

    jax.lax.fori_loop(0, nblocks, chunk_body, 0, unroll=False)

    # centered DFT sandwich with the taper folded into F: patch = F a Fᵀ
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    dn_nt = (((1,), (0,)), ((), ()))                   # F · a
    b_re = (
        jax.lax.dot_general(fre_ref[:], a_re[:], dn_nt,
                            preferred_element_type=f32, precision=hp)
        - jax.lax.dot_general(fim_ref[:], a_im[:], dn_nt,
                              preferred_element_type=f32, precision=hp)
    )
    b_im = (
        jax.lax.dot_general(fre_ref[:], a_im[:], dn_nt,
                            preferred_element_type=f32, precision=hp)
        + jax.lax.dot_general(fim_ref[:], a_re[:], dn_nt,
                              preferred_element_type=f32, precision=hp)
    )
    dn_t = (((1,), (1,)), ((), ()))                    # (F·a) · Fᵀ
    c_re = (
        jax.lax.dot_general(b_re, fre_ref[:], dn_t,
                            preferred_element_type=f32, precision=hp)
        - jax.lax.dot_general(b_im, fim_ref[:], dn_t,
                              preferred_element_type=f32, precision=hp)
    )
    c_im = (
        jax.lax.dot_general(b_re, fim_ref[:], dn_t,
                            preferred_element_type=f32, precision=hp)
        + jax.lax.dot_general(b_im, fre_ref[:], dn_t,
                              preferred_element_type=f32, precision=hp)
    )
    out_ref[0] = jnp.concatenate([c_re, c_im], axis=1)


def _prep(N: int, Nx: int, S: int, T: int, PADM: int, nty: int, ntx: int,
          p, w, vis_re, vis_im, support: int):
    """Sort records by subgrid id; returns packed [nblk, 8, CHUNK] record
    blocks + CSR starts.  One fused multi-operand sort — no padded-slot
    arrays (the XLA IDG path's bottleneck).  Per-axis geometry: non-square
    grids supported (VERDICT r2 #4)."""
    n_sub = nty * ntx
    s = support
    yc = jnp.floor(N // 2 + p[:, 1] * N + 0.5).astype(jnp.int32)
    xc = jnp.floor(Nx // 2 + p[:, 0] * Nx + 0.5).astype(jnp.int32)
    y0 = yc - s // 2
    x0 = xc - s // 2
    valid = (y0 > -s) & (y0 < N) & (x0 > -s) & (x0 < Nx)
    y0p = jnp.where(valid, y0 + PADM, 0)
    x0p = jnp.where(valid, x0 + PADM, 0)
    gy = y0p // T
    gx = x0p // T
    t = jnp.where(valid, gy * ntx + gx, n_sub).astype(jnp.int32)

    # positions relative to the assigned subgrid's center
    fN = jnp.float32(N)
    fNx = jnp.float32(Nx)
    dy = (N // 2 + p[:, 1] * fN + PADM) - (gy * T + S // 2).astype(p.dtype)
    dx = (Nx // 2 + p[:, 0] * fNx + PADM) - (gx * T + S // 2).astype(p.dtype)
    vr = jnp.where(valid, vis_re, 0.0)
    vi = jnp.where(valid, vis_im, 0.0)

    t_s, dy_s, dx_s, w_s, vr_s, vi_s = jax.lax.sort(
        [t, dy.astype(jnp.float32), dx.astype(jnp.float32),
         w.astype(jnp.float32), vr.astype(jnp.float32),
         vi.astype(jnp.float32)], num_keys=1,
    )
    n = t_s.shape[0]
    n_pad = _align(max(n, 1), CHUNK)
    zero = jnp.zeros((n_pad - n,), jnp.float32)
    rows = [jnp.concatenate([r, zero]) for r in
            (dy_s, dx_s, w_s, vr_s, vi_s)]
    rows += [jnp.zeros((n_pad,), jnp.float32)] * 3     # sublane-tile align
    recs = jnp.stack(rows).reshape(8, n_pad // CHUNK, CHUNK).transpose(1, 0, 2)
    starts = jnp.searchsorted(t_s, jnp.arange(n_sub + 1)).astype(jnp.int32)
    return recs, starts


def idg_bin_records(grid_shape, p, w, vis_re, vis_im, *, subgrid: int = 64,
                    support: int = 15):
    """Bin + sort visibilities into the kernel's record stream.

    Returns (recs [nblk, 8, CHUNK], starts [n_sub+1]).  Exposed separately
    so multi-channel runs can amortize the sort (the ~30 ms/Mvis
    comparison-depth wall, BENCH.md round 2): channels sharing uvw reuse
    the binning and only the vis rows (recs[:, 3:5, :]) change.
    """
    N, Nx = grid_shape
    S = subgrid
    T = S // 2
    assert support <= T + 1
    PADM = T
    nty = -(-(N + 2 * PADM) // T) + 1
    ntx = -(-(Nx + 2 * PADM) // T) + 1
    return _prep(N, Nx, S, T, PADM, nty, ntx, p, w, vis_re, vis_im, support)


def idg_bin_records_multi(grid_shape, p, w, vis_re_mc, vis_im_mc, *,
                          subgrid: int = 64, support: int = 15):
    """Multi-channel binning: bin ONCE at the reference-channel coords.

    ``p``/``w`` are the scaled baselines at the REFERENCE channel;
    ``vis_re_mc``/``vis_im_mc`` are [nch, n] — each channel's (weighted,
    mirrored) visibility planes, sorted together with the geometry in the
    ONE fused ``lax.sort`` so no per-channel unsort gather is ever paid.

    Channel c's scaled coordinates are the reference's times
    r = f_c/f_ref, so its record geometry is an ELEMENTWISE update of the
    sorted base stream (:func:`idg_records_for_channel`):

        pos_c − center = r·(pos_ref − center)
        dy_c = r·dy + (r−1)·cy,   cy = gy·T + S/2 − N/2 − PADM
        w_c  = r·w

    (cy is the record's subgrid-center offset from the grid center —
    constant per subgrid, carried per record through the sort).

    Subgrid assignment is CENTERED — the stride offset is shifted so a
    record sits ~(S−s−T)/2 cells from both window edges (instead of the
    plain ``//T`` layout's hard 0-cell lower edge), giving per-channel
    drift symmetric slack; records a channel pushes outside the window
    are zeroed and counted by the recheck in
    :func:`idg_records_for_channel`.

    Returns (base [6, n_pad], vis_s [nch, 2, n_pad], starts) where base
    rows are (dy, dx, w, cy, cx, live).
    """
    N, Nx = grid_shape
    S = subgrid
    T = S // 2
    s = support
    assert s <= T + 1
    PADM = T
    nty = -(-(N + 2 * PADM) // T) + 1
    ntx = -(-(Nx + 2 * PADM) // T) + 1
    n_sub = nty * ntx

    f32 = jnp.float32
    yc = jnp.floor(N // 2 + p[:, 1] * N + 0.5).astype(jnp.int32)
    xc = jnp.floor(Nx // 2 + p[:, 0] * Nx + 0.5).astype(jnp.int32)
    y0 = yc - s // 2
    x0 = xc - s // 2
    valid = (y0 > -s) & (y0 < N) & (x0 > -s) & (x0 < Nx)
    y0p = jnp.where(valid, y0 + PADM, 0)
    x0p = jnp.where(valid, x0 + PADM, 0)
    # centered stride assignment: offset o = y0p − gy·T lands in
    # [c0, c0+T) with c0 = (S−s)//2 − T//2 — equal slack to both window
    # edges [0, S−s] for the per-channel drift recheck
    c0 = (S - s) // 2 - T // 2
    gy = jnp.clip((y0p - c0) // T, 0, nty - 1)
    gx = jnp.clip((x0p - c0) // T, 0, ntx - 1)
    t = jnp.where(valid, gy * ntx + gx, n_sub).astype(jnp.int32)

    fN = f32(N)
    fNx = f32(Nx)
    posy = (N // 2 + p[:, 1] * fN + PADM).astype(f32)
    posx = (Nx // 2 + p[:, 0] * fNx + PADM).astype(f32)
    ctry = (gy * T + S // 2).astype(f32)
    ctrx = (gx * T + S // 2).astype(f32)
    dy = posy - ctry
    dx = posx - ctrx
    cy = ctry - f32(N // 2 + PADM)
    cx = ctrx - f32(Nx // 2 + PADM)
    live = valid.astype(f32)

    nch = vis_re_mc.shape[0]
    vrows = []
    for c in range(nch):
        vrows.append(jnp.where(valid, vis_re_mc[c], 0.0).astype(f32))
        vrows.append(jnp.where(valid, vis_im_mc[c], 0.0).astype(f32))
    sorted_ = jax.lax.sort(
        [t, dy.astype(f32), dx.astype(f32), w.astype(f32), cy, cx, live]
        + vrows, num_keys=1,
    )
    t_s = sorted_[0]
    n = t_s.shape[0]
    n_pad = _align(max(n, 1), CHUNK)
    zero = jnp.zeros((n_pad - n,), f32)
    base = jnp.stack([jnp.concatenate([r, zero]) for r in sorted_[1:7]])
    vis_s = jnp.stack([jnp.concatenate([r, zero]) for r in sorted_[7:]]
                      ).reshape(nch, 2, n_pad)
    starts = jnp.searchsorted(t_s, jnp.arange(n_sub + 1)).astype(jnp.int32)
    return base, vis_s, starts


def idg_records_for_channel(base, vis_c, ratio, *, subgrid: int = 64,
                            support: int = 15):
    """Per-channel record update (elementwise — no sort, no gather).

    ``base``/``vis_c`` from :func:`idg_bin_records_multi` (``vis_c`` is
    the [2, n_pad] slice for this channel); ``ratio`` = f_c/f_ref as a
    traced scalar.  Returns (recs [nblk, 8, CHUNK] for
    :func:`idg_grid_from_records`, n_masked) — ``n_masked`` counts LIVE
    records whose patch the channel's coordinate drift pushed outside
    their subgrid window (dropped AND counted; zero when the channel
    group was planned within the drift slack).
    """
    S = subgrid
    s = support
    f32 = jnp.float32
    r = jnp.asarray(ratio, f32)
    dy, dx, w, cy, cx, live = (base[i] for i in range(6))
    dy_c = r * dy + (r - 1.0) * cy
    dx_c = r * dx + (r - 1.0) * cx
    w_c = r * w
    # patch-in-window recheck: floor(d + S/2 + 0.5) − s//2 ∈ [0, S−s]
    lo = f32(s // 2 - S / 2 - 0.5)
    hi = f32(S / 2 - s + s // 2 + 0.5)
    ok = ((dy_c >= lo) & (dy_c < hi) & (dx_c >= lo) & (dx_c < hi))
    okf = ok.astype(f32) * live
    n_masked = jnp.sum(live * (1.0 - ok.astype(f32))).astype(jnp.int32)
    rows = [dy_c, dx_c, w_c, vis_c[0] * okf, vis_c[1] * okf]
    n_pad = dy.shape[0]
    rows += [jnp.zeros((n_pad,), f32)] * 3
    recs = jnp.stack(rows).reshape(8, n_pad // CHUNK, CHUNK
                                   ).transpose(1, 0, 2)
    return recs, n_masked


def idg_grid_from_records(recs, starts, grid_shape, *, theta: float,
                          subgrid: int = 64, taper_beta: float = 12.0,
                          interpret: bool = False):
    """IDG gridding from a pre-binned record stream (see
    :func:`idg_bin_records`); returns (grid_re, grid_im)."""
    N, Nx = grid_shape
    S = subgrid
    T = S // 2
    PADM = T
    nty = -(-(N + 2 * PADM) // T) + 1
    ntx = -(-(Nx + 2 * PADM) // T) + 1
    n_sub = nty * ntx

    # DFT matrix with taper folded: F' = F·diag(taper)
    k = np.arange(S, dtype=np.float64) - S // 2
    # 1/S per factor gives the sandwich the XLA path's 1/S² normalization
    F = np.exp(-2j * np.pi * np.outer(k, k) / S) / S
    if taper_beta > 0:
        # numpy-native Kaiser (host constant — kaiser_taper is jnp/traced)
        x = k / (S / 2)
        t1 = np.i0(taper_beta * np.sqrt(np.clip(1.0 - x * x, 0.0, 1.0)))
        F = F * (t1 / np.i0(taper_beta))[None, :]
    f_re = jnp.asarray(F.real, jnp.float32)
    f_im = jnp.asarray(F.imag, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # recs [nblk, 8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # F real
            pl.BlockSpec(memory_space=pltpu.VMEM),    # F imag
        ],
        out_specs=[
            pl.BlockSpec((1, S, 2 * S), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),   # double-buffered
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    (out,) = pl.pallas_call(
        functools.partial(_kernel, S=S, theta=theta,
                          theta_x=theta * Nx / N),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_sub, S, 2 * S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, recs, f_re, f_im)

    patches = out.reshape(nty, ntx, S, 2 * S)
    g_re = _fold_overlap(patches[..., :S], nty, ntx, S, T)
    g_im = _fold_overlap(patches[..., S:], nty, ntx, S, T)
    lo = PADM
    return g_re[lo:lo + N, lo:lo + Nx], g_im[lo:lo + N, lo:lo + Nx]


def idg_grid_wproj_pallas(grid_shape, p, w, vis_re, vis_im, *, theta: float,
                          subgrid: int = 64, support: int = 15,
                          taper_beta: float = 12.0,
                          interpret: bool = False):
    """IDG gridding on TPU; returns (grid_re, grid_im) [N, N] float32.

    Same contract as ``ops.idg.idg_grid_wproj`` (which remains the
    oracle / CPU path); the resulting dirty image must be divided by the
    taper (``ops.idg.taper_fine``).
    """
    recs, starts = idg_bin_records(
        grid_shape, p, w, vis_re, vis_im, subgrid=subgrid, support=support
    )
    return idg_grid_from_records(
        recs, starts, grid_shape, theta=theta, subgrid=subgrid,
        taper_beta=taper_beta, interpret=interpret,
    )


def idg_gridder_pallas(grid_shape, p, w, vis, *, theta: float,
                       subgrid: int = 64, support: int = 15,
                       taper_beta: float = 12.0, interpret: bool = False):
    """Complex wrapper matching ``ops.idg.idg_grid_wproj``'s signature."""
    g_re, g_im = idg_grid_wproj_pallas(
        grid_shape, p, w,
        jnp.real(vis).astype(jnp.float32),
        jnp.imag(vis).astype(jnp.float32),
        theta=theta, subgrid=subgrid, support=support,
        taper_beta=taper_beta, interpret=interpret,
    )
    return jax.lax.complex(g_re, g_im)
