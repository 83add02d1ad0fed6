"""Gridding and degridding: kernel-convolved scatter/gather on the uv-grid.

This module is the XLA-native (pure jnp) implementation of the reference's
gridder family (``/root/reference/src/Gridding.hs:95-396``):

  ``grid_nearest``    — nearest-cell scatter, no kernel          (ref ``grid`` :95-112)
  ``convgrid``        — single oversampled [qpx,qpx,gh,gw] kernel (ref :153-197)
  ``convgrid_wproj``  — [nw,qpx,qpx,gh,gw] w-kernel bank + wbin   (ref ``convgrid2`` :199-244)
  ``convgrid_aw``     — on-the-fly AW kernels (A⊛A⊛W)             (ref ``convgrid3/4`` :246-396)
  ``degrid_wproj``    — adjoint gather (grid → predicted vis); absent from the
                        reference but required by the driver configs.

Design notes (TPU-first):

* The reference's single load-bearing parallel primitive is Accelerate's
  combining ``permute (+)`` scatter.  XLA's ``.at[].add`` provides the same
  combining-scatter semantics; collisions are resolved deterministically by
  the TPU scatter implementation.  The Pallas tile-privatized kernel in
  ``ska_sdp_tpu.kernels`` is the performance path; this module is the
  always-correct oracle-adjacent path and the small-problem path.
* The reference iterates visibilities *sequentially* on-device for the AW
  path (``afor`` :848-860).  Here every per-visibility quantity is a batched
  gather, and memory is bounded by chunking the visibility axis with
  ``lax.scan`` — the grid accumulator is carried through the scan.
* Out-of-bounds policy: the reference clamps OOB targets to (0,0) with value
  0 (``fixoutofbounds`` :883-891) — i.e. OOB contributions vanish.  We zero
  the value and drop the write, which is numerically identical.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .convolution import akernel_spectra, make_aw_kernels_batched, wkernel_tap_spectra
from .coords import frac_coords, to_grid_cell

DEFAULT_CHUNK = 8192


def _pad_to_chunks(arrs, chunk: int):
    """Pad leading axis to a multiple of ``chunk``; returns (arrs, nvalid).

    Padded tail entries get OOB-looking zero work: callers mask via the
    returned valid count by zeroing values (indices are clamped anyway).
    """
    n = arrs[0].shape[0]
    rem = (-n) % chunk
    if rem:
        arrs = [jnp.pad(a, [(0, rem)] + [(0, 0)] * (a.ndim - 1)) for a in arrs]
    return arrs, n


def scatter_patches(guv, y0, x0, patches, valid=None, chunk: int = DEFAULT_CHUNK):
    """Add b patches of shape [gh, gw] into guv at top-left (y0, x0) each.

    Args:
      guv: [H, W] complex grid (accumulated into, functionally).
      y0, x0: [b] int32 top-left target coordinates (may be out of bounds).
      patches: [b, gh, gw] complex contributions.
      valid: optional [b] bool; False rows contribute nothing.
      chunk: visibility chunk size for the memory-bounded scan.

    OOB handling: any element whose target falls outside the grid is dropped
    (reference ``fixoutofbounds`` semantics).
    """
    H, W = guv.shape
    b, gh, gw = patches.shape
    if valid is None:
        valid = jnp.ones((b,), dtype=bool)
    (y0, x0, patches, valid), _ = _pad_to_chunks([y0, x0, patches, valid], chunk)

    di = jnp.arange(gh, dtype=jnp.int32)
    dj = jnp.arange(gw, dtype=jnp.int32)

    def body(g, args):
        cy0, cx0, cpatch, cvalid = args
        yy = cy0[:, None, None] + di[None, :, None]          # [c, gh, 1]
        xx = cx0[:, None, None] + dj[None, None, :]          # [c, 1, gw]
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W) & cvalid[:, None, None]
        idx = jnp.where(inb, yy * W + xx, 0)
        val = jnp.where(inb, cpatch, 0).reshape(-1)
        g = g.at[idx.reshape(-1)].add(val)
        return g, None

    nchunks = y0.shape[0] // chunk
    split = lambda a: a.reshape((nchunks, chunk) + a.shape[1:])
    flat, _ = jax.lax.scan(
        body, guv.reshape(-1), (split(y0), split(x0), split(patches), split(valid))
    )
    return flat.reshape(H, W)


def gather_patches(grid, y0, x0, gh: int, gw: int, chunk: int = DEFAULT_CHUNK):
    """Gather b patches [gh, gw] from grid at top-left (y0, x0); OOB reads 0."""
    H, W = grid.shape
    (y0, x0), b = _pad_to_chunks([y0, x0], chunk)
    di = jnp.arange(gh, dtype=jnp.int32)
    dj = jnp.arange(gw, dtype=jnp.int32)
    flat = grid.reshape(-1)

    def body(_, args):
        cy0, cx0 = args
        yy = cy0[:, None, None] + di[None, :, None]
        xx = cx0[:, None, None] + dj[None, None, :]
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.where(inb, yy * W + xx, 0)
        vals = jnp.where(inb, flat[idx.reshape(-1)].reshape(idx.shape), 0)
        return None, vals

    nchunks = y0.shape[0] // chunk
    split = lambda a: a.reshape((nchunks, chunk) + a.shape[1:])
    _, out = jax.lax.scan(body, None, (split(y0), split(x0)))
    return out.reshape((-1, gh, gw))[:b]


# ---------------------------------------------------------------------------
# Gridder family
# ---------------------------------------------------------------------------

def grid_nearest(guv, p, vis):
    """Nearest-cell scatter: guv[cell(v), cell(u)] += vis.

    Reference ``grid`` (``src/Gridding.hs:95-112``) — round-half-up cell
    mapping via ``to_grid_cell``; y from v, x from u.
    """
    H, W = guv.shape
    y = to_grid_cell(H, p[:, 1])
    x = to_grid_cell(W, p[:, 0])
    inb = (y >= 0) & (y < H) & (x >= 0) & (x < W)
    idx = jnp.where(inb, y * W + x, 0)
    val = jnp.where(inb, vis, 0)
    return guv.reshape(-1).at[idx].add(val).reshape(H, W)


def _gather_scatter_scan(kern_lookup, guv, y0, x0, vis, idx_arrays, chunk):
    """Stream chunks of visibilities: gather kernel → multiply → scatter-add.

    The kernel gather happens INSIDE the scan body so peak memory is
    O(chunk · gh · gw), never O(n · gh · gw) — the whole gridder streams
    through HBM regardless of visibility count.

    Args:
      kern_lookup: fn(*chunked idx_arrays) → [c, gh, gw] kernel patches.
      guv: [H, W] grid; y0/x0: [n] top-left targets; vis: [n] complex.
      idx_arrays: per-vis int arrays consumed by kern_lookup.
    """
    H, W = guv.shape
    (y0, x0, vis, *idx_arrays), nvalid = _pad_to_chunks(
        [y0, x0, vis] + list(idx_arrays), chunk
    )
    valid = jnp.arange(y0.shape[0]) < nvalid
    probe = kern_lookup(*(a[:1] for a in idx_arrays))
    gh, gw = probe.shape[-2], probe.shape[-1]
    di = jnp.arange(gh, dtype=jnp.int32)
    dj = jnp.arange(gw, dtype=jnp.int32)

    def body(g, args):
        cy0, cx0, cvis, cvalid, *cidx = args
        patch = cvis[:, None, None] * kern_lookup(*cidx)
        yy = cy0[:, None, None] + di[None, :, None]
        xx = cx0[:, None, None] + dj[None, None, :]
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W) & cvalid[:, None, None]
        idx = jnp.where(inb, yy * W + xx, 0)
        val = jnp.where(inb, patch, 0).reshape(-1)
        return g.at[idx.reshape(-1)].add(val), None

    nchunks = y0.shape[0] // chunk
    split = lambda a: a.reshape((nchunks, chunk) + a.shape[1:])
    flat, _ = jax.lax.scan(
        body,
        guv.reshape(-1),
        tuple(split(a) for a in [y0, x0, vis, valid] + list(idx_arrays)),
    )
    return flat.reshape(H, W)


def convgrid(gcf, guv, p, vis, chunk: int = DEFAULT_CHUNK):
    """Scatter with a single oversampled kernel [qpx, qpx, gh, gw].

    Reference ``convgrid`` (``src/Gridding.hs:153-197``): patch value
    ``vis · gcf[yf, xf, i, j]`` lands at ``(y - gh/2 + i, x - gw/2 + j)``.
    """
    qpx, _, gh, gw = gcf.shape
    H, W = guv.shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    return _gather_scatter_scan(
        lambda cyf, cxf: gcf[cyf, cxf],
        guv, y - gh // 2, x - gw // 2, vis, (yf, xf), chunk,
    )


def convgrid_wproj(gcf_bank, guv, p, wbin, vis, chunk: int = DEFAULT_CHUNK):
    """w-projection scatter with a [nw, qpx, qpx, gh, gw] kernel bank.

    Reference ``convgrid2`` (``src/Gridding.hs:199-244``).  The bank is
    expected pre-conjugated (as built by ``w_kernel_bank`` /
    ``src/Gridding.hs:441``) or loaded from a dataset that stores it so.
    """
    nw, qpx, _, gh, gw = gcf_bank.shape
    H, W = guv.shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    return _gather_scatter_scan(
        lambda cw, cyf, cxf: gcf_bank[cw, cyf, cxf],
        guv, y - gh // 2, x - gw // 2, vis, (wbin, yf, xf), chunk,
    )


def convgrid_aw(
    wkerns, akerns, guv, p, wbin, a1, a2, vis, chunk: int = DEFAULT_CHUNK
):
    """AW-projection: on-the-fly conj(A1 ⊛ A2 ⊛ W[wbin, yf, xf]) kernels.

    Reference ``convgrid4`` + ``processOne2`` (``src/Gridding.hs:318-396``),
    with the sequential per-visibility loop replaced by fully batched
    spectral convolution (see ``ops.convolution``).

    Args:
      wkerns: [nw, qpx, qpx, s, s] UNconjugated w-kernel bank (the reference
        conjugates inside the gridder; so do we).
      akerns: [nant, s, s] A-kernels.
      guv: [H, W] destination grid.
      p: [b, 3] scaled baselines (±0.5 box).
      wbin, a1, a2: [b] int32 kernel indices per visibility.
      vis: [b] complex visibilities.
    """
    nw, qpx, _, gh, gw = wkerns.shape
    H, W = guv.shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)

    a_spec = akernel_spectra(akerns)
    w_spec = wkernel_tap_spectra(wkerns)
    build = make_aw_kernels_batched(gh)

    y0 = y - gh // 2
    x0 = x - gw // 2
    (y0c, x0c, visc, wbinc, a1c, a2c, yfc, xfc), nvalid = _pad_to_chunks(
        [y0, x0, vis, wbin, a1, a2, yf, xf], chunk
    )
    valid = jnp.arange(y0c.shape[0]) < nvalid

    di = jnp.arange(gh, dtype=jnp.int32)
    dj = jnp.arange(gw, dtype=jnp.int32)

    def body(g, args):
        cy0, cx0, cvis, cwbin, ca1, ca2, cyf, cxf, cvalid = args
        awk = build(a_spec, w_spec, ca1, ca2, cwbin, cyf, cxf)  # [c, gh, gw]
        cpatch = cvis[:, None, None] * awk
        yy = cy0[:, None, None] + di[None, :, None]
        xx = cx0[:, None, None] + dj[None, None, :]
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W) & cvalid[:, None, None]
        idx = jnp.where(inb, yy * W + xx, 0)
        val = jnp.where(inb, cpatch, 0).reshape(-1)
        return g.at[idx.reshape(-1)].add(val), None

    nchunks = y0c.shape[0] // chunk
    split = lambda a: a.reshape((nchunks, chunk) + a.shape[1:])
    flat, _ = jax.lax.scan(
        body,
        guv.reshape(-1),
        tuple(split(a) for a in (y0c, x0c, visc, wbinc, a1c, a2c, yfc, xfc, valid)),
    )
    return flat.reshape(H, W)


def degrid_wproj(gcf_bank, grid, p, wbin, chunk: int = DEFAULT_CHUNK):
    """Adjoint of :func:`convgrid_wproj`: predict visibilities from a grid.

    vis[b] = Σ_{i,j} conj(K_b[i, j]) · grid[y0+i, x0+j]

    with K_b = gcf_bank[wbin_b, yf_b, xf_b].  This is the exact linear
    adjoint of the scatter (verified by the dot-product test in the suite),
    giving grid→vis prediction for the driver's grid/degrid round-trip
    config.  Not present in the reference (SURVEY §7.4).
    """
    nw, qpx, _, gh, gw = gcf_bank.shape
    H, W = grid.shape
    x, xf, y, yf = frac_coords((H, W), qpx, p)
    patches = gather_patches(grid, y - gh // 2, x - gw // 2, gh, gw, chunk=chunk)
    kerns = gcf_bank[wbin, yf, xf]
    return jnp.sum(patches * jnp.conj(kerns), axis=(-2, -1))
