"""Hot-kernel implementations and dispatch.

``wproj_gridder`` is the performance-critical scatter (SURVEY §2 C5): it
dispatches to the best available implementation for the current backend —
the Pallas tile-privatized TPU kernel when available, otherwise the pure-XLA
chunked scatter from ``ops.gridding``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.gridding import convgrid_wproj

_IMPL = os.environ.get("SKA_SDP_TPU_GRIDDER", "auto")  # auto|xla|pallas


def _default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def wproj_gridder(bank_conj, grid_shape, p, wbin, vis, chunk: int = 16384,
                  init=None):
    """w-projection scatter: returns the [H, W] uv-grid.

    Args:
      bank_conj: [nw, qpx, qpx, gh, gw] pre-conjugated kernel bank.
      grid_shape: (H, W) static ints.
      p: [n, 3] scaled baselines (±0.5 box).
      wbin: [n] int32 kernel-plane index.
      vis: [n] complex visibilities.
      init: optional [H, W] grid to accumulate into.  Under ``shard_map``
        pass a device-varying zero grid (``lax.pcast(..., to='varying')``)
        so the per-device scatter carry type-checks.
    """
    impl = _IMPL
    if impl == "auto":
        # "axon" is the remote-TPU PJRT plugin used in this environment
        impl = "pallas" if _default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas":
        try:
            from .wproj_pallas import wproj_gridder_pallas

            out = wproj_gridder_pallas(bank_conj, grid_shape, p, wbin, vis)
            return out if init is None else init + out
        except ImportError:
            impl = "xla"
    guv = jnp.zeros(grid_shape, vis.dtype) if init is None else init
    return convgrid_wproj(bank_conj, guv, p, wbin, vis, chunk=chunk)


def wproj_degridder(bank, grid, p, wbin, chunk: int = 16384):
    """w-projection degrid (grid→vis predict): adjoint of the scatter.

    Dispatches like :func:`wproj_gridder`: the Pallas tile-batched gather
    on TPU, the chunked XLA gather elsewhere.  ``bank`` is the RAW kernel
    bank (the conjugate is applied internally, matching
    ``ops.degrid_wproj``).
    """
    from ..ops.gridding import degrid_wproj

    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if _default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas":
        try:
            from .wproj_degrid_pallas import wproj_degridder_pallas

            return wproj_degridder_pallas(bank, grid, p, wbin)
        except ImportError:
            pass
    return degrid_wproj(bank, grid, p, wbin, chunk=chunk)


def aw_gridder(wkerns, akerns, guv, p, wbin, a1, a2, vis,
               chunk: int = 8192, slab: int = 1 << 16):
    """AW-projection gridder dispatch (on-the-fly A1⊛A2⊛W kernels).

    TPU: MXU-batched patch synthesis + Pallas tile placement
    (``patch_scatter_pallas.convgrid_aw_pallas``).  Elsewhere: the chunked
    XLA scatter (``ops.convgrid_aw``).
    """
    from ..ops.gridding import convgrid_aw

    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if _default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas":
        nant = akerns.shape[0]
        s = wkerns.shape[-1]
        m = 1 << (2 * s - 2).bit_length()      # next_pow2(2s-1)
        # fused kernel needs VMEM-resident pair + w-tap spectral tables,
        # 128-packable spectra, and kernels within the patch row spacing
        fits = (nant * nant <= 16384
                and (wkerns.shape[0] * wkerns.shape[1] ** 2) <= 4096
                and (m * m) % 128 == 0 and 128 % m == 0 and s <= 16)
        if fits:
            try:
                from .aw_fused_pallas import convgrid_aw_fused

                return convgrid_aw_fused(
                    wkerns, akerns, guv, p, wbin, a1, a2, vis
                )
            except ImportError:
                pass
        try:
            from .patch_scatter_pallas import convgrid_aw_pallas

            return convgrid_aw_pallas(
                wkerns, akerns, guv, p, wbin, a1, a2, vis, slab=slab
            )
        except ImportError:
            pass
    return convgrid_aw(wkerns, akerns, guv, p, wbin, a1, a2, vis, chunk=chunk)
