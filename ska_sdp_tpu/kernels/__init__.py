"""Hot-kernel implementations and dispatch.

``wproj_gridder`` is the performance-critical scatter (SURVEY §2 C5): it
dispatches to the best available implementation for the current backend —
the Pallas tile-privatized TPU kernel when available AND the problem shape
fits the kernel's tile geometry, otherwise the pure-XLA chunked scatter
from ``ops.gridding``.  Every gate falls back instead of asserting: no
input shape crashes the TPU path (mirrors the reference's shape-generic
gridders, ``/root/reference/src/Gridding.hs:153-244``).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from ..ops.gridding import convgrid_wproj

_VALID_IMPLS = ("auto", "xla", "pallas")
_impl = os.environ.get("SKA_SDP_TPU_GRIDDER", "auto")  # auto|xla|pallas

# ---------------------------------------------------------------------------
# Dispatch-downgrade accounting (VERDICT r3 #6).  When a Pallas-eligible call
# (TPU backend, auto/pallas impl) misses a kernel gate and silently lands on
# the XLA oracle path — orders of magnitude slower — the user must be told
# ONCE per (kernel, reason) on stderr, and the event must be countable
# (drivers merge these into the metrics counters channel).
_fallback_counts: dict[str, int] = {}
_warned_fallbacks: set[tuple[str, str]] = set()


def fallback_counters() -> dict[str, int]:
    """Counts of Pallas→XLA dispatch downgrades since process start,
    keyed by kernel name.  Designed fallbacks within the Pallas family
    (resident→tiled) are NOT counted — only drops to the oracle path."""
    return dict(_fallback_counts)


def reset_fallback_counters() -> None:
    _fallback_counts.clear()
    _warned_fallbacks.clear()


def _note_fallback(kind: str, reason: str) -> None:
    _fallback_counts[kind] = _fallback_counts.get(kind, 0) + 1
    key = (kind, reason)
    if key not in _warned_fallbacks:
        _warned_fallbacks.add(key)
        print(
            f"warning: {kind}: Pallas TPU kernel unavailable — {reason}; "
            "falling back to the XLA oracle path (orders of magnitude "
            "slower).  See README 'Pallas kernel envelope'.",
            file=sys.stderr,
        )


def set_gridder_impl(impl: str) -> None:
    """Select the gridder implementation (CLI ``--gridder``).

    ``xla`` is the slow-but-obviously-correct oracle path — the analog of
    the reference's ``-debug`` interpreter switch
    (``/root/reference/app/Main.hs:65,48``).
    """
    global _impl
    if impl not in _VALID_IMPLS:
        raise ValueError(f"gridder impl must be one of {_VALID_IMPLS}")
    _impl = impl


def get_gridder_impl() -> str:
    return _impl


def _default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def _resolved_impl() -> str:
    if _impl != "auto":
        return _impl
    # "axon" is the remote-TPU PJRT plugin used in this environment
    return "pallas" if _default_backend() in ("tpu", "axon") else "xla"


def _wproj_resident_fits(grid_shape, nwq: int, gh: int, gw: int) -> bool:
    """Resident-grid kernel gate: padded grid + interleaved bank must fit
    the VMEM budget (computed from actual padded footprints)."""
    from .wproj_resident_pallas import resident_fits

    return resident_fits(grid_shape[0], grid_shape[1], nwq, gh, gw)


def _wproj_tile_fits(gh: int, gw: int) -> bool:
    """Kernel support must fit the Pallas tile halo (PAD sublanes,
    PADX lane-columns) — otherwise a patch could cross its private tile's
    scratch and the kernel geometry breaks.  Checked here so unsupported
    shapes (e.g. npix_kern > 16) route to XLA instead of asserting."""
    from .wproj_pallas import PAD, PADX

    return gh <= PAD and gw <= PADX


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
    gh, gw = bank_conj.shape[-2], bank_conj.shape[-1]
    nwq = bank_conj.shape[0] * bank_conj.shape[1] * bank_conj.shape[2]
    if _resolved_impl() == "pallas":
        # resident-grid kernel (round 3): whole grid in VMEM, no binning —
        # ~20% faster than the tiled kernel AND drops the record sort.
        # SKA_SDP_TPU_WPROJ_KERNEL=tiled forces the tiled fallback (debug).
        try:
            res_fits = (
                os.environ.get("SKA_SDP_TPU_WPROJ_KERNEL", "auto") != "tiled"
                and _wproj_resident_fits(grid_shape, nwq, gh, gw)
            )
        except ImportError:
            res_fits = False
        if res_fits:
            from .wproj_resident_pallas import wproj_gridder_resident

            out = wproj_gridder_resident(bank_conj, grid_shape, p, wbin, vis)
            return out if init is None else init + out
        try:
            fits = _wproj_tile_fits(gh, gw)
        except ImportError:
            fits = False
        if fits:
            from .wproj_pallas import wproj_gridder_pallas

            out = wproj_gridder_pallas(bank_conj, grid_shape, p, wbin, vis)
            return out if init is None else init + out
        _note_fallback(
            "wproj_gridder",
            f"kernel patch {gh}x{gw} exceeds the Pallas tile halo "
            "(supported: gh<=16, gw<=128)",
        )
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

    gh, gw = bank.shape[-2], bank.shape[-1]
    nwq = bank.shape[0] * bank.shape[1] * bank.shape[2]
    if _resolved_impl() == "pallas":
        try:
            res_fits = (
                os.environ.get("SKA_SDP_TPU_WPROJ_KERNEL", "auto") != "tiled"
                and 2 * gw <= 128
                and _wproj_resident_fits(grid.shape, nwq, gh, gw)
            )
        except ImportError:
            res_fits = False
        if res_fits:
            from .wproj_degrid_resident_pallas import (
                wproj_degridder_resident,
            )

            return wproj_degridder_resident(bank, grid, p, wbin)
        try:
            fits = _wproj_tile_fits(gh, gw)
        except ImportError:
            fits = False
        if fits:
            from .wproj_degrid_pallas import wproj_degridder_pallas

            return wproj_degridder_pallas(bank, grid, p, wbin)
        _note_fallback(
            "wproj_degridder",
            f"kernel patch {gh}x{gw} exceeds the Pallas tile halo "
            "(supported: gh<=16, gw<=128)",
        )
    return degrid_wproj(bank, grid, p, wbin, chunk=chunk)


def idg_gridder(grid_shape, p, w, vis, *, theta: float, subgrid: int = 64,
                support: int = 15, taper_beta: float = 12.0):
    """Image-domain gridding dispatch (MXU-native w-projection mode).

    TPU: the subgrid-walking Pallas kernel (``kernels/idg_pallas.py``);
    elsewhere the XLA realization (``ops/idg.py`` — also the oracle).
    The returned grid's dirty image must be divided by the taper
    (``ops.idg.taper_fine``); ``models.imaging`` handles that.
    """
    from ..ops.idg import idg_grid_wproj

    if support > subgrid // 2 + 1:
        raise ValueError(
            f"IDG needs support <= subgrid/2+1; got s={support}, "
            f"S={subgrid} — use a larger subgrid"
        )
    if _resolved_impl() == "pallas":
        mr = _idg_unit_run_bound(grid_shape, subgrid, support)
        if mr is not None:
            # round 4: plain IDG rides the streamed run-walking kernel
            # with UNIT screens and zero pair ids — records key to
            # (pair=0, uv-tile), runs are the occupied tiles, and
            # conj(1·1)=1 keeps the operator exact continuous-w IDG
            # (parity: tests/test_idg.py::TestIDGViaUnitScreenRuns).
            # In-bounds records always fit the tile margin and the run
            # bound covers every tile, so n_dropped counts exactly the
            # out-of-bounds records the fixed-tile path also excludes.
            import jax.numpy as jnp

            from .idg_aw_stream_pallas import idg_aw_gridder_stream

            zer = jnp.zeros((p.shape[0],), jnp.int32)
            scr = jnp.ones((1, subgrid, subgrid), jnp.complex64)
            guv, _nd = idg_aw_gridder_stream(
                grid_shape, p, zer, zer, w, vis, scr, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=mr,
            )
            return guv
        bb = _idg_banded_bounds(grid_shape, subgrid, support)
        if bb is not None:
            # round 5 (VERDICT r4 #4): >VMEM grids ride the BANDED
            # streamed path with unit screens.  The total run bound is
            # the full tile count (held in XLA-side arrays — past the
            # SMEM envelope is fine); each band pass prefetches only its
            # own per-band slice, statically sized to the band's tile
            # count, so overflow drops are impossible by construction
            # (n_dropped counts exactly the OOB records, like all paths).
            import jax.numpy as jnp

            from .idg_aw_stream_pallas import idg_aw_gridder_banded

            total_mr, band_mr = bb
            zer = jnp.zeros((p.shape[0],), jnp.int32)
            scr = jnp.ones((1, subgrid, subgrid), jnp.complex64)
            guv, _nd = idg_aw_gridder_banded(
                grid_shape, p, zer, zer, w, vis, scr, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=total_mr, max_runs_band=band_mr,
            )
            return guv
        from .idg_pallas import idg_gridder_pallas

        return idg_gridder_pallas(
            grid_shape, p, w, vis, theta=theta, subgrid=subgrid,
            support=support, taper_beta=taper_beta,
        )
    return idg_grid_wproj(
        grid_shape, p, w, vis, theta=theta, subgrid=subgrid,
        support=support, taper_beta=taper_beta,
    )


def _idg_unit_run_bound(grid_shape, subgrid: int, support: int):
    """max_runs for the unit-screen run path of plain IDG, or None when
    the streamed kernel cannot serve it losslessly (wrong subgrid, grid
    too big for VMEM residency, or more possible tiles than the SMEM
    run-CSR comfortably holds — overflow would silently drop records the
    fixed-tile kernels keep)."""
    from ..ops.idg_aw import auto_fit_margin
    from .idg_aw_pallas import STREAM_SUBGRIDS, idg_aw_resident_fits

    if subgrid not in STREAM_SUBGRIDS or not idg_aw_resident_fits(
            grid_shape[0], grid_shape[1], 1, subgrid):
        return None
    margin = auto_fit_margin(subgrid, support)
    # margin >= 5 keeps the record_keys Tc floor (max(2*margin-2, 8))
    # inside the fit guarantee |dy| < Tc/2 <= margin — below it the tile
    # split would DROP in-bounds records the fixed-tile kernels keep
    # (S=32 with support 15 lands here; support <= 11 restores it)
    if margin < 5:
        return None
    tc = 2 * margin - 2
    bound = ((max(grid_shape) + 2 * subgrid) // tc + 2) ** 2 + 64
    return bound if bound <= 24576 else None


def _idg_banded_bounds(grid_shape, subgrid: int, support: int):
    """(total_run_bound, per_band_bound) for the unit-screen BANDED
    route of plain IDG on >VMEM grids, or None when the kernel cannot
    serve it (wrong subgrid, screens too big, or a single band's tile
    count past the SMEM run-table envelope).

    The per-band bound is static: with unit screens and zero pair ids a
    run is exactly one occupied uv tile, a band k holds the tiles whose
    clipped origin row lands in [k·Hb, (k+1)·Hb), and that is at most
    (Hb/Tc + clip slop) tile rows × the tile-column count — so a pass
    sized to it can never overflow-drop."""
    from ..ops.idg_aw import auto_fit_margin
    from .idg_aw_pallas import IDG_AW_VMEM_BUDGET, STREAM_SUBGRIDS
    from .idg_aw_stream_pallas import _banded_geometry, banded_fits

    if subgrid not in STREAM_SUBGRIDS or not banded_fits(1, subgrid):
        return None
    margin = auto_fit_margin(subgrid, support)
    if margin < 5:            # same fit-guarantee floor as the unit path
        return None
    tc = 2 * margin - 2
    N, Nx = grid_shape
    _HP, _WP2, _K, Hb, _band_rows = _banded_geometry(
        N, Nx, subgrid, IDG_AW_VMEM_BUDGET)
    ntx_t = (Nx + 2 * subgrid) // tc + 1
    total = ((max(N, Nx) + 2 * subgrid) // tc + 2) ** 2 + 64
    per_band = (Hb // tc + 8) * ntx_t + 64
    if per_band > 24576:
        return None
    return total, per_band


def idg_degridder(grid_shape, p, w, grid, *, theta: float, subgrid: int = 64,
                  support: int = 15, taper_beta: float = 12.0):
    """Image-domain degridding dispatch (exact continuous-w predict).

    TPU: the subgrid-walking Pallas kernel (``kernels/idg_degrid_pallas``);
    elsewhere the XLA realization (``ops.idg.idg_degrid_wproj`` — also the
    oracle).  Non-square grids supported on both paths.
    """
    from ..ops.idg import idg_degrid_wproj

    if support > subgrid // 2 + 1:
        raise ValueError(
            f"IDG needs support <= subgrid/2+1; got s={support}, "
            f"S={subgrid} — use a larger subgrid"
        )
    if _resolved_impl() == "pallas":
        mr = _idg_unit_run_bound(grid_shape, subgrid, support)
        if mr is not None:
            import jax.numpy as jnp

            from .idg_aw_stream_pallas import idg_aw_degridder_stream

            zer = jnp.zeros((p.shape[0],), jnp.int32)
            scr = jnp.ones((1, subgrid, subgrid), jnp.complex64)
            vis, _nd = idg_aw_degridder_stream(
                grid_shape, p, zer, zer, w, grid, scr, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=mr,
            )
            return vis
        from .idg_degrid_pallas import idg_degrid_wproj_pallas

        return idg_degrid_wproj_pallas(
            grid_shape, p, w, grid, theta=theta, subgrid=subgrid,
            support=support, taper_beta=taper_beta,
        )
    return idg_degrid_wproj(
        grid_shape, p, w, grid, theta=theta, subgrid=subgrid,
        support=support, taper_beta=taper_beta,
    )


def _idg_aw_unfit_reason(grid_shape, nant: int, subgrid: int) -> str:
    """Human-readable reason the Pallas IDG-AW kernel was rejected."""
    from .idg_aw_pallas import STREAM_SUBGRIDS

    if subgrid not in STREAM_SUBGRIDS:
        return (f"subgrid={subgrid} is outside the kernel envelope "
                f"(the Pallas IDG-AW kernels support {STREAM_SUBGRIDS})")
    return (f"padded {grid_shape[0]}x{grid_shape[1]} grid + {nant} antenna "
            "screens exceed the VMEM budget (resident-grid kernel only)")


def idg_aw_gridder(grid_shape, p, a1, a2, w, vis, screens, *, theta: float,
                   subgrid: int = 64, support: int = 15,
                   taper_beta: float = 12.0, max_runs: int = 4096,
                   fit_margin: int = 0, ordered: bool = False):
    """IDG-AW dispatch: image-domain antenna screens on pair-chunked
    subgrids (``ops/idg_aw.py`` documents the method + honesty contract).

    TPU: the streamed resident-grid Pallas kernel
    (``kernels/idg_aw_stream_pallas`` via ``idg_aw_pallas``) when the
    padded grid + screens fit VMEM; >VMEM grids at subgrid 64 take the
    BANDED streamed path (K VMEM-resident row bands); other shapes fall
    back to the XLA realization (also the oracle).  Returns
    (guv, n_dropped) — callers must surface ``n_dropped`` (records whose
    chunk could not cover their uv spread; zero for track-like data).

    ``ordered=True``: the caller guarantees a pair-major record stream
    (e.g. the file's [ntime, nbl] layout transposed), letting the Pallas
    prep skip its comparison sort (~7 ms/Mvis); always correct, but a
    poorly-ordered stream fragments into > ``max_runs`` runs whose
    surplus shows up in ``n_dropped``.  Ignored by the XLA realization
    (it sorts internally).
    """
    from ..ops.idg_aw import idg_grid_aw

    if _resolved_impl() == "pallas":
        try:
            from .idg_aw_pallas import (idg_aw_gridder_pallas,
                                        idg_aw_resident_fits)

            fits = idg_aw_resident_fits(grid_shape[0], grid_shape[1],
                                        screens.shape[0], subgrid)
            reason = (None if fits else
                      _idg_aw_unfit_reason(grid_shape, screens.shape[0],
                                           subgrid))
        except ImportError:
            fits = False
            reason = "Pallas TPU kernels failed to import"
        if fits:
            return idg_aw_gridder_pallas(
                grid_shape, p, a1, a2, w, vis, screens, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=max_runs, fit_margin=fit_margin, ordered=ordered,
            )
        from .idg_aw_pallas import STREAM_SUBGRIDS
        from .idg_aw_stream_pallas import banded_fits, idg_aw_gridder_banded

        if subgrid in STREAM_SUBGRIDS and banded_fits(screens.shape[0],
                                                      subgrid):
            # >VMEM grids: the BANDED streamed path (round 4) — K row
            # bands each resident in VMEM, one streamed pass per band
            # over the shared record stream, overlap-added.  This is a
            # Pallas fast path, not a fallback (shapes non-resident
            # because of SCREENS size, or out-of-envelope subgrids,
            # still take
            # the XLA oracle below).  The banded prep always sorts, so
            # ``ordered`` is moot here.
            return idg_aw_gridder_banded(
                grid_shape, p, a1, a2, w, vis, screens, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=max_runs, fit_margin=fit_margin,
            )
        _note_fallback("idg_aw_gridder", reason)
    return idg_grid_aw(
        grid_shape, p, a1, a2, w, vis, screens, theta=theta,
        subgrid=subgrid, support=support, taper_beta=taper_beta,
        max_runs=max_runs, fit_margin=fit_margin,
    )


def idg_aw_degridder(grid_shape, p, a1, a2, w, grid, screens, *,
                     theta: float, subgrid: int = 64, support: int = 15,
                     taper_beta: float = 12.0, max_runs: int = 4096,
                     fit_margin: int = 0):
    """IDG-AW degridding (model predict with direction-dependent antenna
    terms): the exact adjoint of :func:`idg_aw_gridder`.

    TPU: the run-walking resident-grid Pallas kernel
    (``kernels/idg_aw_degrid_pallas``) when the padded grid + screens fit
    VMEM; elsewhere the XLA realization (also the oracle).  Returns
    (vis, n_dropped)."""
    from ..ops.idg_aw import idg_degrid_aw

    if _resolved_impl() == "pallas":
        try:
            from .idg_aw_degrid_pallas import idg_aw_degridder_pallas
            from .idg_aw_pallas import idg_aw_resident_fits

            fits = idg_aw_resident_fits(grid_shape[0], grid_shape[1],
                                        screens.shape[0], subgrid)
            reason = (None if fits else
                      _idg_aw_unfit_reason(grid_shape, screens.shape[0],
                                           subgrid))
        except ImportError:
            fits = False
            reason = "Pallas TPU kernels failed to import"
        if fits:
            return idg_aw_degridder_pallas(
                grid_shape, p, a1, a2, w, grid, screens, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=max_runs, fit_margin=fit_margin,
            )
        from .idg_aw_pallas import STREAM_SUBGRIDS
        from .idg_aw_stream_pallas import (banded_fits,
                                           idg_aw_degridder_banded)

        if subgrid in STREAM_SUBGRIDS and banded_fits(screens.shape[0],
                                                      subgrid):
            # >VMEM grids: banded streamed degrid (grid bands load as
            # VMEM inputs per pass) — Pallas fast path, not a fallback
            return idg_aw_degridder_banded(
                grid_shape, p, a1, a2, w, grid, screens, theta=theta,
                subgrid=subgrid, support=support, taper_beta=taper_beta,
                max_runs=max_runs, fit_margin=fit_margin,
            )
        _note_fallback("idg_aw_degridder", reason)
    return idg_degrid_aw(
        grid_shape, p, a1, a2, w, grid, screens, theta=theta,
        subgrid=subgrid, support=support, taper_beta=taper_beta,
        max_runs=max_runs, fit_margin=fit_margin,
    )


# VMEM byte budget for the fused-AW kernel's resident spectral tables.  The
# kernel itself is compiled with vmem_limit_bytes=100MB; accumulators,
# record staging and pipeline double-buffers need the rest, so tables get
# 64MB.  Computed from the ACTUAL packed-table footprint — the previous
# shape-count gate ((nant² ≤ 16384) ∧ (nw·qpx² ≤ 4096)) was calibrated for
# m=16 and admitted m=32 configs whose tables blow VMEM at Mosaic compile
# time (ADVICE round 1).
_AW_TABLE_BUDGET_BYTES = 64 * 1024 * 1024


def _aw_fused_fits(nant: int, nw: int, qpx: int, s: int) -> bool:
    m = 1 << (2 * s - 2).bit_length()      # next_pow2(2s-1)
    packable = (m * m) % 128 == 0 and 128 % m == 0 and s <= 16
    # pair + w-tap spectral tables: complex64 stored as 2×f32 planes
    table_bytes = (nant * nant + nw * qpx * qpx) * m * m * 8
    return packable and table_bytes <= _AW_TABLE_BUDGET_BYTES


def aw_gridder(wkerns, akerns, guv, p, wbin, a1, a2, vis,
               chunk: int = 8192, slab: int = 1 << 16):
    """AW-projection gridder dispatch (on-the-fly A1⊛A2⊛W kernels).

    TPU: fully fused Pallas kernel when the spectral tables fit VMEM, else
    MXU-batched patch synthesis + Pallas tile placement
    (``patch_scatter_pallas.convgrid_aw_pallas``).  Elsewhere: the chunked
    XLA scatter (``ops.convgrid_aw``).
    """
    from ..ops.gridding import convgrid_aw

    s = wkerns.shape[-1]
    gh, gw = s, s
    if _resolved_impl() == "pallas":
        try:
            tile_fits = _wproj_tile_fits(gh, gw)
        except ImportError:
            tile_fits = False
        if tile_fits:
            nant = akerns.shape[0]
            try:
                from .aw_fused_resident_pallas import (aw_resident_fits,
                                                       convgrid_aw_resident)

                aw_res = (
                    os.environ.get("SKA_SDP_TPU_WPROJ_KERNEL", "auto")
                    != "tiled"
                    and aw_resident_fits(guv.shape[0], guv.shape[1], nant,
                                         wkerns.shape[0], wkerns.shape[1], s)
                )
            except ImportError:
                aw_res = False
            if aw_res:
                return convgrid_aw_resident(
                    wkerns, akerns, guv, p, wbin, a1, a2, vis
                )
            if _aw_fused_fits(nant, wkerns.shape[0], wkerns.shape[1], s):
                from .aw_fused_pallas import convgrid_aw_fused

                return convgrid_aw_fused(
                    wkerns, akerns, guv, p, wbin, a1, a2, vis
                )
            from .patch_scatter_pallas import convgrid_aw_pallas

            return convgrid_aw_pallas(
                wkerns, akerns, guv, p, wbin, a1, a2, vis, slab=slab
            )
        _note_fallback(
            "aw_gridder",
            f"kernel patch {s}x{s} exceeds the Pallas tile halo "
            "(supported: s<=16)",
        )
    return convgrid_aw(wkerns, akerns, guv, p, wbin, a1, a2, vis, chunk=chunk)
