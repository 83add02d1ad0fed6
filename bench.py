"""Headline benchmark: visibilities gridded/sec, SKA1_Low w-projection.

Measures the hot kernel of the framework — kernel-convolved scatter of
complex visibilities onto the 2400² uv-grid with an oversampled w-kernel
bank (BASELINE.md config #2) — on whatever accelerator JAX selects (the real
TPU chip under the driver; CPU as fallback).

Device-boundary note: the TPU PJRT path here does not support complex
transfers, so complex operands enter as (re, im) float32 pairs and the step
returns a real checksum that forces full execution (see utils/cplx.py).

The reference publishes no numbers (BASELINE.md); the driver's north-star is
"≥5× H100-class visibilities/sec".  ``vs_baseline`` is therefore reported
against H100_CLASS_VIS_PER_SEC below: an H100-class estimate for this exact
kernel (qpx=8, s=15 ⇒ 225 complex64 MACs + 1 gather + 1 scatter-add per
visibility).  A tuned CUDA gridder of this shape is scatter-bound; published
GPU gridding work (Romein-style thread-coarsened gridders, PAPERS.md) lands
in the ~1-3 Gvis/s range on H100-class parts for 15² kernels; we use 2e9 as
the bar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

H100_CLASS_VIS_PER_SEC = 2.0e9

# SKA1_Low scale (SURVEY §2 C18, §5): 2400² grid, qpx=8, 15² kernels.
THETA, LAM = 0.008, 300000
NW, QPX, S = 32, 8, 15
N_VIS = 1 << 20           # per timed step
STEPS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ska_sdp_tpu.kernels import wproj_gridder
    from ska_sdp_tpu.ops import find_closest, mirror_uvw

    n_grid = int(round(THETA * LAM))
    rng = np.random.default_rng(0)

    # Synthetic kernel bank directly (HDF5 ingest is not part of the timed
    # region; real banks load once per run).
    bank = (
        rng.standard_normal((NW, QPX, QPX, S, S))
        + 1j * rng.standard_normal((NW, QPX, QPX, S, S))
    ).astype(np.complex64)
    centers = np.linspace(-4000, 4000, NW)

    uvw = rng.uniform(-0.42 * LAM, 0.42 * LAM, size=(N_VIS, 3))
    uvw[:, 2] = rng.uniform(-3800, 3800, size=N_VIS)
    vis = (
        rng.standard_normal(N_VIS) + 1j * rng.standard_normal(N_VIS)
    ).astype(np.complex64)

    @jax.jit
    def grid_step(bank_re, bank_im, centers, uvw_l, vis_re, vis_im, salt):
        bank_c = jax.lax.complex(bank_re, bank_im)
        vis_c = jax.lax.complex(vis_re, vis_im + salt)  # defeat cross-step CSE
        uvw1, vis1 = mirror_uvw(uvw_l, vis_c)
        wbin = find_closest(centers, uvw1[:, 2])
        g = wproj_gridder(bank_c, (n_grid, n_grid), uvw1 / LAM, wbin, vis1)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    args = (
        jnp.asarray(bank.real),
        jnp.asarray(bank.imag),
        jnp.asarray(centers, jnp.float32),
        jnp.asarray(uvw, jnp.float32),
        jnp.asarray(vis.real),
        jnp.asarray(vis.imag),
    )

    # compile + warmup; fetching the scalar forces (and checks) execution
    chk = float(grid_step(*args, jnp.float32(0.0)))
    assert np.isfinite(chk) and chk > 0

    t0 = time.perf_counter()
    for k in range(STEPS):
        chk = float(grid_step(*args, jnp.float32(1e-6 * (k + 1))))
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(chk) and chk > 0

    vis_per_sec = N_VIS / dt
    print(
        json.dumps(
            {
                "metric": "visibilities gridded/sec/chip (SKA1_Low w-proj, 2400^2 grid, qpx=8, 15^2 kernels, complex64)",
                "value": round(vis_per_sec, 1),
                "unit": "vis/s",
                "vs_baseline": round(vis_per_sec / H100_CLASS_VIS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
