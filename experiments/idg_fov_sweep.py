"""IDG usable-FOV study: error vs image radius as a function of the
Kaiser taper β and subgrid size S (VERDICT r2 #6).

The dirty image is divided by the taper's fine-grid interpolation, so
taper edge values ~1/I0(β) amplify the method/f32 error toward the image
edge.  Smaller β lowers the amplification but weakens the window's uv
concentration (more subgrid-truncation error).  This sweep measures the
end-to-end error against the direct-DFT truth in radial bands and at the
full FOV, to pick defaults with a quantified full-FOV bound.

Run (CPU): PYTHONPATH=/root/repo python experiments/idg_fov_sweep.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ska_sdp_tpu.ops.idg import (  # noqa: E402
    idg_grid_wproj,
    kaiser_taper,
    taper_fine,
)
from ska_sdp_tpu.ops import ifft_centered  # noqa: E402

N, THETA = 256, 0.05
WMAX = 250.0
B = 400


def truth_image(p, w, vis):
    xf = (np.arange(N) - N // 2) / N
    l = xf * THETA
    L, M = np.meshgrid(l, l, indexing="xy")
    n_lm = 1.0 - np.sqrt(1.0 - L**2 - M**2)
    img = np.zeros((N, N), np.complex128)
    for i in range(p.shape[0]):
        ey = np.exp(2j * np.pi * p[i, 1] * N * xf)
        ex = np.exp(2j * np.pi * p[i, 0] * N * xf)
        img += vis[i] * np.outer(ey, ex) * np.exp(-2j * np.pi * w[i] * n_lm)
    return img / (N * N)


def band_errors(img, ref):
    """Relative error in radial bands (of the max-norm radius) + full."""
    yy, xx = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    r = np.maximum(np.abs(yy - N // 2), np.abs(xx - N // 2)) / (N // 2)
    out = {}
    for lo, hi in [(0.0, 0.5), (0.5, 0.75), (0.75, 0.875), (0.875, 0.95),
                   (0.95, 1.01)]:
        m = (r >= lo) & (r < hi)
        out[f"{lo:.3f}-{hi:.3f}"] = (
            np.linalg.norm((img - ref)[m]) / np.linalg.norm(ref[m])
        )
    out["full"] = np.linalg.norm(img - ref) / np.linalg.norm(ref)
    return out


def main():
    rng = np.random.default_rng(0)
    p = rng.uniform(-0.42, 0.42, (B, 3)).astype(np.float32)
    w = rng.uniform(-WMAX, WMAX, B).astype(np.float32)
    vis = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(
        np.complex64
    )
    ref = truth_image(p, w, vis)

    for S in (32, 64):
        for beta in (6.0, 8.0, 10.0, 12.0, 14.0):
            g = idg_grid_wproj(
                (N, N), jnp.asarray(p), jnp.asarray(w), jnp.asarray(vis),
                theta=THETA, subgrid=S, taper_beta=beta,
            )
            tf = np.asarray(taper_fine(N, S, kaiser_taper(S, beta)))
            img = np.asarray(ifft_centered(g)) / np.outer(tf, tf)
            errs = band_errors(img, ref)
            bands = "  ".join(f"{k}:{v:8.2e}" for k, v in errs.items())
            print(f"S={S:3d} beta={beta:5.1f}  {bands}", flush=True)


if __name__ == "__main__":
    main()
