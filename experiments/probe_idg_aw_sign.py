"""Probe: IDG-AW screen sign/conjugation conventions vs the bank-AW oracle.

Single antenna pair, uv clustered in one subgrid-sized box (so chunking is
trivially exact), uv snapped to the qpx lattice, w at bin centers — the
remaining difference between IDG-AW and conv-AW with the tapered bank is
the screen convention (plus the reference's inter-convolution truncation,
tiny for near-delta akerns).  Shifted-delta akerns make sign errors
catastrophic (kernel shifts the wrong way).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ska_sdp_tpu.config import KernelOptions
from ska_sdp_tpu.ops import find_closest, ifft_centered, make_grid_hermitian
from ska_sdp_tpu.ops.gridding import convgrid_aw
from ska_sdp_tpu.ops.idg import kaiser_taper, taper_fine, tapered_w_bank
from ska_sdp_tpu.ops.idg_aw import aw_screens, idg_grid_aw

N, THETA, S, BETA = 256, 0.05, 64, 12.0
NW, WMAX = 8, 250.0
QPX = 8

rng = np.random.default_rng(3)
b = 200
# uv tight cluster: center (0.1, -0.05), spread +-8 cells
p = np.empty((b, 3))
p[:, 0] = 0.1 + rng.uniform(-8 / N, 8 / N, b)
p[:, 1] = -0.05 + rng.uniform(-8 / N, 8 / N, b)
p[:, 2] = 0.0
p[:, :2] = np.round(p[:, :2] * (QPX * N)) / (QPX * N)     # snap to lattice
w = rng.uniform(-WMAX, WMAX, b)
vis = rng.standard_normal(b) + 1j * rng.standard_normal(b)

centers = np.linspace(-WMAX, WMAX, NW)
wbin = find_closest(jnp.asarray(centers), jnp.asarray(w))
w_b = centers[np.asarray(wbin)]

# akerns: ant0 = delta shifted +1 cell in x (axis -1), ant1 = delta
s_k = 15
ak = np.zeros((2, s_k, s_k), np.complex128)
ak[0, s_k // 2, s_k // 2 + 1] = 1.0
ak[1, s_k // 2, s_k // 2] = 1.0
a1 = np.zeros(b, np.int32)
a2 = np.ones(b, np.int32)

opts = KernelOptions(qpx=QPX, npix_ff=256, npix_kern=s_k)
bank_t = tapered_w_bank(THETA, jnp.asarray(centers), opts, BETA, S,
                        dtype=jnp.float64).astype(jnp.complex128)

g_ex = convgrid_aw(
    jnp.conj(bank_t), jnp.asarray(ak), jnp.zeros((N, N), jnp.complex128),
    jnp.asarray(p), wbin, jnp.asarray(a1), jnp.asarray(a2),
    jnp.asarray(vis), chunk=64,
)

tf = np.asarray(taper_fine(N, S, kaiser_taper(S, BETA)))
t2 = np.outer(tf, tf)


def img_of(g):
    return np.asarray(jnp.real(ifft_centered(make_grid_hermitian(g)))) / t2


img_ex = img_of(g_ex)

scr = aw_screens(jnp.asarray(ak), S, dtype=jnp.complex128)
g_idg, nd = idg_grid_aw(
    (N, N), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
    jnp.asarray(w_b), jnp.asarray(vis), scr, theta=THETA, subgrid=S,
    max_runs=8,
)
img_idg = img_of(g_idg)
c = N // 8
sl = slice(c, -c)


def rel(a_, b_):
    return np.linalg.norm(a_[sl, sl] - b_[sl, sl]) / np.linalg.norm(b_[sl, sl])


print("dropped:", int(nd))
print("rel(idg-aw, bank-aw):", rel(img_idg, img_ex))

# diagnostics: also vs delta-only pair (no shift) to separate base parity
ak2 = np.zeros((2, s_k, s_k), np.complex128)
ak2[:, s_k // 2, s_k // 2] = 1.0
g_ex0 = convgrid_aw(
    jnp.conj(bank_t), jnp.asarray(ak2), jnp.zeros((N, N), jnp.complex128),
    jnp.asarray(p), wbin, jnp.asarray(a1), jnp.asarray(a2),
    jnp.asarray(vis), chunk=64,
)
scr0 = aw_screens(jnp.asarray(ak2), S, dtype=jnp.complex128)
g_idg0, nd0 = idg_grid_aw(
    (N, N), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
    jnp.asarray(w_b), jnp.asarray(vis), scr0, theta=THETA, subgrid=S,
    max_runs=8,
)
print("dropped0:", int(nd0))
print("rel delta-pair (base parity):", rel(img_of(g_idg0), img_of(g_ex0)))
