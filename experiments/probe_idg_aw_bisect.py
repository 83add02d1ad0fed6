"""Bisect the IDG-AW TPU UNIMPLEMENTED: prep-only, then kernel on tiny data."""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ska_sdp_tpu_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

THETA = 0.05
N = 256

rng = np.random.default_rng(5)
b = 2048
nbl = 6
bl = rng.integers(0, nbl, b)
pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
u0 = rng.uniform(-0.3, 0.3, (nbl, 2))
p = np.zeros((b, 3), np.float32)
p[:, 0] = u0[bl, 0] + rng.uniform(-6 / N, 6 / N, b)
p[:, 1] = u0[bl, 1] + rng.uniform(-6 / N, 6 / N, b)
w = rng.uniform(-200, 200, b).astype(np.float32)
a1 = np.asarray([pairs[i][0] for i in bl], np.int32)
a2 = np.asarray([pairs[i][1] for i in bl], np.int32)
vr = rng.standard_normal(b).astype(np.float32)
vi = rng.standard_normal(b).astype(np.float32)

STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"
if STAGE == "parity":
    jax.config.update("jax_platforms", "cpu")   # axon ignores the env var
print("devices:", jax.devices(), flush=True)

from ska_sdp_tpu.ops.idg_aw import _chunk_pair_runs, aw_screens_host

S = 64


def stage(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        leaves = jax.tree_util.tree_leaves(out)
        print(name, "OK", [float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
                           for x in leaves[:3]], flush=True)
        return out
    except Exception as e:
        print(name, "FAIL", type(e).__name__, str(e)[:400], flush=True)
        raise SystemExit(1)


def prep(p_j, a1_j, a2_j, w_j, vr_j, vi_j):
    vis = jax.lax.complex(vr_j, vi_j)
    dy, dx, wv, vv, y0, x0, ia1, ia2, nd, geom, _ = _chunk_pair_runs(
        (N, N), p_j, a1_j, a2_j, w_j, vis, subgrid=S, chunk=128,
        support=15, max_runs=256, fit_margin=13,
    )
    return (jnp.sum(jnp.abs(dy)), jnp.sum(jnp.abs(jnp.real(vv))),
            nd.astype(jnp.float32))


args = (jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(w),
        jnp.asarray(vr), jnp.asarray(vi))
if STAGE in ("all", "prep"):
    stage("prep", prep, *args)

s = 15
ak = np.zeros((4, s, s), np.complex64)
ak[:, s // 2, s // 2] = 1.0
scr = aw_screens_host(ak, S).astype(np.complex64)

from ska_sdp_tpu.kernels.idg_aw_pallas import idg_aw_grid_pallas


def full(p_j, a1_j, a2_j, w_j, vr_j, vi_j, sre, sim):
    return idg_aw_grid_pallas(
        (N, N), p_j, a1_j, a2_j, w_j, vr_j, vi_j, sre, sim,
        theta=THETA, max_runs=256,
    )


if STAGE in ("all", "kernel"):
    gr, gi, nd = stage("kernel", full, *args,
                       jnp.asarray(scr.real), jnp.asarray(scr.imag))
    np.savez("/tmp/idg_aw_tpu_grid.npz", gr=np.asarray(gr),
             gi=np.asarray(gi), nd=int(nd))
    print("saved TPU grid, nd =", int(nd), flush=True)

if STAGE not in ("all", "parity"):
    raise SystemExit(0)
d = np.load("/tmp/idg_aw_tpu_grid.npz")
from ska_sdp_tpu.ops.idg_aw import idg_grid_aw
g_want, nd_w = idg_grid_aw(
    (N, N), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
    jnp.asarray(w), jnp.asarray(vr + 1j * vi, jnp.complex64),
    jnp.asarray(scr), theta=THETA, subgrid=S, max_runs=256,
)
got = d["gr"] + 1j * d["gi"]
want = np.asarray(g_want)
rel = np.linalg.norm(got - want) / np.linalg.norm(want)
print(f"parity vs XLA oracle: rel={rel:.3g} nd_tpu={int(d['nd'])} "
      f"nd_cpu={int(nd_w)}", flush=True)
raise SystemExit(0)

