"""Real-TPU probe for the IDG-AW degrid kernel.

Stages (argv[1]): kernel  — small-grid run, saves vis to npz
                  parity  — CPU oracle comparison against the saved vis
                  rate    — 1M-record 2400² chained-dispatch throughput
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ska_sdp_tpu_jax_cache")

import numpy as np

import jax

STAGE = sys.argv[1] if len(sys.argv) > 1 else "kernel"
if STAGE == "parity":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from ska_sdp_tpu.ops.idg_aw import aw_screens_host

print("devices:", jax.devices(), flush=True)

if STAGE in ("kernel", "parity"):
    N, THETA = 256, 0.05
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
    s = 15
    ak = np.zeros((4, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    ak += 0.05 * rng.standard_normal((4, s, s)).astype(np.complex64)
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    G = (rng.standard_normal((N, N))
         + 1j * rng.standard_normal((N, N))).astype(np.complex64)

    if STAGE == "kernel":
        from ska_sdp_tpu.kernels.idg_aw_degrid_pallas import (
            idg_aw_degrid_pallas,
        )

        @jax.jit
        def run(p_j, a1_j, a2_j, w_j, gre, gim, sre, sim):
            return idg_aw_degrid_pallas(
                (N, N), p_j, a1_j, a2_j, w_j, gre, gim, sre, sim,
                theta=THETA, max_runs=256,
            )

        vr, vi, nd = jax.block_until_ready(run(
            jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
            jnp.asarray(w), jnp.asarray(G.real), jnp.asarray(G.imag),
            jnp.asarray(scr.real), jnp.asarray(scr.imag)))
        np.savez("/tmp/idg_aw_degrid_tpu.npz", vr=np.asarray(vr),
                 vi=np.asarray(vi), nd=int(nd))
        print("kernel OK chk", float(jnp.sum(jnp.abs(vr))), "nd", int(nd),
              flush=True)
    else:
        from ska_sdp_tpu.ops.idg_aw import idg_degrid_aw

        d = np.load("/tmp/idg_aw_degrid_tpu.npz")
        want, nd_w = idg_degrid_aw(
            (N, N), jnp.asarray(p), jnp.asarray(a1), jnp.asarray(a2),
            jnp.asarray(w), jnp.asarray(G), jnp.asarray(scr),
            theta=THETA, subgrid=64, max_runs=256,
        )
        got = d["vr"] + 1j * d["vi"]
        rel = (np.linalg.norm(got - np.asarray(want))
               / np.linalg.norm(np.asarray(want)))
        print(f"parity vs XLA oracle: rel={rel:.3g} nd_tpu={int(d['nd'])} "
              f"nd_cpu={int(nd_w)}", flush=True)

elif STAGE == "rate":
    sys.path.insert(0, "/root/repo/experiments")
    from probe_idg_aw_tpu import LAM, N, THETA, track_data

    from ska_sdp_tpu.kernels.idg_aw_degrid_pallas import idg_aw_degrid_pallas

    rng = np.random.default_rng(11)
    p, w, a1, a2, vr_, vi_, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64
    s = 15
    ak = np.zeros((64, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    G_re = rng.standard_normal((N, N)).astype(np.float32)
    G_im = rng.standard_normal((N, N)).astype(np.float32)
    CHAIN, STEPS = 8, 3

    @jax.jit
    def step(p_j, w_j, a1_j, a2_j, gre, gim, sre, sim, salt):
        vr, vi, nd = idg_aw_degrid_pallas(
            (N, N), p_j, a1_j, a2_j, w_j, gre + salt, gim, sre, sim,
            theta=THETA, max_runs=max_runs,
        )
        return jnp.sum(jnp.abs(vr)) + jnp.sum(jnp.abs(vi)) + 0.0 * nd

    @jax.jit
    def chained(salt0, *args):
        def body(i, acc):
            return acc + step(*args, salt0 + 1e-6 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    args = (jnp.asarray(p), jnp.asarray(w), jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(G_re), jnp.asarray(G_im),
            jnp.asarray(scr.real), jnp.asarray(scr.imag))
    t0 = time.perf_counter()
    c0 = float(chained(jnp.float32(0.0), *args))
    print(f"compile+run {time.perf_counter()-t0:.1f}s chk={c0:.4g}",
          flush=True)
    assert np.isfinite(c0) and c0 > 0
    ts = []
    for i in range(STEPS):
        t0 = time.perf_counter()
        c1 = float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"per-step {dt*1e3:.1f} ms -> {n/dt/1e6:.1f} M vis/s", flush=True)
