"""Real-TPU probe: IDG-AW resident kernel rate + drop count at SKA1_Low
scale (2400² grid, 64 antennas, ~1M track-like visibilities).

Chained-dispatch timing (BENCH.md round-3 discipline: ~27 ms tunnel
round-trip per dispatch; salts defeat caching/CSE).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ska_sdp_tpu_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

THETA, LAM = 0.008, 300000
N = int(round(THETA * LAM))
NANT, NTIME, NCHAN = 64, 65, 8
WMAX = 3800.0
CHAIN, STEPS = 8, 3


def track_data(rng):
    ii, jj = np.triu_indices(NANT, k=1)
    nbl = ii.shape[0]
    u0 = rng.uniform(-0.40, 0.40, (nbl, 2))
    du = rng.uniform(-30.0 / N, 30.0 / N, (nbl, 2))      # ~30 cells/track
    w0 = rng.uniform(-WMAX, WMAX, nbl)
    dw = rng.uniform(-100.0, 100.0, nbl)
    ft = (np.arange(NTIME) / NTIME)[:, None, None]       # [t, 1, 1]
    fs = (1.0 + 0.0005 * np.arange(NCHAN))[None, None, :]
    u = (u0[None, :, 0:1] + du[None, :, 0:1] * ft) * fs  # [t, nbl, c]
    v = (u0[None, :, 1:2] + du[None, :, 1:2] * ft) * fs
    w = (w0[None, :, None] + dw[None, :, None] * ft) * np.ones_like(fs)
    a1 = np.broadcast_to(ii[None, :, None], u.shape)
    a2 = np.broadcast_to(jj[None, :, None], u.shape)
    n = u.size
    p = np.zeros((n, 3), np.float32)
    p[:, 0] = u.ravel()
    p[:, 1] = v.ravel()
    vis_re = rng.standard_normal(n).astype(np.float32)
    vis_im = rng.standard_normal(n).astype(np.float32)
    return (p, w.ravel().astype(np.float32),
            a1.ravel().astype(np.int32), a2.ravel().astype(np.int32),
            vis_re, vis_im, nbl, n)


def main():
    from ska_sdp_tpu.kernels.idg_aw_pallas import idg_aw_grid_pallas
    from ska_sdp_tpu.ops.idg_aw import aw_screens_host

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    print(f"n={n} nbl={nbl}", flush=True)

    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    c = s // 2
    ak[:, c - 1:c + 2, c - 1:c + 2] += 0.05 * (
        rng.standard_normal((NANT, 3, 3))
        + 1j * rng.standard_normal((NANT, 3, 3))).astype(np.complex64)
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    scr_re = jnp.asarray(scr.real.astype(np.float32))
    scr_im = jnp.asarray(scr.imag.astype(np.float32))

    max_runs = 8 * nbl + n // 128 + 64

    @jax.jit
    def step(p_j, w_j, a1_j, a2_j, vr_j, vi_j, sre, sim, salt):
        gr, gi, nd = idg_aw_grid_pallas(
            (N, N), p_j, a1_j, a2_j, w_j, vr_j, vi_j + salt, sre, sim,
            theta=THETA, max_runs=max_runs,
        )
        return (jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi)),
                nd.astype(jnp.float32))

    @jax.jit
    def chained(salt0, p_j, w_j, a1_j, a2_j, vr_j, vi_j, sre, sim):
        def body(i, acc):
            chk, nd = step(p_j, w_j, a1_j, a2_j, vr_j, vi_j, sre, sim,
                           salt0 + 1e-6 * i.astype(jnp.float32))
            return acc + chk + 0 * nd

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    args = (jnp.asarray(p), jnp.asarray(w), jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(vr), jnp.asarray(vi),
            scr_re, scr_im)

    t0 = time.perf_counter()
    chk, nd = step(*args, jnp.float32(0.0))
    chk = float(chk)
    nd = float(nd)
    print(f"single step compile+run {time.perf_counter()-t0:.1f}s "
          f"chk={chk:.4g} dropped={nd:.0f} ({100*nd/n:.3f}%)", flush=True)
    assert np.isfinite(chk) and chk > 0

    t0 = time.perf_counter()
    c0 = float(chained(jnp.float32(0.0), *args))
    print(f"chained compile+run {time.perf_counter()-t0:.1f}s chk={c0:.4g}",
          flush=True)
    ts = []
    for i in range(STEPS):
        t0 = time.perf_counter()
        c1 = float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(c1) and c1 > 0
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"per-step {dt*1e3:.1f} ms -> {n/dt/1e6:.1f} M vis/s", flush=True)


if __name__ == "__main__":
    main()
