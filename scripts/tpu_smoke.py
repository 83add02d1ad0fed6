"""TPU smoke test: parity + throughput of all three Pallas kernels on
real hardware, against the XLA reference paths, at the SKA1_Low scale.

Run: PYTHONPATH=. python scripts/tpu_smoke.py   (on the TPU machine)
Prints one PASS/FAIL line per kernel plus the measured rates.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(step, args, n, k=5):
    chk = float(step(*args, jnp.float32(0.0)))
    assert np.isfinite(chk), chk
    t0 = time.perf_counter()
    for i in range(k):
        chk = float(step(*args, jnp.float32(1e-6 * (i + 1))))
    return n / ((time.perf_counter() - t0) / k)


def main() -> int:
    from ska_sdp_tpu.kernels.aw_fused_pallas import convgrid_aw_fused
    from ska_sdp_tpu.kernels.wproj_degrid_pallas import wproj_degrid_planes
    from ska_sdp_tpu.kernels.wproj_pallas import wproj_scatter_planes
    from ska_sdp_tpu.ops.gridding import convgrid_wproj, degrid_wproj

    rng = np.random.default_rng(0)
    NW, QPX, S, NANT = 32, 8, 15, 64
    NG = 2400
    N = 1 << 20
    ok = True

    bank_re = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    bank_im = jnp.asarray(
        rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-0.42, 0.42, (N, 3)).astype(np.float32))
    wbin = jnp.asarray(rng.integers(0, NW, N).astype(np.int32))
    vr = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    # --- parity on a small case (on-chip, vs the XLA paths) ---
    ns, hs = 4000, 512
    ps = jnp.asarray(rng.uniform(-0.49, 0.49, (ns, 3)).astype(np.float32))
    wbs = jnp.asarray(rng.integers(0, NW, ns).astype(np.int32))
    vrs = jnp.asarray(rng.standard_normal(ns).astype(np.float32))
    vis_ = jnp.asarray(rng.standard_normal(ns).astype(np.float32))

    @jax.jit
    def parity(br, bi, p, wb, vr, vi):
        bank = jax.lax.complex(br, bi)
        vis = jax.lax.complex(vr, vi)
        gr, gi = wproj_scatter_planes(br, bi, (hs, hs), p, wb, vr, vi)
        want = convgrid_wproj(bank, jnp.zeros((hs, hs), jnp.complex64),
                              p, wb, vis, chunk=1024)
        err_g = jnp.max(jnp.abs(jax.lax.complex(gr, gi) - want))
        pv_r, pv_i = wproj_degrid_planes(br, bi, jnp.real(want),
                                         jnp.imag(want), p, wb)
        want_d = degrid_wproj(bank, want, p, wb, chunk=1024)
        err_d = jnp.max(jnp.abs(jax.lax.complex(pv_r, pv_i) - want_d))
        scale = jnp.max(jnp.abs(want)) + 1e-30
        return err_g / scale, err_d / (jnp.max(jnp.abs(want_d)) + 1e-30)

    eg, ed = parity(bank_re, bank_im, ps, wbs, vrs, vis_)
    for name, e in [("wproj grid parity", float(eg)),
                    ("degrid parity", float(ed))]:
        good = e < 2e-4
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} {name}: rel err {e:.2e}")

    # --- throughput at bench scale ---
    @jax.jit
    def sg(br, bi, p, wb, vr, vi, salt):
        gr, gi = wproj_scatter_planes(br, bi, (NG, NG), p, wb, vr, vi + salt)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    rate = _time(sg, (bank_re, bank_im, p, wbin, vr, vi), N)
    print(f"wproj gridding: {rate/1e6:.2f} M vis/s")

    gre = jnp.asarray(rng.standard_normal((NG, NG)).astype(np.float32))
    gim = jnp.asarray(rng.standard_normal((NG, NG)).astype(np.float32))

    @jax.jit
    def sd(br, bi, gre, gim, p, wb, salt):
        dr, di = wproj_degrid_planes(br, bi, gre + salt, gim, p, wb)
        return jnp.sum(jnp.abs(dr)) + jnp.sum(jnp.abs(di))

    rate = _time(sd, (bank_re, bank_im, gre, gim, p, wbin), N)
    print(f"degridding:     {rate/1e6:.2f} M vis/s")

    Na = 1 << 19
    akr = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
    aki = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
    a1 = jnp.asarray(rng.integers(0, NANT, Na).astype(np.int32))
    a2 = jnp.asarray(rng.integers(0, NANT, Na).astype(np.int32))

    @jax.jit
    def sa(br, bi, ar, ai, p, wb, a1, a2, vr, vi, salt):
        wk = jax.lax.complex(br, bi)
        ak = jax.lax.complex(ar, ai)
        vis = jax.lax.complex(vr, vi + salt)
        g = convgrid_aw_fused(wk, ak, jnp.zeros((NG, NG), jnp.complex64),
                              p, wb, a1, a2, vis)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    rate = _time(
        sa,
        (bank_re, bank_im, akr, aki, p[:Na], wbin[:Na], a1, a2,
         vr[:Na], vi[:Na]),
        Na, k=3,
    )
    print(f"AW fused:       {rate/1e6:.2f} M vis/s")

    # --- image-domain gridding: on-chip parity vs the XLA IDG path + rate
    from ska_sdp_tpu.kernels.idg_pallas import idg_grid_wproj_pallas
    from ska_sdp_tpu.ops.idg import idg_grid_wproj

    THETA = 0.008
    wvs = jnp.asarray(rng.uniform(-3800, 3800, ns).astype(np.float32))

    @jax.jit
    def parity_idg(p, w, vr, vi):
        gr, gi = idg_grid_wproj_pallas((hs, hs), p, w, vr, vi,
                                       theta=THETA, subgrid=32)
        want = idg_grid_wproj((hs, hs), p, w, jax.lax.complex(vr, vi),
                              theta=THETA, subgrid=32)
        diff = jax.lax.complex(gr, gi) - want
        return jnp.max(jnp.abs(diff)) / (jnp.max(jnp.abs(want)) + 1e-30)

    ei = float(parity_idg(ps, wvs, vrs, vis_))
    good = ei < 2e-4
    ok &= good
    print(f"{'PASS' if good else 'FAIL'} IDG parity: rel err {ei:.2e}")

    wvb = jnp.asarray(rng.uniform(-3800, 3800, N).astype(np.float32))

    @jax.jit
    def si(p, w, vr, vi, salt):
        gr, gi = idg_grid_wproj_pallas((NG, NG), p, w, vr, vi + salt,
                                       theta=THETA, subgrid=64)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    rate = _time(si, (p, wvb, vr, vi), N, k=3)
    print(f"IDG:            {rate/1e6:.2f} M vis/s")
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
