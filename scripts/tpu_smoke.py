"""TPU smoke test: on-chip parity + throughput of the round-3 kernels
against the XLA reference paths at the SKA1_Low scale.

Round-3 kernel set: resident-grid w-proj scatter / degrid / fused AW
(whole uv-grid in VMEM, records in input order — no binning) and the IDG
grid/degrid pair.  Timing uses the chained-dispatch convention of
bench.py: every host dispatch through the remote-TPU tunnel costs ~27 ms
regardless of the program, so K data-dependent salted steps run per
dispatch and the per-step device time is reported.

Run: PYTHONPATH=. python scripts/tpu_smoke.py   (on the TPU machine)
Healthy round-4 signals (v5e, chain=24): wproj ~35M, degrid ~30M, AW ~7M
(split3 tier), IDG ~36M, IDG degrid ~35M, IDG-AW (streamed, sorted
single-shot) ~50M vis/s; parity ≤ 2e-4 everywhere.  The IDG-AW 2400²
Mosaic compile measures ~40-100 s cold on the current stack (the
round-3 "~17 min" lore no longer reproduces — probe_idg_aw_compile.py
bisects it if it ever comes back).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 24     # round-4: dispatch floor/chain still ~4ms/step at 8 (bench.py)


def _time(step, args, n, k=3, chain=CHAIN):
    """Per-step device throughput: chain salted steps per dispatch."""

    @jax.jit
    def chained(salt0, *args):
        def body(i, acc):
            return acc + step(*args, salt0 + 1e-6 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    chk = float(chained(jnp.float32(0.0), *args))
    assert np.isfinite(chk), chk
    ts = []
    for i in range(k):
        t0 = time.perf_counter()
        chk = float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(chk), chk
    return n / (sorted(ts)[len(ts) // 2] / chain)


def main() -> int:
    from ska_sdp_tpu.kernels.aw_fused_resident_pallas import (
        convgrid_aw_resident,
    )
    from ska_sdp_tpu.kernels.idg_degrid_pallas import idg_degrid_wproj_pallas
    from ska_sdp_tpu.kernels.idg_pallas import idg_grid_wproj_pallas
    from ska_sdp_tpu.kernels.wproj_degrid_resident_pallas import (
        wproj_degrid_resident_planes,
    )
    from ska_sdp_tpu.kernels.wproj_resident_pallas import (
        wproj_scatter_resident,
    )
    from ska_sdp_tpu.ops.gridding import convgrid_wproj, degrid_wproj
    from ska_sdp_tpu.ops.idg import idg_degrid_wproj, idg_grid_wproj

    rng = np.random.default_rng(0)
    NW, QPX, S, NANT = 32, 8, 15, 64
    NG = 2400
    N = 1 << 20
    THETA = 0.008
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
    # cluster 3/4 of the records into a tiny uv patch so the multi-block
    # kernel paths (record streaming, IDG-degrid head/main/drain) run with
    # nblocks >= 3 on real hardware, not just single-record subgrids
    ps_np = rng.uniform(-0.49, 0.49, (ns, 3)).astype(np.float32)
    ps_np[: 3 * ns // 4, :2] = rng.uniform(
        0.01, 0.03, (3 * ns // 4, 2)).astype(np.float32)
    ps = jnp.asarray(ps_np)
    wbs = jnp.asarray(rng.integers(0, NW, ns).astype(np.int32))
    vrs = jnp.asarray(rng.standard_normal(ns).astype(np.float32))
    vis_ = jnp.asarray(rng.standard_normal(ns).astype(np.float32))
    wvs = jnp.asarray(rng.uniform(-3800, 3800, ns).astype(np.float32))

    @jax.jit
    def parity(br, bi, p, wb, vr, vi):
        bank = jax.lax.complex(br, bi)
        vis = jax.lax.complex(vr, vi)
        gr, gi = wproj_scatter_resident(br, bi, (hs, hs), p, wb, vr, vi)
        want = convgrid_wproj(bank, jnp.zeros((hs, hs), jnp.complex64),
                              p, wb, vis, chunk=1024)
        err_g = jnp.max(jnp.abs(jax.lax.complex(gr, gi) - want))
        pv_r, pv_i = wproj_degrid_resident_planes(
            br, bi, jnp.real(want), jnp.imag(want), p, wb)
        want_d = degrid_wproj(bank, want, p, wb, chunk=1024)
        err_d = jnp.max(jnp.abs(jax.lax.complex(pv_r, pv_i) - want_d))
        scale = jnp.max(jnp.abs(want)) + 1e-30
        return err_g / scale, err_d / (jnp.max(jnp.abs(want_d)) + 1e-30)

    eg, ed = parity(bank_re, bank_im, ps, wbs, vrs, vis_)
    for name, e in [("resident wproj parity", float(eg)),
                    ("resident degrid parity", float(ed))]:
        good = e < 2e-4
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} {name}: rel err {e:.2e}",
              flush=True)

    @jax.jit
    def parity_idg(p, w, vr, vi):
        gr, gi = idg_grid_wproj_pallas((hs, hs), p, w, vr, vi,
                                       theta=THETA, subgrid=32)
        want = idg_grid_wproj((hs, hs), p, w, jax.lax.complex(vr, vi),
                              theta=THETA, subgrid=32)
        e1 = jnp.max(jnp.abs(jax.lax.complex(gr, gi) - want)) / (
            jnp.max(jnp.abs(want)) + 1e-30)
        got_d = idg_degrid_wproj_pallas((hs, hs), p, w, want,
                                        theta=THETA, subgrid=32)
        want_d = idg_degrid_wproj((hs, hs), p, w, want,
                                  theta=THETA, subgrid=32)
        e2 = jnp.max(jnp.abs(got_d - want_d)) / (
            jnp.max(jnp.abs(want_d)) + 1e-30)
        return e1, e2

    ei, eid = parity_idg(ps, wvs, vrs, vis_)
    for name, e in [("IDG grid parity", float(ei)),
                    ("IDG degrid parity", float(eid))]:
        good = e < 2e-4
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} {name}: rel err {e:.2e}",
              flush=True)

    # --- throughput at bench scale (chained dispatch) ---
    @jax.jit
    def sg(br, bi, p, wb, vr, vi, salt):
        gr, gi = wproj_scatter_resident(br, bi, (NG, NG), p, wb,
                                        vr, vi + salt)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    rate = _time(sg, (bank_re, bank_im, p, wbin, vr, vi), N)
    print(f"wproj gridding (resident): {rate/1e6:.2f} M vis/s", flush=True)

    gre = jnp.asarray(rng.standard_normal((NG, NG)).astype(np.float32))
    gim = jnp.asarray(rng.standard_normal((NG, NG)).astype(np.float32))

    @jax.jit
    def sd(br, bi, gre, gim, p, wb, salt):
        dr, di = wproj_degrid_resident_planes(br, bi, gre + salt, gim, p, wb)
        return jnp.sum(jnp.abs(dr)) + jnp.sum(jnp.abs(di))

    rate = _time(sd, (bank_re, bank_im, gre, gim, p, wbin), N)
    print(f"degridding (resident):     {rate/1e6:.2f} M vis/s", flush=True)

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
        g = convgrid_aw_resident(wk, ak, jnp.zeros((NG, NG), jnp.complex64),
                                 p, wb, a1, a2, vis)
        return jnp.sum(jnp.abs(jnp.real(g))) + jnp.sum(jnp.abs(jnp.imag(g)))

    rate = _time(
        sa,
        (bank_re, bank_im, akr, aki, p[:Na], wbin[:Na], a1, a2,
         vr[:Na], vi[:Na]),
        Na,
    )
    print(f"AW fused (resident):       {rate/1e6:.2f} M vis/s", flush=True)

    wvb = jnp.asarray(rng.uniform(-3800, 3800, N).astype(np.float32))

    @jax.jit
    def si(p, w, vr, vi, salt):
        gr, gi = idg_grid_wproj_pallas((NG, NG), p, w, vr, vi + salt,
                                       theta=THETA, subgrid=64)
        return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi))

    rate = _time(si, (p, wvb, vr, vi), N)
    print(f"IDG:                       {rate/1e6:.2f} M vis/s", flush=True)

    @jax.jit
    def sid(gre, gim, p, w, salt):
        v = idg_degrid_wproj_pallas(
            (NG, NG), p, w, jax.lax.complex(gre + salt, gim),
            theta=THETA, subgrid=64)
        return jnp.sum(jnp.abs(jnp.real(v))) + jnp.sum(jnp.abs(jnp.imag(v)))

    rate = _time(sid, (gre, gim, p, wvb), N)
    print(f"IDG degrid:                {rate/1e6:.2f} M vis/s", flush=True)

    # --- IDG-AW (streamed kernel; round-4 flagship) ---------------------
    # parity on track-like pairs (small grid), then the bench-shape rate;
    # the 2400^2 Mosaic compile measures ~40-100 s cold (round 4 — the
    # round-3 ~17 min lore no longer reproduces on the current stack)
    from ska_sdp_tpu.kernels.idg_aw_pallas import idg_aw_gridder_pallas
    from ska_sdp_tpu.ops.idg_aw import aw_screens_host, idg_grid_aw

    nsa = 4096
    nbl_s = 6
    prs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    bl = rng.integers(0, nbl_s, nsa)
    u0s = rng.uniform(-0.3, 0.3, (nbl_s, 2))
    pa = np.zeros((nsa, 3), np.float32)
    pa[:, 0] = u0s[bl, 0] + rng.uniform(-6 / hs, 6 / hs, nsa)
    pa[:, 1] = u0s[bl, 1] + rng.uniform(-6 / hs, 6 / hs, nsa)
    wa = rng.uniform(-200, 200, nsa).astype(np.float32)
    a1s = np.asarray([prs[i][0] for i in bl], np.int32)
    a2s = np.asarray([prs[i][1] for i in bl], np.int32)
    aks = np.zeros((4, S, S), np.complex64)
    aks[:, S // 2, S // 2] = 1.0
    aks[:, 6:9, 6:9] += 0.1 * (
        rng.standard_normal((4, 3, 3))
        + 1j * rng.standard_normal((4, 3, 3))).astype(np.complex64)
    scr_s = aw_screens_host(aks, 64).astype(np.complex64)
    mr_s = 8 * nbl_s + nsa // 128 + 64
    var = jnp.asarray(rng.standard_normal(nsa).astype(np.float32))
    vai = jnp.asarray(rng.standard_normal(nsa).astype(np.float32))

    @jax.jit
    def parity_aw_idg(p, a1, a2, w, vr, vi, sre, sim):
        vis = jax.lax.complex(vr, vi)          # complex formed ON device
        got, nd = idg_aw_gridder_pallas(
            (hs, hs), p, a1, a2, w, vis, jax.lax.complex(sre, sim),
            theta=0.05, max_runs=mr_s)
        want, nd_w = idg_grid_aw(
            (hs, hs), p, a1, a2, w, vis, jax.lax.complex(sre, sim),
            theta=0.05, max_runs=mr_s)
        e = jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-30)
        return e, nd, nd_w

    eaw, nd_g, nd_w = parity_aw_idg(
        jnp.asarray(pa), jnp.asarray(a1s), jnp.asarray(a2s),
        jnp.asarray(wa), var, vai,
        jnp.asarray(scr_s.real.astype(np.float32)),
        jnp.asarray(scr_s.imag.astype(np.float32)))
    good = float(eaw) < 2e-4 and int(nd_g) == int(nd_w)
    ok &= good
    print(f"{'PASS' if good else 'FAIL'} IDG-AW stream parity: rel err "
          f"{float(eaw):.2e} (drops {int(nd_g)}/{int(nd_w)})", flush=True)

    # subgrid-32 envelope (VERDICT r4 #8): same data, S=32 screens +
    # support 9 — covers the sub-lane-tile window/roll LOWERING the
    # interpret-mode tests cannot (S=32's (64,64) pair-dot roll and
    # 192-lane patch sit below one lane tile)
    scr32 = aw_screens_host(aks, 32).astype(np.complex64)
    mr32 = 24 * nbl_s + nsa // 64 + 64

    @jax.jit
    def parity_aw_s32(p, a1, a2, w, vr, vi, sre, sim):
        vis = jax.lax.complex(vr, vi)
        got, nd = idg_aw_gridder_pallas(
            (hs, hs), p, a1, a2, w, vis, jax.lax.complex(sre, sim),
            theta=0.05, subgrid=32, support=9, max_runs=mr32)
        want, nd_w = idg_grid_aw(
            (hs, hs), p, a1, a2, w, vis, jax.lax.complex(sre, sim),
            theta=0.05, subgrid=32, support=9, max_runs=mr32)
        e = jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-30)
        return e, nd, nd_w

    e32, nd32, nd32w = parity_aw_s32(
        jnp.asarray(pa), jnp.asarray(a1s), jnp.asarray(a2s),
        jnp.asarray(wa), var, vai,
        jnp.asarray(scr32.real.astype(np.float32)),
        jnp.asarray(scr32.imag.astype(np.float32)))
    good = float(e32) < 2e-4 and int(nd32) == int(nd32w)
    ok &= good
    print(f"{'PASS' if good else 'FAIL'} IDG-AW subgrid-32 parity: rel "
          f"err {float(e32):.2e} (drops {int(nd32)}/{int(nd32w)})",
          flush=True)

    ii64, jj64 = np.triu_indices(NANT, k=1)
    nbl64 = ii64.shape[0]
    ntime_aw = N // nbl64
    naw = nbl64 * ntime_aw
    ft = (np.arange(ntime_aw) / ntime_aw)[:, None]
    u0b = rng.uniform(-0.40, 0.40, (nbl64, 2))
    dub = rng.uniform(-30.0 / NG, 30.0 / NG, (nbl64, 2))
    ub = u0b[None, :, 0] + dub[None, :, 0] * ft
    vb = u0b[None, :, 1] + dub[None, :, 1] * ft
    paw = np.zeros((naw, 3), np.float32)
    paw[:, 0] = ub.ravel()
    paw[:, 1] = vb.ravel()
    waw = rng.uniform(-3800, 3800, naw).astype(np.float32)
    a1b = np.broadcast_to(ii64[None, :], ub.shape).ravel().astype(np.int32)
    a2b = np.broadcast_to(jj64[None, :], ub.shape).ravel().astype(np.int32)
    akb = np.zeros((NANT, S, S), np.complex64)
    akb[:, S // 2, S // 2] = 1.0
    scr_b = aw_screens_host(akb, 64).astype(np.complex64)
    mr_b = 8 * nbl64 + naw // 128 + 64

    @jax.jit
    def saw(p, a1, a2, w, vr, vi, sre, sim, salt):
        guv, nd = idg_aw_gridder_pallas(
            (NG, NG), p, a1, a2, w, jax.lax.complex(vr, vi + salt),
            jax.lax.complex(sre, sim), theta=THETA, max_runs=mr_b)
        return (jnp.sum(jnp.abs(jnp.real(guv)))
                + jnp.sum(jnp.abs(jnp.imag(guv))) + 0.0 * nd)

    rate = _time(
        saw,
        (jnp.asarray(paw), jnp.asarray(a1b), jnp.asarray(a2b),
         jnp.asarray(waw), vr[:naw], vi[:naw],
         jnp.asarray(scr_b.real.astype(np.float32)),
         jnp.asarray(scr_b.imag.astype(np.float32))),
        naw)
    print(f"IDG-AW (streamed):         {rate/1e6:.2f} M vis/s", flush=True)

    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
