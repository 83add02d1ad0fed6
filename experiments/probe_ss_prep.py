"""Round-5 probe: where does the sorted single-shot surcharge go?

Attribution of the single-shot IDG-AW step (prep + streamed kernel) at
round-5 rates (VERDICT r4 #3).  All timings are chained (CHAIN=16) with
the salt applied to ``p`` (scaled by 1e-12 — structurally inert but
defeats both the tunnel's execution cache and XLA's hoisting of the
key/CSR computation, which a vis-side salt would leave salt-invariant
and therefore hoisted OUT of the chain: round-4 lesson).

Variants:
  keys     _record_keys only
  sort7    current 7-operand num_keys=2 sort (keys included)
  sort6    fused single-key 6-operand num_keys=1 sort (keys included)
  csr      keys + sort7 + _run_csr + block_run_ranges
  prep     full idg_aw_run_records (adds packing)
  ss       prep + streamed kernel (the production single-shot)

Run: python experiments/probe_ss_prep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ska_sdp_tpu.kernels.idg_aw_pallas import idg_aw_run_records
from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (block_run_ranges,
                                                      idg_aw_grid_stream)
from ska_sdp_tpu.ops.idg_aw import _record_keys, aw_screens_host

THETA, LAM = 0.008, 300000
N = int(round(THETA * LAM))
NANT, NTIME, NCHAN = 64, 65, 8
CHAIN = 16


def track_data(rng):
    ii, jj = np.triu_indices(NANT, k=1)
    nbl = ii.shape[0]
    u0 = rng.uniform(-0.40, 0.40, (nbl, 2))
    du = rng.uniform(-30.0 / N, 30.0 / N, (nbl, 2))
    w0 = rng.uniform(-3800.0, 3800.0, nbl)
    dw = rng.uniform(-100.0, 100.0, nbl)
    ft = (np.arange(NTIME) / NTIME)[:, None, None]
    fs = (1.0 + 0.0005 * np.arange(NCHAN))[None, None, :]
    ut = (u0[None, :, 0:1] + du[None, :, 0:1] * ft) * fs
    vt = (u0[None, :, 1:2] + du[None, :, 1:2] * ft) * fs
    wt = (w0[None, :, None] + dw[None, :, None] * ft) * np.ones_like(fs)
    n = ut.size
    p = np.zeros((n, 3), np.float32)
    p[:, 0] = ut.ravel()
    p[:, 1] = vt.ravel()
    a1 = np.broadcast_to(ii[None, :, None], ut.shape).ravel().astype(np.int32)
    a2 = np.broadcast_to(jj[None, :, None], ut.shape).ravel().astype(np.int32)
    vr = rng.standard_normal(n).astype(np.float32)
    vi = rng.standard_normal(n).astype(np.float32)
    return p, wt.ravel().astype(np.float32), a1, a2, vr, vi, nbl, n


def timeit(name, step, args, n, k=3):
    @jax.jit
    def chained(salt0, *args):
        def body(i, acc):
            return acc + step(*args, salt0 + 1e-6 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(jnp.float32(0.0), *args))
    tc = time.perf_counter() - t0
    ts = []
    for i in range(k):
        t0 = time.perf_counter()
        float(chained(jnp.float32(1e-3 * (i + 1)), *args))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"{name:10s} compile {tc:6.1f}s  {dt*1e3:7.2f} ms/step  "
          f"{n/dt/1e6:6.1f} M vis/s", flush=True)


def main():
    which = sys.argv[1:] or ["keys", "sort7", "sort6", "csr", "prep", "ss"]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    p, w, a1, a2, vr, vi, nbl, n = track_data(rng)
    max_runs = 8 * nbl + n // 128 + 64
    pj, wj = jnp.asarray(p), jnp.asarray(w)
    a1j, a2j = jnp.asarray(a1), jnp.asarray(a2)
    vrj, vij = jnp.asarray(vr), jnp.asarray(vi)

    s = 15
    ak = np.zeros((NANT, s, s), np.complex64)
    ak[:, s // 2, s // 2] = 1.0
    scr = aw_screens_host(ak, 64).astype(np.complex64)
    sre = jnp.asarray(scr.real.astype(np.float32))
    sim = jnp.asarray(scr.imag.astype(np.float32))

    def salted_p(p_j, salt):
        return p_j + salt * jnp.float32(1e-12)

    if "keys" in which:
        @jax.jit
        def keys_step(p_j, a1_j, a2_j, salt):
            (pkey, tkey, dy, dx, valid, fit, *_r) = _record_keys(
                (N, N), salted_p(p_j, salt), a1_j, a2_j, 64, 15, 0)
            return (jnp.sum(pkey % 97).astype(jnp.float32)
                    + jnp.sum(dy) + jnp.sum(valid))

        timeit("keys", keys_step, (pj, a1j, a2j), n)

    if "sort7" in which:
        @jax.jit
        def sort7_step(p_j, a1_j, a2_j, w_j, vr_j, vi_j, salt):
            (pkey, tkey, dy, dx, valid, fit, *_r) = _record_keys(
                (N, N), salted_p(p_j, salt), a1_j, a2_j, 64, 15, 0)
            out = jax.lax.sort([pkey, tkey, dy, dx, w_j, vr_j, vi_j],
                               num_keys=2, is_stable=True)
            return sum(jnp.sum(o[::4097]).astype(jnp.float32)
                       for o in out[2:])

        timeit("sort7", sort7_step, (pj, a1j, a2j, wj, vrj, vij), n)

    if "sort6" in which:
        @jax.jit
        def sort6_step(p_j, a1_j, a2_j, w_j, vr_j, vi_j, salt):
            (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t, HP, WP) = \
                _record_keys((N, N), salted_p(p_j, salt), a1_j, a2_j,
                             64, 15, 0)
            nty_t = (HP + Tc - 1) // Tc
            ntile = ntx_t * nty_t
            # dense pair rank: pkey = a1*2^15 + a2 -> a1*nant_b + a2
            nant_b = jnp.maximum(jnp.max(a1_j), jnp.max(a2_j)) + 1
            ia1 = pkey // jnp.int32(2**15)
            ia2 = pkey - ia1 * jnp.int32(2**15)
            pid = ia1 * nant_b + ia2
            fused = jnp.where(pkey < jnp.int32(2**30),
                              pid * ntile + tkey, jnp.int32(2**30))
            out = jax.lax.sort([fused, dy, dx, w_j, vr_j, vi_j],
                               num_keys=1, is_stable=True)
            return sum(jnp.sum(o[::4097]).astype(jnp.float32)
                       for o in out[1:])

        timeit("sort6", sort6_step, (pj, a1j, a2j, wj, vrj, vij), n)

    if "csr" in which:
        from ska_sdp_tpu.kernels.idg_aw_pallas import _run_csr

        @jax.jit
        def csr_step(p_j, a1_j, a2_j, w_j, vr_j, vi_j, salt):
            (pkey, tkey, dy, dx, valid, fit, Tc, ntx_t, HP, WP) = \
                _record_keys((N, N), salted_p(p_j, salt), a1_j, a2_j,
                             64, 15, 0)
            out = jax.lax.sort([pkey, tkey, dy, dx, w_j, vr_j, vi_j],
                               num_keys=2, is_stable=True)
            pk_s, tk_s = out[0], out[1]
            (starts_ext, starts, ends, y0, x0, ia1, ia2,
             overflow) = _run_csr(pk_s, tk_s, n, max_runs, Tc, ntx_t,
                                  64, HP, WP)
            rs, re = block_run_ranges(starts, ends,
                                      ((n + 255) // 256) * 256, 256)
            return (jnp.sum(starts % 31).astype(jnp.float32)
                    + jnp.sum(rs % 7) + jnp.sum(y0 % 5)
                    + jnp.sum(out[4][::4097]))

        timeit("csr", csr_step, (pj, a1j, a2j, wj, vrj, vij), n)

    if "prep" in which:
        @jax.jit
        def prep_step(p_j, a1_j, a2_j, w_j, vr_j, vi_j, salt):
            recs, st, en, y0, x0, i1, i2, nd, _ = idg_aw_run_records(
                (N, N), salted_p(p_j, salt), a1_j, a2_j, w_j, vr_j,
                vi_j, max_runs=max_runs)
            return (jnp.sum(recs[:, :, ::129]).astype(jnp.float32)
                    + jnp.sum(st % 31) + 0.0 * nd)

        timeit("prep", prep_step, (pj, a1j, a2j, wj, vrj, vij), n)

    if "ss" in which:
        @jax.jit
        def ss_step(p_j, a1_j, a2_j, w_j, vr_j, vi_j, salt):
            gr, gi, nd = idg_aw_grid_stream(
                (N, N), salted_p(p_j, salt), a1_j, a2_j, w_j, vr_j,
                vi_j, sre, sim, theta=THETA, max_runs=max_runs)
            return jnp.sum(jnp.abs(gr)) + jnp.sum(jnp.abs(gi)) + 0.0 * nd

        timeit("ss", ss_step, (pj, a1j, a2j, wj, vrj, vij, ), n)


if __name__ == "__main__":
    main()
