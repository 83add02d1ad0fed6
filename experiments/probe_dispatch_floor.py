import time, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from ska_sdp_tpu.kernels.wproj_pallas import (
    wproj_scatter_from_records, _preprocess)

N = 1 << 20; H = W = 2400; NW, QPX, S = 32, 8, 15
rng = np.random.default_rng(0)
bank_re = jnp.asarray(rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
bank_im = jnp.asarray(rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
p = jnp.asarray(rng.uniform(-0.42, 0.42, size=(N, 3)).astype(np.float32))
wbin = jnp.asarray(rng.integers(0, NW, N).astype(np.int32))
vr = jnp.asarray(rng.standard_normal(N).astype(np.float32))
vi = jnp.asarray(rng.standard_normal(N).astype(np.float32))

@jax.jit
def prep(p, wbin, vr, vi):
    return _preprocess((H, W), QPX, S, S, p, wbin, vr, vi)[:2]

recs, starts = jax.block_until_ready(prep(p, wbin, vr, vi))

def chained(K):
    @jax.jit
    def f(recs, starts, salt):
        def body(i, acc):
            r = recs.at[0, 3, 0].add(salt + i.astype(jnp.float32))
            gre, gim = wproj_scatter_from_records(bank_re, bank_im, (H, W), r, starts)
            return acc + jnp.sum(jnp.abs(gre[::16, ::16]))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return f

@jax.jit
def tiny(salt):
    return jnp.sum(jnp.sin(salt + jnp.arange(8.0)))

# dispatch floor: tiny op timed with full sync
s = float(tiny(jnp.float32(0)))
ts = []
for k in range(8):
    t0 = time.perf_counter(); s = float(tiny(jnp.float32(k+1))); ts.append(time.perf_counter()-t0)
print(f"tiny: min {min(ts)*1e3:7.2f} med {sorted(ts)[4]*1e3:7.2f} ms", flush=True)

for K in (1, 4):
    f = chained(K)
    s = float(f(recs, starts, jnp.float32(0.0)))
    ts = []
    for k in range(4):
        t0 = time.perf_counter()
        s = float(f(recs, starts, jnp.float32(1e-6*(k+1))))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"chain K={K}: {t*1e3:8.2f} ms total -> per-step {(t)*1e3/K:7.2f} ms "
          f"({N*K/t/1e6:6.1f} M rec/s)", flush=True)
