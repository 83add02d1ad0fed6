"""Dispatch-floor-corrected costs of the core data-movement primitives."""
import time, sys
import numpy as np, jax, jax.numpy as jnp

N = 1 << 20
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
val = jnp.asarray(rng.standard_normal(N).astype(np.float32))
tbl = jnp.asarray(rng.standard_normal(N).astype(np.float32))

def chained(body, K=8):
    @jax.jit
    def f(salt):
        def it(i, acc):
            return acc + body(salt + i.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
    return f, K

def bench(name, body, K=8):
    f, K = chained(body, K)
    s = float(f(jnp.float32(0.0)))
    ts = []
    for k in range(5):
        t0 = time.perf_counter()
        s = float(f(jnp.float32(1e-3 * (k + 1))))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] / K
    print(f"{name:28s} {t*1e3:8.2f} ms/step ({N/t/1e6:7.1f} M elem/s)", flush=True)

# salt the index stream: rotate indices by a data-dependent amount
def salted_idx(salt):
    return (idx + salt.astype(jnp.int32)) % N

bench("gather 1M from 1M table", lambda s: jnp.sum(tbl[salted_idx(s)]))
bench("gather 1M from 4K table", lambda s: jnp.sum(tbl[:4096][salted_idx(s) % 4096]))
bench("scatter-add 1M -> 1M",
      lambda s: jnp.sum(jnp.zeros_like(tbl).at[salted_idx(s)].add(val + s)))
bench("scatter-set 1M -> 1M",
      lambda s: jnp.sum(jnp.zeros_like(tbl).at[salted_idx(s)].set(val + s)))
bench("sort6 1M",
      lambda s: sum(jnp.sum(o) for o in jax.lax.sort(
          [salted_idx(s), val, val * 2, val * 3, val * 4, val * 5],
          num_keys=1)[1:]))
bench("sort2 1M (key + order)",
      lambda s: sum(jnp.sum(o) for o in jax.lax.sort(
          [salted_idx(s), val + s], num_keys=1)[1:]))
bench("cumsum 1M", lambda s: jnp.sum(jnp.cumsum(val + s)))
bench("searchsorted 4K in 1M", lambda s: jnp.sum(
    jnp.searchsorted(jnp.sort(val + s), jnp.linspace(-3, 3, 4096))))
