"""Round-2 probe: honest random-access rates on v5e (salted indices).

Finding (BENCH.md r2): jnp gather and scatter run ~30M elem/s REGARDLESS
of table size or pattern — XLA lowers them element-serial on TPU.  A
1M-element gather is ~8 ms; a 1M scatter-set into 4M ~34 ms.  Unsalted
microbenches through the axon tunnel report ~0.1 ms (cached) — salt the
INDEX stream, not just the values.

Run: python experiments/probe_random_access.py    (on the TPU machine)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
n_pad = 4045056
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal(N).astype(np.float32))
slots = jnp.asarray(np.sort(rng.choice(n_pad, N, replace=False)).astype(np.int32))
src4 = jnp.asarray(rng.integers(0, N, n_pad).astype(np.int32))


def timeit(f, *a, K=5):
    float(f(*a, jnp.int32(0)))
    t0 = time.perf_counter()
    for k in range(K):
        float(f(*a, jnp.int32(k % 2)))       # salt shifts the INDICES
    return (time.perf_counter() - t0) / K


@jax.jit
def scatter_set(vals, slots, s):
    return jnp.zeros((n_pad,), jnp.float32).at[slots + s].set(
        vals, mode="drop").sum()


@jax.jit
def gather4(vals, src, s):
    return jnp.sum(vals[jnp.clip(src + s, 0, N - 1)])


@jax.jit
def gather1(vals, slots, s):
    return jnp.sum(vals[jnp.clip(slots + s, 0, N - 1) % N])


print(f"scatter-set 1M->4M (sorted unique): {timeit(scatter_set, vals, slots)*1e3:.1f} ms")
print(f"gather 4M from 1M (random):         {timeit(gather4, vals, src4)*1e3:.1f} ms")
print(f"gather 1M from 1M (sorted-ish):     {timeit(gather1, vals, slots)*1e3:.1f} ms")
