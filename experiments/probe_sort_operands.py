"""Round-2 probe: lax.sort cost vs operand count on v5e.

Finding (BENCH.md r2): a 1M-key sort costs ~30 ms whether it carries 0
or 5 payload operands — the sort is COMPARISON-DEPTH bound, not
bandwidth bound.  Consequences: (a) one fused multi-operand sort is the
cheapest full shuffle (vs argsort + gathers at ~8 ms/gather); (b) there
is no point packing payload fields to reduce operand count.

Measured (v5e, trimmed mean of 8): 1-op 31.5 / 2-op 30.3 / 4-op 30.7 /
6-op 30.0 ms.

Run: python experiments/probe_sort_operands.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 6084, N).astype(np.int32))
f = [jnp.asarray(rng.standard_normal(N).astype(np.float32)) for _ in range(5)]


def timeit(fn, *a, K=8):
    float(fn(*a, jnp.int32(0)))
    ts = []
    for k in range(K):
        t0 = time.perf_counter()
        float(fn(*a, jnp.int32(k + 1)))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return sum(ts[1:-1]) / (K - 2)


for nops in (1, 2, 4, 6):
    @jax.jit
    def srt(k, *rest):
        arrs, s = rest[:-1], rest[-1]
        r = jax.lax.sort([k + s] + list(arrs), num_keys=1)
        return sum(x.sum() for x in r[1:]) if len(r) > 1 else r[0].sum()

    print(f"sort {nops}-op: {timeit(srt, keys, *f[:nops-1])*1e3:.1f} ms")
