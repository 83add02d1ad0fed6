"""Microbench: pltpu.roll cost vs shape, traced shift, on TPU."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make(shape, nrolls, axis=1):
    def kern(s_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + pltpu.roll(x_ref[:], s_ref[i], axis)
        o_ref[:] = jax.lax.fori_loop(0, nrolls, body, jnp.zeros_like(x_ref))
    @jax.jit
    def run(s, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(s, x)
    return run

rng = np.random.default_rng(0)
NROLL = 20000
shifts = jnp.asarray(rng.integers(0, 128, size=NROLL).astype(np.int32))
for shape in [(8,128),(24,128),(24,256),(24,384),(96,384),(192,384),(24,512)]:
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = make(shape, NROLL)
    o = jax.block_until_ready(f(shifts, x))
    t0=time.perf_counter(); K=3
    for _ in range(K): o = jax.block_until_ready(f(shifts, x))
    dt=(time.perf_counter()-t0)/K/NROLL
    nv = (shape[0]+7)//8 * (shape[1]+127)//128
    print(f'{shape}: {dt*1e9:7.1f} ns/roll  ({nv} vregs, {dt*1e9/nv:.1f} ns/vreg)')
