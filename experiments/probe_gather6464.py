"""Minimal probe: is a dynamic first-dim gather from a (nant, 64, 64)
VMEM ref the source of the IDG-AW kernel's UNIMPLEMENTED error?

Variants: (a) (8,64,64) gather, (b) (8,64,128) gather, (c) no gather.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern_gather(i_ref, tab_ref, out_ref, *, W):
    i = i_ref[0]
    out_ref[:] = tab_ref[i] * 2.0


def kern_nogather(i_ref, tab_ref, out_ref, *, W):
    out_ref[:] = tab_ref[3] * 2.0


def run(name, kern, W):
    tab = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64, W)),
                      jnp.float32)
    idx = jnp.asarray([5], jnp.int32)
    try:
        out = pl.pallas_call(
            functools.partial(kern, W=W),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((64, W), jnp.float32),
        )(idx, tab)
        got = np.asarray(out)
        want = np.asarray(tab)[5 if kern is kern_gather else 3] * 2.0
        print(name, "OK", float(np.abs(got - want).max()), flush=True)
    except Exception as e:
        print(name, "FAIL", type(e).__name__, str(e)[:300], flush=True)


print("devices:", jax.devices(), flush=True)
run("gather W=64 ", kern_gather, 64)
run("gather W=128", kern_gather, 128)
run("nogather W=64", kern_nogather, 64)
