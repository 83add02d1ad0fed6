import os, sys, time
tier = sys.argv[1]
os.environ["SKA_SDP_TPU_AW_PRECISION"] = tier
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from ska_sdp_tpu.kernels.aw_fused_resident_pallas import convgrid_aw_resident
from ska_sdp_tpu.ops.gridding import convgrid_aw

NW, QPX, S, NANT = 32, 8, 15, 64
NG = 2400
Na = 1 << 19
rng = np.random.default_rng(0)
br = jnp.asarray(rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
bi = jnp.asarray(rng.standard_normal((NW, QPX, QPX, S, S)).astype(np.float32))
ar = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
ai = jnp.asarray(rng.standard_normal((NANT, S, S)).astype(np.float32))
p = jnp.asarray(rng.uniform(-0.42, 0.42, (Na, 3)).astype(np.float32))
wb = jnp.asarray(rng.integers(0, NW, Na).astype(np.int32))
a1 = jnp.asarray(rng.integers(0, NANT, Na).astype(np.int32))
a2 = jnp.asarray(rng.integers(0, NANT, Na).astype(np.int32))
vr = jnp.asarray(rng.standard_normal(Na).astype(np.float32))
vi = jnp.asarray(rng.standard_normal(Na).astype(np.float32))

# accuracy on-chip vs XLA oracle (small subset, small grid)
ns, hs = 3000, 512
@jax.jit
def acc():
    wk = jax.lax.complex(br, bi); ak = jax.lax.complex(ar, ai)
    vis = jax.lax.complex(vr[:ns], vi[:ns])
    ps = p[:ns] * (hs / NG / 0.42 * 0.42)  # keep within box for small grid
    got = convgrid_aw_resident(wk, ak, jnp.zeros((hs, hs), jnp.complex64),
                               ps, wb[:ns], a1[:ns], a2[:ns], vis)
    want = convgrid_aw(wk, ak, jnp.zeros((hs, hs), jnp.complex64),
                       ps, wb[:ns], a1[:ns], a2[:ns], vis, chunk=1024)
    d = got - want
    num = jnp.sqrt(jnp.sum(jnp.real(d)**2 + jnp.imag(d)**2))
    den = jnp.sqrt(jnp.sum(jnp.real(want)**2 + jnp.imag(want)**2))
    return num / den
print(f"{tier} accuracy (rel l2 vs XLA oracle): {float(acc()):.3e}", flush=True)

K = 6
@jax.jit
def chained(salt0):
    def body(i, accv):
        wk = jax.lax.complex(br, bi); ak = jax.lax.complex(ar, ai)
        vis = jax.lax.complex(vr, vi + salt0 + i.astype(jnp.float32)*1e-6)
        g = convgrid_aw_resident(wk, ak, jnp.zeros((NG, NG), jnp.complex64),
                                 p, wb, a1, a2, vis)
        return accv + jnp.sum(jnp.abs(jnp.real(g[::16, ::16])))
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
s = float(chained(jnp.float32(0.0)))
ts = []
for k in range(3):
    t0 = time.perf_counter()
    s = float(chained(jnp.float32(1e-3*(k+1))))
    ts.append(time.perf_counter()-t0)
t = sorted(ts)[1] / K
print(f"{tier}: {t*1e3:7.2f} ms/step ({Na/t/1e6:6.2f} M vis/s)", flush=True)
