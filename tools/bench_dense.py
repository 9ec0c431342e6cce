"""Quick on-chip timing of the dense bs=2 init (dev tool)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gme_tpu.config import GMEConfig, MSE
from gme_tpu.models import gme as M
from gme_tpu.ops.pallas_kernels import dfd_cost_volume

cfg = GMEConfig()
BATCH = 8
H, W = 180, 320

# Exactness on chip: planes path (bs=2, D=33) vs XLA oracle.
rng = np.random.RandomState(0)
D = 33
prev = jnp.asarray(rng.randint(0, 256, (H, W)).astype(np.float32))
cpad = jnp.asarray(rng.randint(0, 256, (H + D - 1, W + D - 1)).astype(np.float32))
got = np.asarray(dfd_cost_volume(prev, cpad, 2, D, MSE))


def np_vol(prev, cpad, bs, D):
    Hc, Wc = prev.shape
    nbh, nbw = Hc // bs, Wc // bs
    out = np.zeros((D, D, nbh, nbw), np.float32)
    for i in range(D):
        for j in range(D):
            d = cpad[i : i + Hc, j : j + Wc] - prev
            out[i, j] = (d * d).reshape(nbh, bs, nbw, bs).sum(axis=(1, 3))
    return out


want = np_vol(np.asarray(prev), np.asarray(cpad), 2, D)
print("planes bs2 D33 on-chip exact:", np.array_equal(got, want), flush=True)


@jax.jit
def f(p, c):
    return jnp.sum(
        jax.vmap(lambda a, b: M.dense_motion_estimation(a, b, cfg))(p, c)
    )


def gen(i):
    k = jax.random.PRNGKey(100 + i)
    a, b = jax.random.split(k)
    out = (
        jax.random.randint(a, (BATCH, H, W), 0, 256, jnp.uint8),
        jax.random.randint(b, (BATCH, H, W), 0, 256, jnp.uint8),
    )
    jax.block_until_ready(out)
    return out


t0 = time.perf_counter()
float(f(*gen(-1)))
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
ts = []
for i in range(3):
    args = gen(i)
    t0 = time.perf_counter()
    float(f(*args))
    ts.append(time.perf_counter() - t0)
dt = min(ts)
print(f"dense init: {dt*1e3:.2f} ms/b{BATCH}  {dt*1e3/BATCH:.3f} ms/pair", flush=True)
