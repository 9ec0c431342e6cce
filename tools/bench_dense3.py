"""Isolate raw kernel vs wrapper cost at the dense shape (dev tool)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gme_tpu.config import MSE
from gme_tpu.ops import bbme as B
from gme_tpu.ops.pallas_kernels import (
    _dfd_cost_volume_planes,
    _dfd_cost_volume_rowoffset,
)

BATCH = 8
H, W = 180, 320
R, bs = 16, 2
D = 2 * R + 1


def bench(name, fn, shapes):
    @jax.jit
    def f(*args):
        out = fn(*args)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    def gen(i):
        k = jax.random.PRNGKey(100 + i)
        ks = jax.random.split(k, len(shapes))
        out = tuple(
            jax.random.randint(kk, s, 0, 256, jnp.int32).astype(jnp.float32)
            for kk, s in zip(ks, shapes)
        )
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    float(f(*gen(-1)))
    comp = time.perf_counter() - t0
    ts = []
    for i in range(3):
        args = gen(i)
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:34s} {dt*1e3:9.2f} ms/b{BATCH} {dt*1e3/BATCH:8.3f} ms/pair (c {comp:.0f}s)",
          flush=True)


vb = jax.vmap
pshape = ((BATCH, H, W), (BATCH, H + D - 1, W + D - 1))

bench("planes kernel raw",
      vb(lambda p, c: _dfd_cost_volume_planes(p, c, bs, D, MSE, 8, False)),
      pshape)
bench("rowoffset kernel raw",
      vb(lambda p, c: _dfd_cost_volume_rowoffset(p, c, bs, D, MSE, False)),
      pshape)
bench("compute_cost_volume (mask+T)",
      vb(lambda p, c: B.compute_cost_volume(p[: H, : W].astype(jnp.uint8),
                                            c[: H, : W].astype(jnp.uint8),
                                            bs, R, MSE)),
      ((BATCH, H, W), (BATCH, H, W)))
