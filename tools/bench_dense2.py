"""Decompose the dense bs=2 init cost (dev tool)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gme_tpu.config import GMEConfig, MSE
from gme_tpu.ops import bbme as B

cfg = GMEConfig()
BATCH = 8
H, W = 180, 320
R = cfg.dense_volume_radius  # 16 -> D=33
bs = 2


def bench(name, fn):
    @jax.jit
    def f(p, c):
        out = fn(p, c)
        return jnp.sum(jnp.where(jnp.isfinite(out.astype(jnp.float32)),
                                 out.astype(jnp.float32), 0.0))

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
    comp = time.perf_counter() - t0
    ts = []
    for i in range(3):
        args = gen(i)
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:30s} {dt*1e3:9.2f} ms/b{BATCH} {dt*1e3/BATCH:8.3f} ms/pair (c {comp:.0f}s)",
          flush=True)


vb = jax.vmap

bench("volume only",
      vb(lambda p, c: B.compute_cost_volume(p, c, bs, R, MSE)))


def succ(p, c):
    nbh, nbw = H // bs, W // bs
    origins = B._block_origins(nbh, nbw, bs)
    vol = B.compute_cost_volume(p, c, bs, R, MSE)
    return B._succ_map(vol, origins, H, W, bs, R)


bench("volume + succ map", vb(succ))


def walk(p, c):
    nbh, nbw = H // bs, W // bs
    origins = B._block_origins(nbh, nbw, bs)
    vol = B.compute_cost_volume(p, c, bs, R, MSE)
    return B.diamond_walk_volume(vol, origins, H, W, bs, R, cfg.max_search_iters)


bench("volume + succ + chase", vb(walk))
bench("full diamond_search",
      vb(lambda p, c: B.diamond_search(p, c, MSE, bs, -1, cfg.max_search_iters,
                                       "volume", R)))
