"""Scratch: on-chip succ-map kernel — exactness vs XLA builder + timing."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from gme_tpu.ops import bbme as B
from gme_tpu.models import gme as M
from gme_tpu.config import GMEConfig

BATCH, TRIALS = 8, 3
cfg = GMEConfig()

def bench(name, fn, make_args):
    @jax.jit
    def f_sum(*args):
        out = fn(*args)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0.0)),
            out, jnp.float32(0))
    t0 = time.perf_counter(); float(f_sum(*make_args(-1))); c = time.perf_counter() - t0
    ts = []
    for i in range(TRIALS):
        a = make_args(i)
        t0 = time.perf_counter(); float(f_sum(*a)); ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms/b{BATCH} {min(ts)*1e3/BATCH:8.3f} ms/pair (c {c:.0f}s)", flush=True)

@functools.partial(jax.jit, static_argnums=(1,))
def _gen(key, shape):
    a, b = jax.random.split(key)
    return (jax.random.randint(a, shape, 0, 256, jnp.uint8),
            jax.random.randint(b, shape, 0, 256, jnp.uint8))

def frames_at(shape, i):
    out = _gen(jax.random.PRNGKey(1000 + i), (BATCH,) + shape)
    jax.block_until_ready(out)
    return out

vb = jax.vmap

# on-chip exactness: packed vs select succ map
for (H, W, bs, R) in ((180, 320, 2, 16), (720, 1280, 16, 32)):
    p, c = _gen(jax.random.PRNGKey(0), (1, H, W))
    p, c = p[0], c[0]
    vol = B.compute_cost_volume(p, c, bs, R, 1)
    org = B._block_origins(H // bs, W // bs, bs)
    want = np.asarray(jax.jit(B._succ_map_select, static_argnums=(2, 3, 4, 5))(vol, org, H, W, bs, R))
    got = np.asarray(jax.jit(B._succ_map_packed, static_argnums=(2, 3, 4, 5))(vol, org, H, W, bs, R))
    print(f"succ {H}x{W} bs{bs} R{R} packed==select: {np.array_equal(got, want)}", flush=True)

bench("dense init (pallas succ)", vb(lambda p, c: M.dense_motion_estimation(p, c, cfg)),
      lambda i: frames_at((180, 320), i))
bench("diamond bs16 lvl2 (pallas succ)",
      vb(lambda p, c: B.diamond_search(p, c, 1, 16, -1, 4096, "volume", 32)),
      lambda i: frames_at((720, 1280), i))
bench("gme_pipeline_batch 720p (full)",
      lambda p, c: M.gme_pipeline_batch(p, c, cfg),
      lambda i: frames_at((720, 1280), i))
