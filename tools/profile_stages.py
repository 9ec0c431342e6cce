"""Per-stage timing of the GME pipeline on the attached chip (dev tool).

Measurement methodology: the axon relay memoizes (executable, inputs) pairs,
so every timed call uses DISTINCT input buffers and forces a host roundtrip
(float(out.sum())) inside the timed region.  Reported: min over trials.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gme_tpu.config import GMEConfig
from gme_tpu.models import gme as M
from gme_tpu.ops import affine as A
from gme_tpu.ops import bbme as B
from gme_tpu.ops.pyramid import get_pyramids
from gme_tpu.ops.warp import compensate_frame

cfg = GMEConfig()
rng = np.random.RandomState(0)
BATCH = 32
TRIALS = 3


def bench(name, fn, make_args):
    """fn jitted; make_args(i) returns distinct args per trial."""
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*make_args(-1))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(TRIALS):
        args = jax.device_put(make_args(i))
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = f(*args)
        s = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                               x.astype(jnp.float32), 0.0)),
            out, jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
        del s
    dt = min(ts)
    print(f"{name:42s} {dt*1e3:9.2f} ms/batch{BATCH}  {dt*1e3/BATCH:7.3f} ms/pair"
          f"   (compile {compile_s:.0f}s)")
    return out


def frames_at(shape, i):
    r = np.random.RandomState(1000 + i)
    return (
        jnp.asarray(r.randint(0, 256, (BATCH,) + shape, np.uint8)),
        jnp.asarray(r.randint(0, 256, (BATCH,) + shape, np.uint8)),
    )


vb = jax.vmap

bench(
    "pyramids(prev)+pyramids(curr)",
    lambda p, c: (vb(lambda x: get_pyramids(x, 3))(p), vb(lambda x: get_pyramids(x, 3))(c)),
    lambda i: frames_at((240, 320), i),
)

bench(
    "dense init (60x80 bs2 diamond)",
    vb(lambda p, c: M.dense_motion_estimation(p, c, cfg)),
    lambda i: frames_at((60, 80), i),
)

for lvl, shape in ((1, (120, 160)), (2, (240, 320))):
    bench(
        f"cost_volume lvl{lvl} R=32 bs16",
        vb(lambda p, c: B.compute_cost_volume(p, c, 16, 32, cfg.pnorm_distance)),
        lambda i, shape=shape: frames_at(shape, i),
    )
    bench(
        f"diamond bs16 lvl{lvl} (vol+walk)",
        vb(lambda p, c: B.diamond_search(p, c, cfg.pnorm_distance, 16, -1, 4096, "volume", 32)),
        lambda i, shape=shape: frames_at(shape, i),
    )

params = bench(
    "global_motion_estimation",
    vb(lambda p, c: M.global_motion_estimation(p, c, cfg)),
    lambda i: frames_at((240, 320), i),
)


def tail(p, c, par):
    shape = (p.shape[0] // cfg.block_size, p.shape[1] // cfg.block_size)
    mf = A.get_motion_field_affine(shape, par)
    return compensate_frame(p, mf)


pv = jnp.asarray(rng.rand(BATCH, 6).astype(np.float32))
bench(
    "affine field + warp",
    vb(tail),
    lambda i: frames_at((240, 320), i) + (pv + i,),
)

bench(
    "gme_pipeline_batch (full)",
    lambda p, c: M.gme_pipeline_batch(p, c, cfg),
    lambda i: frames_at((240, 320), i),
)
