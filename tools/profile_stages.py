"""Per-stage timing of the GME pipeline on the attached chip (dev tool).

Measurement methodology (two relay pitfalls, both measured on this box):

- the axon relay memoizes (executable, inputs) pairs, so every timed call
  uses DISTINCT input buffers and forces a host roundtrip
  (float(out.sum())) inside the timed region;
- `jax.block_until_ready` does NOT wait for execution on the relay (only a
  value fetch does), and the dispatch+fetch round trip costs a data-
  independent ~25-40 ms — additive on EVERY timed call.  A no-op program
  measures that floor per run, and each stage is reported raw AND
  floor-corrected ("- rt").  Without the correction a ~0.3 ms stage reads
  as ~35 ms (this skewed the round-4 per-stage numbers).

Reported: min over trials.
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
# usage: profile_stages.py [HxW] [batch]   (default 240x320 32)
_size = sys.argv[1] if len(sys.argv) > 1 else "240x320"
H, W = (int(t) for t in _size.split("x"))
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TRIALS = 3


_RT_FLOOR_S = [0.0]  # measured per run by _measure_rt_floor()


def bench(name, fn, make_args):
    """fn jitted; make_args(i) returns distinct args per trial.  fn + a
    finite-masked sum are fused into ONE jitted program returning a scalar:
    eager per-op dispatch over the device tunnel costs more than the stage
    itself, and a scalar is the only transfer."""

    @jax.jit
    def f_sum(*args):
        out = fn(*args)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(
                jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                          x.astype(jnp.float32), 0.0)
            ),
            out, jnp.float32(0),
        )

    t0 = time.perf_counter()
    float(f_sum(*make_args(-1)))
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(TRIALS):
        args = make_args(i)
        t0 = time.perf_counter()
        float(f_sum(*args))  # forces the roundtrip inside the timed region
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    corr = max(dt - _RT_FLOOR_S[0], 0.0)
    print(f"{name:42s} {dt*1e3:9.2f} ms/batch{BATCH}  {dt*1e3/BATCH:7.3f} ms/pair"
          f"  | - rt: {corr*1e3:8.2f} ms {corr*1e3/BATCH:7.3f} ms/pair"
          f"   (compile {compile_s:.0f}s)", flush=True)


def _measure_rt_floor():
    """Dispatch+fetch round-trip floor: a near-no-op program, same
    discipline (distinct inputs, scalar fetch)."""

    @jax.jit
    def f(x):
        return jnp.sum(x[:2, :2].astype(jnp.float32))

    ts = []
    for i in range(6):
        x = jax.block_until_ready(
            jax.random.randint(jax.random.PRNGKey(i), (64, 64), 0, 256,
                               jnp.uint8))
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    _RT_FLOOR_S[0] = min(ts[1:])  # ts[0] includes compile
    print(f"dispatch+fetch round-trip floor: {_RT_FLOOR_S[0]*1e3:.1f} ms "
          f"(subtracted in the '- rt' column)", flush=True)


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1,))
def _gen(key, shape):
    a, b = jax.random.split(key)
    mk = lambda k: jax.random.randint(k, shape, 0, 256, jnp.uint8)  # noqa: E731
    return mk(a), mk(b)


def frames_at(shape, i):
    # Generated ON DEVICE: host->device uploads would dominate over a slow
    # tunnel and pollute the stage timings.
    out = _gen(jax.random.PRNGKey(1000 + i), (BATCH,) + shape)
    jax.block_until_ready(out)
    return out


vb = jax.vmap

_measure_rt_floor()

bench(
    "pyramids(prev)+pyramids(curr)",
    lambda p, c: (vb(lambda x: get_pyramids(x, 3))(p), vb(lambda x: get_pyramids(x, 3))(c)),
    lambda i: frames_at((H, W), i),
)

bench(
    f"dense init ({H//4}x{W//4} bs2 diamond)",
    vb(lambda p, c: M.dense_motion_estimation(p, c, cfg)),
    lambda i: frames_at((H // 4, W // 4), i),
)

for lvl, shape in ((1, (H // 2, W // 2)), (2, (H, W))):
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

bench(
    "global_motion_estimation",
    vb(lambda p, c: M.global_motion_estimation(p, c, cfg)),
    lambda i: frames_at((H, W), i),
)


def tail(p, c, par):
    shape = (p.shape[0] // cfg.block_size, p.shape[1] // cfg.block_size)
    mf = A.get_motion_field_affine(shape, par)
    return compensate_frame(p, mf)


pv = jnp.asarray(rng.rand(BATCH, 6).astype(np.float32))
bench(
    "affine field + warp",
    vb(tail),
    lambda i: frames_at((H, W), i) + (pv + i,),
)

bench(
    "gme_pipeline_batch (full)",
    lambda p, c: M.gme_pipeline_batch(p, c, cfg),
    lambda i: frames_at((H, W), i),
)
