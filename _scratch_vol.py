"""Scratch: column-pooling variants inside the real cost-volume kernel at
720p lvl2 shapes (bs=16, R=32). Timing + exactness vs the shipped kernel."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gme_tpu.ops.pallas_kernels import dfd_cost_volume, _pool_matrices, _round8

BATCH = 8
H, W, bs, R = 720, 1280, 16, 32
D = 2 * R + 1
Hc, Wc = (H // bs) * bs, (W // bs) * bs
nbh, nbw = Hc // bs, Wc // bs


def _exact_dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)


def make_kernel(variant, T):
    def kern(prev_ref, win_ref, out_ref, t_ref):
        sr, sc = _pool_matrices(T, nbw, bs)
        prev = prev_ref[...]
        rows = win_ref[0]
        for dc in range(D):
            diff = rows[:, dc : dc + Wc] - prev
            per_px = diff * diff
            t_ref[dc * T : (dc + 1) * T, :] = per_px.reshape(T, bs, Wc).sum(axis=1)
        t = t_ref[...]
        if variant == "highest":
            out_ref[0, 0] = _exact_dot(t, sc)
        elif variant == "default":
            out_ref[0, 0] = jnp.dot(t, sc, preferred_element_type=jnp.float32)
        elif variant == "hilo":
            scb = sc.astype(jnp.bfloat16)
            hi = jnp.floor(t * (1.0 / 4096.0))
            lo = t - hi * 4096.0
            # hi < 2**12? values < 2**24 -> hi < 4096, lo < 4096: bf16 exact
            # only to 256... NOT exact for 12-bit. split 8/8/8:
            out_ref[0, 0] = (
                jnp.dot(hi.astype(jnp.bfloat16), scb, preferred_element_type=jnp.float32) * 4096.0
                + jnp.dot(lo.astype(jnp.bfloat16), scb, preferred_element_type=jnp.float32)
            )
        elif variant == "strided":
            acc = t[:, 0::bs]
            for k in range(1, bs):
                acc = acc + t[:, k::bs]
            out_ref[0, 0] = acc
        elif variant == "cumsum":
            cs = jnp.cumsum(t, axis=-1)
            hi_idx = cs[:, bs - 1 :: bs]
            lo_idx = jnp.concatenate(
                [jnp.zeros((t.shape[0], 1), jnp.float32), cs[:, bs - 1 : -1 : bs]],
                axis=1,
            )
            out_ref[0, 0] = hi_idx - lo_idx
    return kern


def build(variant):
    T = 8
    nbh8 = _round8(nbh)
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs

    @jax.jit
    def f(prev_crop, curr_pad):
        prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
        curr_f = jnp.pad(curr_pad.astype(jnp.float32),
                         ((0, Hp + D - 1 - curr_pad.shape[0]), (0, 0)))
        windows = jnp.stack([curr_f[dr : dr + Hp] for dr in range(D)])
        out = pl.pallas_call(
            make_kernel(variant, T),
            grid=(num_tiles, D),
            in_specs=[
                pl.BlockSpec((T * bs, Wc), lambda rt, dr: (rt, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T * bs, Wc + D - 1), lambda rt, dr: (dr, rt, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, D * T, nbw), lambda rt, dr: (dr, rt, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, num_tiles, D * T, nbw), jnp.float32),
            scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        )(prev_p, windows)
        out = out.reshape(D, num_tiles, D, T, nbw).transpose(0, 2, 1, 3, 4)
        return out.reshape(D, D, nbhp, nbw)[:, :, :nbh, :]
    return f


@functools.partial(jax.jit, static_argnums=(1,))
def _gen(key, shape):
    a, b = jax.random.split(key)
    return (jax.random.randint(a, shape, 0, 256, jnp.uint8),
            jax.random.randint(b, shape, 0, 256, jnp.uint8))


def args_at(i):
    p, c = _gen(jax.random.PRNGKey(100 + i), (BATCH, Hc, Wc))
    cpad = jnp.pad(c.astype(jnp.float32), ((0, 0), (R, R), (R, R)))[:, : Hc + D - 1, : Wc + D - 1]
    out = (p, cpad)
    jax.block_until_ready(out)
    return out


ref_out = None
for variant in ("highest", "default", "strided", "cumsum", "hilo"):
    try:
        f = build(variant)
        vf = jax.jit(lambda p, c: jnp.sum(jax.vmap(f)(p, c)))
        t0 = time.perf_counter(); float(vf(*args_at(-1))); comp = time.perf_counter() - t0
        ts = []
        for i in range(3):
            a = args_at(i)
            t0 = time.perf_counter(); float(vf(*a)); ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # exactness on one small sample
        p, c = args_at(0)
        got = np.asarray(jax.vmap(f)(p[:1], c[:1]))
        if ref_out is None:
            ref_out = got
        print(f"{variant:8s} {dt*1e3:8.2f} ms/b{BATCH} {dt*1e3/BATCH:7.3f} ms/pair  exact={np.array_equal(got, ref_out)} (c {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{variant:8s} FAILED: {str(e)[:200]}", flush=True)
