"""Scratch: validate column-pooling strategies inside a Pallas kernel.

Candidates for pooling (T, Wc) f32 -> (T, nbw) by summing groups of bs lanes:
  a) lane reshape-sum: x.reshape(T, nbw, bs).sum(-1)
  b) hi/lo split bf16 matmuls against the 0/1 pooling matrix
  c) HIGHEST-precision f32 matmul (current)
Checks exactness (integer sums < 2**24) and speed at lvl2-like shapes.
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, Wc, bs = 520, 1280, 16   # (D*T, Wc) pooled to (M, nbw)
nbw = Wc // bs
REPS = 200  # loop inside the kernel to expose compute cost


def _pool_mat(Wc, nbw, bs):
    c_blk = lax.broadcasted_iota(jnp.int32, (Wc, nbw), 0) // bs
    c_id = lax.broadcasted_iota(jnp.int32, (Wc, nbw), 1)
    return (c_blk == c_id).astype(jnp.float32)


def k_reshape(x_ref, o_ref):
    acc = jnp.zeros((M, nbw), jnp.float32)
    for r in range(REPS):
        x = x_ref[...] + np.float32(r)
        acc = acc + x.reshape(M, nbw, bs).sum(-1)
    o_ref[...] = acc


def k_hilo(x_ref, o_ref):
    sc = _pool_mat(Wc, nbw, bs).astype(jnp.bfloat16)
    acc = jnp.zeros((M, nbw), jnp.float32)
    for r in range(REPS):
        x = x_ref[...] + np.float32(r)
        hi = jnp.floor(x * (1.0 / 256.0))
        lo = x - hi * 256.0
        s = jnp.dot(hi.astype(jnp.bfloat16), sc, preferred_element_type=jnp.float32) * 256.0
        s = s + jnp.dot(lo.astype(jnp.bfloat16), sc, preferred_element_type=jnp.float32)
        acc = acc + s
    o_ref[...] = acc


def k_highest(x_ref, o_ref):
    sc = _pool_mat(Wc, nbw, bs)
    acc = jnp.zeros((M, nbw), jnp.float32)
    for r in range(REPS):
        x = x_ref[...] + np.float32(r)
        acc = acc + jnp.dot(x, sc, preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
    o_ref[...] = acc


def run(kern, x):
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, nbw), jnp.float32),
    )
    g = jax.jit(lambda a: f(a).sum())
    t0 = time.perf_counter(); float(g(x)); c = time.perf_counter() - t0
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(g(x + i)); ts.append(time.perf_counter() - t0)
    return min(ts), c


rng = np.random.RandomState(0)
# worst-case integral values: diff^2 of uint8 -> up to 65025
xv = rng.randint(0, 65026, (M, Wc)).astype(np.float32)
x = jnp.asarray(xv)

# exactness check (single rep, direct math)
want = (xv.reshape(M, nbw, bs)).sum(-1)
for name, kern in (("reshape", k_reshape), ("hilo", k_hilo), ("highest", k_highest)):
    try:
        dt, c = run(kern, x)
        # one-rep exactness: run with REPS=1 via closure hack
        print(f"{name:8s} {dt*1e3:8.2f} ms for {REPS} reps (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# exactness with REPS=1
REPS = 1
for name, kern in (("reshape", k_reshape), ("hilo", k_hilo), ("highest", k_highest)):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, nbw), jnp.float32),
        )
        got = np.asarray(jax.jit(f)(x))
        print(name, "exact:", np.array_equal(got, want), flush=True)
    except Exception as e:
        print(name, "exactness FAILED:", str(e)[:200], flush=True)
