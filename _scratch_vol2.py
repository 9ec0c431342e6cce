"""Scratch: plane-split sub+FMA cost-volume kernel v2 — correctness vs the
shipped kernel + timing at lvl2 (bs16) and dense (bs2) 720p shapes."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gme_tpu.ops.pallas_kernels import dfd_cost_volume, _pool_matrices, _round8, _exact_dot
from gme_tpu.config import MAE, MSE

BATCH = 8


def _tree_sum(terms):
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def kernel_v2(a_ref, w_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw):
    Wc = nbw * bs
    _, sc = _pool_matrices(T, nbw, bs)
    a = a_ref[...]   # (bs, T, Wc)
    w = w_ref[0]     # (bs, T, Wc + D - 1)
    for dc in range(D):
        terms = []
        for i in range(bs):
            d = w[i, :, dc : dc + Wc] - a[i]
            terms.append(jnp.abs(d) if pnorm == MAE else d * d)
        t_ref[dc * T : (dc + 1) * T, :] = _tree_sum(terms)
    out_ref[0, 0] = _exact_dot(t_ref[...], sc)


def dfd_cost_volume_v2(prev_crop, curr_pad, bs, D, pnorm, T=None):
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    nbh8 = _round8(nbh)
    if T is None:
        T = 16 if nbh8 % 16 == 0 else 8
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs
    Wcp = Wc + D - 1
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    curr_f = jnp.pad(curr_pad.astype(jnp.float32),
                     ((0, Hp + D - 1 - curr_pad.shape[0]), (0, 0)))
    # plane splits (strided slices -> pure data movement in XLA)
    a_planes = jnp.stack([prev_p[i::bs] for i in range(bs)])  # (bs, nbhp, Wc)
    csplit = [curr_f[j::bs] for j in range(bs)]  # bs planes of >= nbhp rows
    wsplit = jnp.stack([
        jnp.stack([
            lax.slice_in_dim(csplit[(dr + i) % bs], (dr + i) // bs,
                             (dr + i) // bs + nbhp, axis=0)
            for i in range(bs)
        ])
        for dr in range(D)
    ])  # (D, bs, nbhp, Wcp)

    kern = functools.partial(kernel_v2, bs=bs, D=D, pnorm=pnorm, T=T, nbw=nbw)
    out = pl.pallas_call(
        kern,
        grid=(num_tiles, D),
        in_specs=[
            pl.BlockSpec((bs, T, Wc), lambda rt, dr: (0, rt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, T, Wcp), lambda rt, dr: (dr, 0, rt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D * T, nbw), lambda rt, dr: (dr, rt, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, num_tiles, D * T, nbw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * Wcp + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(a_planes[:, :, :Wc], wsplit)
    out = out.reshape(D, num_tiles, D, T, nbw).transpose(0, 2, 1, 3, 4)
    return out.reshape(D, D, nbhp, nbw)[:, :, :nbh, :]


@functools.partial(jax.jit, static_argnums=(1,))
def _gen(key, shape):
    a, b = jax.random.split(key)
    return (jax.random.randint(a, shape, 0, 256, jnp.uint8),
            jax.random.randint(b, shape, 0, 256, jnp.uint8))


def bench_pair(tag, H, W, bs, R, pnorm=MSE):
    D = 2 * R + 1
    Hc, Wc = (H // bs) * bs, (W // bs) * bs

    def mk(i):
        p, c = _gen(jax.random.PRNGKey(100 + i), (BATCH, Hc, Wc))
        cpad = jnp.pad(c.astype(jnp.float32), ((0, 0), (R, R), (R, R)))[:, : Hc + D - 1, : Wc + D - 1]
        out = (p.astype(jnp.float32), cpad)
        jax.block_until_ready(out)
        return out

    for name, fn in (("v1", lambda p, c: dfd_cost_volume(p, c, bs, D, pnorm)),
                     ("v2", lambda p, c: dfd_cost_volume_v2(p, c, bs, D, pnorm))):
        f = jax.jit(lambda p, c: jnp.sum(jax.vmap(fn)(p, c)))
        try:
            t0 = time.perf_counter(); float(f(*mk(-1))); comp = time.perf_counter() - t0
            ts = []
            for i in range(3):
                a = mk(i)
                t0 = time.perf_counter(); float(f(*a)); ts.append(time.perf_counter() - t0)
            print(f"{tag} {name} {min(ts)*1e3:8.2f} ms/b{BATCH} {min(ts)*1e3/BATCH:7.3f} ms/pair (c {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag} {name} FAILED {str(e)[:200]}", flush=True)

    # exactness
    p, c = mk(0)
    want = np.asarray(jax.vmap(lambda a, b: dfd_cost_volume(a, b, bs, D, pnorm))(p[:1], c[:1]))
    got = np.asarray(jax.vmap(lambda a, b: dfd_cost_volume_v2(a, b, bs, D, pnorm))(p[:1], c[:1]))
    print(f"{tag} exact: {np.array_equal(want, got)}", flush=True)


def bench_T(tag, H, W, bs, R, Ts, pnorm=MSE):
    D = 2 * R + 1
    Hc, Wc = (H // bs) * bs, (W // bs) * bs
    def mk(i):
        p, c = _gen(jax.random.PRNGKey(100 + i), (BATCH, Hc, Wc))
        cpad = jnp.pad(c.astype(jnp.float32), ((0, 0), (R, R), (R, R)))[:, : Hc + D - 1, : Wc + D - 1]
        out = (p.astype(jnp.float32), cpad)
        jax.block_until_ready(out)
        return out
    for T in Ts:
        f = jax.jit(lambda p, c, T=T: jnp.sum(jax.vmap(lambda a, b: dfd_cost_volume_v2(a, b, bs, D, pnorm, T=T))(p, c)))
        try:
            t0 = time.perf_counter(); float(f(*mk(-1))); comp = time.perf_counter() - t0
            ts = []
            for i in range(3):
                a = mk(i)
                t0 = time.perf_counter(); float(f(*a)); ts.append(time.perf_counter() - t0)
            print(f"{tag} T={T:3d} {min(ts)*1e3:8.2f} ms/b{BATCH} {min(ts)*1e3/BATCH:7.3f} ms/pair (c {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag} T={T} FAILED {str(e)[:160]}", flush=True)

bench_T("dense bs2 R16 ", 180, 320, 2, 16, (16, 48, 96))
bench_T("lvl1  bs16 R32", 360, 640, 16, 32, (8, 16, 24))
bench_T("lvl2  bs16 R32", 720, 1280, 16, 32, (8, 24))
