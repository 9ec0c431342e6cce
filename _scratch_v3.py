"""Scratch: v3 chunked cost-volume kernel — G row offsets per grid step.

Motivation (measured): the shipped kernel runs ONE row offset per grid step,
so lvl2 720p = 3120 grid steps x ~4.6us fixed overhead ~= 14.5 ms/pair against
a ~3 ms VPU floor; dense bs=2 = 1056 steps ~= 10.7 ms.  v3 processes G row
offsets per step from a (T*bs + G - 1)-row window (static in-kernel slices),
and for bs < 8 splits rows into bs planes so the row pool is plain adds
(no strided sublane reduction, no per-dc temp blowup).

Validates exactness vs dfd_cost_volume (interpret, CPU) then times on chip.
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gme_tpu.ops.pallas_kernels import (
    dfd_cost_volume, _pool_matrices, _round8, _exact_dot)
from gme_tpu.config import MAE, MSE

ON_CPU = "--cpu" in sys.argv
if ON_CPU:
    jax.config.update("jax_platforms", "cpu")


def _kernel_v3_big(prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw, G):
    """bs >= 8: per g, per dc: diff + row reshape-sum into t_ref, then one
    tall col-pool matmul per g."""
    Wc = nbw * bs
    _, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[...]
    win = win_ref[0, 0]  # (RG8, Wc + D - 1)
    for g in range(G):
        rows_g = win[g : g + T * bs, :]
        for dc in range(D):
            diff = rows_g[:, dc : dc + Wc] - prev
            per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
            t_ref[dc * T : (dc + 1) * T, :] = per_px.reshape(T, bs, Wc).sum(axis=1)
        out_ref[0, 0, g * D * T : (g + 1) * D * T, :] = _exact_dot(t_ref[...], sc)


def _kernel_v3_planes(prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw, G, PR8):
    """bs < 8: inputs pre-split into bs row planes; the row pool is a sum of
    bs plane diffs (full-tile aligned accesses only)."""
    Wc = nbw * bs
    _, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[...]        # (bs*T, Wc): plane p at rows [p*T, (p+1)*T)
    win = win_ref[0, 0]         # (bs*PR8, Wc + D - 1): plane u at [u*PR8, ...)
    for g in range(G):
        planes = []
        for p in range(bs):
            u = (g + p) % bs
            base = (g + p) // bs
            planes.append((win[u * PR8 + base : u * PR8 + base + T, :],
                           prev[p * T : (p + 1) * T, :]))
        for dc in range(D):
            acc = None
            for wp, pp in planes:
                diff = wp[:, dc : dc + Wc] - pp
                per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
                acc = per_px if acc is None else acc + per_px
            t_ref[dc * T : (dc + 1) * T, :] = acc
        out_ref[0, 0, g * D * T : (g + 1) * D * T, :] = _exact_dot(t_ref[...], sc)


@functools.partial(jax.jit, static_argnames=("bs", "D", "pnorm", "T", "G", "interpret"))
def dfd_cost_volume_v3(prev_crop, curr_pad, bs, D, pnorm=MSE, T=8, G=4, interpret=False):
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    assert curr_pad.shape == (Hc + D - 1, Wc + D - 1)
    nbh8 = _round8(nbh)
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs
    Dc = -(-D // G)
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    Wp = Wc + D - 1

    if bs >= 8:
        RG8 = _round8(T * bs + G - 1)
        need = (num_tiles - 1) * T * bs + (Dc - 1) * G + RG8
        curr_f = jnp.pad(curr_pad.astype(jnp.float32),
                         ((0, max(0, need - curr_pad.shape[0])), (0, 0)))
        wchunks = jnp.stack([
            jnp.stack([curr_f[rt * T * bs + c * G : rt * T * bs + c * G + RG8]
                       for rt in range(num_tiles)])
            for c in range(Dc)])  # (Dc, tiles, RG8, Wp)
        kern = functools.partial(_kernel_v3_big, bs=bs, D=D, pnorm=pnorm,
                                 T=T, nbw=nbw, G=G)
        win_spec = pl.BlockSpec((1, 1, RG8, Wp), lambda rt, c: (c, rt, 0, 0),
                                memory_space=pltpu.VMEM)
        prev_arr = prev_p.reshape(num_tiles, T * bs, Wc)
        prev_spec = pl.BlockSpec((1, T * bs, Wc), lambda rt, c: (rt, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        assert G % bs == 0
        PR8 = _round8(T + G // bs + 1)
        # plane u of curr: rows u, u+bs, ... ; chunk c tile rt needs plane rows
        # [rt*T + c*G//bs, + PR8)
        max_plane_rows = (num_tiles - 1) * T + (Dc - 1) * (G // bs) + PR8
        curr_f = jnp.pad(curr_pad.astype(jnp.float32),
                         ((0, max(0, max_plane_rows * bs + bs - curr_pad.shape[0])), (0, 0)))
        planes = [curr_f[u::bs] for u in range(bs)]  # each (>= max_plane_rows, Wp)
        wchunks = jnp.stack([
            jnp.stack([
                jnp.concatenate([
                    planes[u][rt * T + c * (G // bs) : rt * T + c * (G // bs) + PR8]
                    for u in range(bs)], axis=0)
                for rt in range(num_tiles)])
            for c in range(Dc)])  # (Dc, tiles, bs*PR8, Wp)
        kern = functools.partial(_kernel_v3_planes, bs=bs, D=D, pnorm=pnorm,
                                 T=T, nbw=nbw, G=G, PR8=PR8)
        win_spec = pl.BlockSpec((1, 1, bs * PR8, Wp), lambda rt, c: (c, rt, 0, 0),
                                memory_space=pltpu.VMEM)
        # prev planes: (tiles, bs*T, Wc), plane p at rows [p*T, (p+1)*T)
        prev_arr = (prev_p.reshape(num_tiles, T, bs, Wc)
                    .transpose(0, 2, 1, 3).reshape(num_tiles, bs * T, Wc))
        prev_spec = pl.BlockSpec((1, bs * T, Wc), lambda rt, c: (rt, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(num_tiles, Dc),
        in_specs=[prev_spec, win_spec],
        out_specs=pl.BlockSpec((1, 1, G * D * T, nbw),
                               lambda rt, c: (c, rt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Dc, num_tiles, G * D * T, nbw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * Wp + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(prev_arr, wchunks)
    # (Dc, tiles, G*D*T, nbw) -> (Dc, tiles, G, D, T, nbw) -> (dr, dc, rows)
    out = out.reshape(Dc, num_tiles, G, D, T, nbw).transpose(0, 2, 3, 1, 4, 5)
    return out.reshape(Dc * G, D, nbhp, nbw)[:D, :, :nbh, :]


def check(H, W, bs, R, T, G, pnorm=MSE):
    D = 2 * R + 1
    rng = np.random.RandomState(0)
    Hc, Wc = (H // bs) * bs, (W // bs) * bs
    prev = jnp.asarray(rng.randint(0, 256, (Hc, Wc)).astype(np.float32))
    curr = jnp.asarray(rng.randint(0, 256, (Hc + D - 1, Wc + D - 1)).astype(np.float32))
    want = np.asarray(dfd_cost_volume(prev, curr, bs, D, pnorm, interpret=ON_CPU))
    got = np.asarray(dfd_cost_volume_v3(prev, curr, bs, D, pnorm, T=T, G=G,
                                        interpret=ON_CPU))
    ok = np.array_equal(got, want)
    print(f"v3 {H}x{W} bs{bs} R{R} T{T} G{G} {'MAE' if pnorm==MAE else 'MSE'}: "
          f"exact={ok}", flush=True)
    return ok


if ON_CPU:
    # interpret-mode exactness on small shapes
    check(48, 64, 16, 4, T=8, G=4)
    check(48, 64, 16, 4, T=8, G=4, pnorm=MAE)
    check(40, 64, 2, 4, T=8, G=4)
    check(40, 64, 2, 4, T=16, G=8)
    check(52, 68, 4, 5, T=8, G=8)   # ragged, bs=4
    check(48, 64, 16, 4, T=16, G=8)
    sys.exit(0)

# on-chip: exactness at real shapes + timing
BATCH, TRIALS = 8, 3

def bench(name, fn, make_args):
    @jax.jit
    def f_sum(*args):
        return jnp.sum(fn(*args))
    t0 = time.perf_counter(); float(f_sum(*make_args(-1))); comp = time.perf_counter() - t0
    ts = []
    for i in range(TRIALS):
        args = make_args(i)
        t0 = time.perf_counter(); float(f_sum(*args)); ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:48s} {dt*1e3:9.2f} ms/b{BATCH} {dt*1e3/BATCH:8.3f} ms/pair (c {comp:.0f}s)", flush=True)

@functools.partial(jax.jit, static_argnums=(1, 2))
def _gen_vol_args(key, shape, D):
    a, b = jax.random.split(key)
    H, W = shape
    prev = jax.random.randint(a, (BATCH, H, W), 0, 256, jnp.int32).astype(jnp.float32)
    curr = jax.random.randint(b, (BATCH, H + D - 1, W + D - 1), 0, 256, jnp.int32).astype(jnp.float32)
    return prev, curr

def args_at(shape, D):
    def make(i):
        out = _gen_vol_args(jax.random.PRNGKey(1000 + i), shape, D)
        jax.block_until_ready(out)
        return out
    return make

vb = jax.vmap

# exactness on chip at real shapes (v5e)
check(720, 1280, 16, 32, T=8, G=4)
check(180, 320, 2, 16, T=16, G=8)

# lvl2 shapes
H2, W2, D2 = 720, 1280, 65
bench("lvl2 vol shipped", vb(lambda p, c: dfd_cost_volume(p, c, 16, D2, MSE)),
      args_at((H2, W2), D2))
for (t, g) in ((8, 4), (8, 8), (8, 16)):
    bench(f"lvl2 vol v3 T{t} G{g}",
          vb(lambda p, c, t=t, g=g: dfd_cost_volume_v3(p, c, 16, D2, MSE, T=t, G=g)),
          args_at((H2, W2), D2))

# dense shapes
H0, W0, D0 = 180, 320, 33
bench("dense vol shipped", vb(lambda p, c: dfd_cost_volume(p, c, 2, D0, MSE)),
      args_at((H0, W0), D0))
for (t, g) in ((8, 8), (16, 8), (24, 8), (16, 16)):
    bench(f"dense vol v3 T{t} G{g}",
          vb(lambda p, c, t=t, g=g: dfd_cost_volume_v3(p, c, 2, D0, MSE, T=t, G=g)),
          args_at((H0, W0), D0))

# lvl1 shapes (360x640, bs=16, R=32)
H1, W1 = 360, 640
bench("lvl1 vol shipped", vb(lambda p, c: dfd_cost_volume(p, c, 16, D2, MSE)),
      args_at((H1, W1), D2))
for (t, g) in ((8, 8),):
    bench(f"lvl1 vol v3 T{t} G{g}",
          vb(lambda p, c, t=t, g=g: dfd_cost_volume_v3(p, c, 16, D2, MSE, T=t, G=g)),
          args_at((H1, W1), D2))
