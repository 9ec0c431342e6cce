"""Scratch microbench (not committed): split dense-init / chase / warp costs
at 720p shapes and measure candidate optimizations on the real chip."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from gme_tpu.ops import bbme as B
from gme_tpu.ops.pallas_kernels import dfd_cost_volume
from gme_tpu.ops import affine as A
from gme_tpu.ops.warp import compensate_frame

BATCH = 8
TRIALS = 3

def bench(name, fn, make_args):
    @jax.jit
    def f_sum(*args):
        out = fn(*args)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0.0)),
            out, jnp.float32(0))
    t0 = time.perf_counter(); float(f_sum(*make_args(-1))); comp = time.perf_counter() - t0
    ts = []
    for i in range(TRIALS):
        args = make_args(i)
        t0 = time.perf_counter(); float(f_sum(*args)); ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:48s} {dt*1e3:9.2f} ms/b{BATCH} {dt*1e3/BATCH:8.3f} ms/pair (c {comp:.0f}s)", flush=True)

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

# ---- 4. warp alternatives at 720p ----
H2, W2 = 720, 1280
def make_warp_args(i):
    f, _ = _gen(jax.random.PRNGKey(i + 3), (BATCH, H2, W2))
    key = jax.random.PRNGKey(i + 5)
    mf = jax.random.randint(key, (BATCH, H2 // 16, W2 // 16, 2), -20, 20, jnp.int32)
    out = (f, mf)
    jax.block_until_ready(out)
    return out

bench("warp: current element gather", vb(compensate_frame), make_warp_args)

def warp_dynslice(frame, mf):
    H, W = frame.shape
    nbh, nbw = mf.shape[:2]
    bs = H // nbh
    org = B._block_origins(nbh, nbw, bs)
    src = jnp.stack([org[..., 0] - mf[..., 1], org[..., 1] - mf[..., 0]], -1)
    srcc = jnp.stack([jnp.clip(src[..., 0], 0, H - bs), jnp.clip(src[..., 1], 0, W - bs)], -1)
    flat = srcc.reshape(-1, 2)
    blocks = jax.vmap(lambda p: lax.dynamic_slice(frame, (p[0], p[1]), (bs, bs)))(flat)
    blocks = blocks.reshape(nbh, nbw, bs, bs).transpose(0, 2, 1, 3).reshape(nbh * bs, nbw * bs)
    # per-pixel validity for reference OOB semantics
    d_px = jnp.repeat(jnp.repeat(mf, bs, axis=0), bs, axis=1)
    rr = jnp.arange(nbh * bs, dtype=jnp.int32)[:, None]
    cc = jnp.arange(nbw * bs, dtype=jnp.int32)[None, :]
    sr = rr - d_px[..., 1]; sc = cc - d_px[..., 0]
    valid = (sr >= 0) & (sc >= 0) & (sr < H) & (sc < W)
    return jnp.where(valid, blocks, frame[:nbh * bs, :nbw * bs])

bench("warp: vmapped dynamic_slice blocks", vb(warp_dynslice), make_warp_args)

def warp_onehot(frame, mf):
    H, W = frame.shape
    nbh, nbw = mf.shape[:2]
    bs = H // nbh
    f32 = frame.astype(jnp.float32)
    # row gather via one-hot matmul per block-row band:
    # out[band bi] rows = frame[16bi + i - dy(bi, bc(c)), c - dx(...)]
    # step 1: for each band, build (bs, H) one-hot? dy varies per bc -> no.
    # instead per block: two-sided one-hot einsum, batched over nbw as lanes.
    # row one-hot: Rh[bi, bc, i, u] too big. Use column-major scan over bc.
    dy = mf[..., 1]; dx = mf[..., 0]  # (nbh, nbw)
    rows_i = jnp.arange(H, dtype=jnp.int32)
    def per_bc(bc):
        # (H,) source row index for this block column
        dyc = jnp.repeat(dy[:, bc], bs)  # (H,)
        src_r = jnp.clip(rows_i - dyc, 0, H - 1)
        rows_g = f32[src_r, :]          # row gather: (H, W)
        # column one-hot per band: (nbh, W, bs)
        cols_j = jnp.arange(bs, dtype=jnp.int32)
        tgt = bc * bs + cols_j[None, :] - dx[:, bc][:, None]  # (nbh, bs)
        tgtc = jnp.clip(tgt, 0, W - 1)
        oh = (tgtc[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :, None]).astype(jnp.float32)
        bands = rows_g.reshape(nbh, bs, W)
        out = jnp.einsum("niw,nwj->nij", bands, oh,
                         precision=lax.Precision.DEFAULT,
                         preferred_element_type=jnp.float32)
        return out  # (nbh, bs, bs)
    outs = jax.vmap(per_bc)(jnp.arange(nbw))  # (nbw, nbh, bs, bs)
    blocks = outs.transpose(1, 2, 0, 3).reshape(nbh * bs, nbw * bs)
    d_px = jnp.repeat(jnp.repeat(mf, bs, axis=0), bs, axis=1)
    rr = jnp.arange(nbh * bs, dtype=jnp.int32)[:, None]
    cc = jnp.arange(nbw * bs, dtype=jnp.int32)[None, :]
    sr = rr - d_px[..., 1]; sc = cc - d_px[..., 0]
    valid = (sr >= 0) & (sc >= 0) & (sr < H) & (sc < W)
    return jnp.where(valid, blocks.astype(frame.dtype), frame[:nbh * bs, :nbw * bs])

bench("warp: rowgather+onehot-matmul", vb(warp_onehot), make_warp_args)

# correctness spot-check of alternatives vs current
f, mf = make_warp_args(0)
ref = np.asarray(vb(compensate_frame)(f, mf))
for name, fn in (("dynslice", warp_dynslice), ("onehot", warp_onehot)):
    got = np.asarray(vb(fn)(f, mf))
    print(name, "match:", np.array_equal(ref, got))
