"""Spatial (row-band) parallelism with halo exchange — the framework's
sequence-parallel analogue.

A frame's rows shard over the mesh "space" axis.  Block matching near a
shard edge needs up to `search_window + block_size` rows of the *current*
frame from the neighbouring shards; those halos travel by `lax.ppermute`
over ICI (reference analogue: none — the reference is single-threaded; the
design point comes from BASELINE.json:5 "block shards exchange search-window
halos via collective permutes").

The affine fit's normal equations reduce with `lax.psum` over the same axis,
so every device (and hence every host) holds identical parameters by
construction — the moral equivalent of a DP gradient all-reduce.

The spatially-sharded configuration uses the exhaustive cost-volume search:
at scale the regular, fusable cost volume is the right TPU algorithm (pure
VPU work, no data-dependent wandering), while the diamond path remains the
single-device reference-parity mode.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gme_tpu.config import GMEConfig, MAE
from gme_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

_INF = jnp.float32(jnp.inf)


def _halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concatenate `halo` rows from the up/down neighbours around `x`.

    Edge shards receive zeros (ppermute semantics) — harmless because
    candidates beyond the global frame are masked invalid.
    """
    size = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(size - 1)]  # my bottom rows -> next shard
    up = [(i + 1, i) for i in range(size - 1)]  # my top rows -> previous shard
    top_halo = lax.ppermute(x[-halo:], axis_name, down)
    bot_halo = lax.ppermute(x[:halo], axis_name, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def _local_exhaustive_field(
    prev_loc: jnp.ndarray,
    curr_ext: jnp.ndarray,
    row0: jnp.ndarray,
    H: int,
    W: int,
    bs: int,
    sw: int,
    pnorm: int,
    halo: int,
) -> jnp.ndarray:
    """Exhaustive cost-volume search for the local row band.

    Args:
        prev_loc: (lh, W) local band of the previous frame.
        curr_ext: (lh + 2*halo, W) current frame band extended with halos.
        row0: global row index of local row 0 (traced scalar).

    Returns:
        (lh//bs, W//bs, 2) int32 local motion field (reference channel
        conventions).
    """
    lh = prev_loc.shape[0]
    lnbh, nbw = lh // bs, W // bs
    D = 2 * sw + bs
    Pcol = sw + bs

    prev_f = prev_loc[:, : nbw * bs].astype(jnp.float32)
    curr_pad = jnp.pad(curr_ext.astype(jnp.float32), ((0, 0), (Pcol, Pcol)))

    offsets = jnp.arange(-sw, sw + bs, dtype=jnp.int32)

    grow = row0 + jnp.arange(lnbh, dtype=jnp.int32) * bs  # global block rows
    col0 = jnp.arange(nbw, dtype=jnp.int32) * bs
    valid_r = (grow[None, :] + offsets[:, None] >= 0) & (
        grow[None, :] + offsets[:, None] + bs - 1 <= H - 1
    )  # (D, lnbh)
    valid_c = (col0[None, :] + offsets[:, None] >= 0) & (
        col0[None, :] + offsets[:, None] + bs - 1 <= W - 1
    )  # (D, nbw)

    def cost_col(wc_idx):
        wc = offsets[wc_idx]

        def cost_row(wr_idx):
            wr = offsets[wr_idx]
            win = lax.dynamic_slice(
                curr_pad, (halo + wr, Pcol + wc), (lnbh * bs, nbw * bs)
            )
            diff = win - prev_f
            per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
            return per_px.reshape(lnbh, bs, nbw, bs).sum(axis=(1, 3))

        return jax.vmap(cost_row)(jnp.arange(D))

    cost = lax.map(cost_col, jnp.arange(D))  # (D_wc, D_wr, lnbh, nbw)
    mask = valid_r[None, :, :, None] & valid_c[:, None, None, :]
    cost = jnp.where(mask, cost, _INF)

    flat = cost.reshape(D * D, lnbh, nbw)
    k = jnp.argmin(flat, axis=0)
    dy = offsets[k // D]
    dx = offsets[k % D]
    return jnp.stack([dy, dx], axis=-1).astype(jnp.int32)


def _fit_psum(
    mf_loc: jnp.ndarray,
    inlier_loc: jnp.ndarray,
    cell_row0: jnp.ndarray,
    frame_shape,
    coord_stride: int,
    axis_name: str,
) -> jnp.ndarray:
    """Normal-equation fit where each shard contributes partial sums and the
    3x3 system is psum'd over `axis_name` — every shard solves the identical
    system (reference math: motion.py:52-84; distribution: BASELINE.json:5)."""
    lnbh, nbw = mf_loc.shape[:2]
    H, W = frame_shape
    w = jnp.float32(1.0 / (H * W))

    gi = (cell_row0 + jnp.arange(lnbh, dtype=jnp.int32))[:, None]
    xs = jnp.broadcast_to(gi.astype(jnp.float32) * coord_stride, (lnbh, nbw))
    ys = jnp.broadcast_to(
        (jnp.arange(nbw, dtype=jnp.float32) * coord_stride)[None, :], (lnbh, nbw)
    )
    mw = inlier_loc.astype(jnp.float32) * w

    moments = jnp.stack([jnp.sum(mw), jnp.sum(xs * mw), jnp.sum(ys * mw)])
    moments = lax.psum(moments, axis_name)
    wsum, xbar, ybar = moments[0], moments[1] / moments[0], moments[2] / moments[0]
    del wsum

    xc = xs - xbar
    yc = ys - ybar
    A = jnp.stack([jnp.ones_like(xc), xc, yc], axis=-1)
    hi = lax.Precision.HIGHEST
    G = jnp.einsum("ija,ijb,ij->ab", A, A, mw, precision=hi)
    d = mf_loc.astype(jnp.float32)
    b = jnp.einsum("ija,ijc,ij->ac", A, d, mw, precision=hi)
    Gb = lax.psum(jnp.concatenate([G, b], axis=1), axis_name)  # one collective
    G, b = Gb[:, :3], Gb[:, 3:]

    sol = jnp.linalg.solve(G, b)
    a0 = sol[0, 0] - sol[1, 0] * xbar - sol[2, 0] * ybar
    b0 = sol[0, 1] - sol[1, 1] * xbar - sol[2, 1] * ybar
    return jnp.stack([a0, sol[1, 0], sol[2, 0], b0, sol[1, 1], sol[2, 1]]).astype(
        jnp.float32
    )


def make_spatial_pipeline(mesh: Mesh, cfg: GMEConfig, H: int, W: int, batch: int):
    """Build the fully-sharded training step: pairs over "data", rows over
    "space"; BBME halo exchange + psum'd affine fit + all-gathered warp.

    Single-level spatially-sharded GME (the hierarchy's finest level — where
    ~84% of the reference FLOPs live); the coarse init runs on the
    data-parallel path.

    Returns a jitted step: (prev (B,H,W) u8, curr (B,H,W) u8) ->
    {parameters (B,6), compensated (B,H,W), psnr (B,)}.
    """
    space = mesh.shape[SPACE_AXIS]
    bs = cfg.block_size
    sw = 2  # reference default search window (bbme.py:16)
    halo = sw + bs
    if H % (space * bs):
        raise ValueError(f"H={H} must divide by space*block = {space * bs}")
    lh = H // space

    def pair_step(prev_loc, curr_loc):
        idx = lax.axis_index(SPACE_AXIS)
        row0 = idx * lh

        curr_ext = _halo_exchange_rows(curr_loc, halo, SPACE_AXIS)
        mf_loc = _local_exhaustive_field(
            prev_loc, curr_ext, row0, H, W, bs, sw, cfg.pnorm_distance, halo
        )

        inliers = jnp.ones(mf_loc.shape[:2], dtype=bool)
        params = _fit_psum(
            mf_loc, inliers, row0 // bs, (H, W), cfg.coord_stride, SPACE_AXIS
        )

        #

        # Dense per-pixel displacement straight from the affine model (cells
        # may straddle shard edges, so evaluate per pixel instead of
        # repeating a per-cell field).
        nbh_total, nbw_total = H // bs, W // bs
        rr = row0 + jnp.arange(lh, dtype=jnp.int32)[:, None]
        cc = jnp.arange(W, dtype=jnp.int32)[None, :]
        ci = (rr // bs).astype(jnp.float32)
        cj = (cc // bs).astype(jnp.float32)
        dx = jnp.round(params[0] + params[1] * ci + params[2] * cj).astype(jnp.int32)
        dy = jnp.round(params[3] + params[4] * ci + params[5] * cj).astype(jnp.int32)
        covered = (rr < nbh_total * bs) & (cc < nbw_total * bs)

        prev_full = lax.all_gather(prev_loc, SPACE_AXIS, axis=0, tiled=True)
        src_r = rr - dy
        src_c = cc - dx
        valid = covered & (src_r >= 0) & (src_c >= 0) & (src_r < H) & (src_c < W)
        warped = prev_full[jnp.clip(src_r, 0, H - 1), jnp.clip(src_c, 0, W - 1)]
        comp_loc = jnp.where(valid, warped, prev_loc)

        diff = curr_loc.astype(jnp.float32) - comp_loc.astype(jnp.float32)
        sse = lax.psum(jnp.sum(diff * diff), SPACE_AXIS)
        mse = sse / (H * W)
        psnr_val = jnp.where(
            mse == 0, jnp.float32(-1.0), 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))
        )
        return params, comp_loc, psnr_val

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS, None)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS)),
    )
    def sharded(prev_b, curr_b):
        return jax.vmap(pair_step)(prev_b, curr_b)

    @jax.jit
    def step(prev_batch, curr_batch) -> Dict[str, jnp.ndarray]:
        params, comp, ps = sharded(prev_batch, curr_batch)
        return {"parameters": params, "compensated": comp, "psnr": ps}

    return step
