"""Pallas TPU kernels for the BBME hot path.

The single hottest op in the whole framework is the DFD cost volume: for
every block of the previous frame, the block-distance (MAE/MSE of the block
difference, reference bbme.py:41-94) against the current frame at every
offset in a (D x D) window.  The XLA formulation in ``bbme.compute_cost_volume``
lowers to D*D serialized (H, W) slice+diff+reduce programs and measures ~34x
off VPU speed-of-light on a v5e.

Design notes (hardware constraints that shaped this kernel):

- Mosaic cannot vector-load VMEM at a dynamic sublane offset, and its
  dynamic sublane rotate miscompiles (measured off by one 8-row tile), so
  the row-offset windows are pre-sliced by XLA (static slices + one concat,
  pure data movement) and fed to the kernel through a pipelined BlockSpec —
  one grid step per row offset, with Pallas double-buffering the window DMA
  behind compute automatically.
- Column offsets are static lane slices, unrolled in the kernel body.
- The per-pixel |diff| / diff^2 runs on the VPU; the per-block box sums fold
  into two matmuls on the MXU against 0/1 pooling matrices built from iotas:

      cost[dr, dc] = Sr @ pnorm(window_dr[:, dc:dc+Wc] - prev) @ Sc

  with precision=HIGHEST: the MXU default truncates f32 operands to bf16,
  and per-pixel DFD terms need up to 16 mantissa bits; the 3xbf16
  decomposition keeps these integer sums (< 2**24) exact.

All DFD values are integer sums of uint8 differences over <=16x16 blocks,
exactly representable in float32, so this path is bit-identical to the
XLA/NumPy formulations (asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gme_tpu.config import MAE, MSE


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pool_matrices(nbh: int, nbw: int, bs: int):
    """0/1 block-pooling matrices Sr (nbh, Hc) and Sc (Wc, nbw), built from
    2D iotas (TPU requires >=2D iota)."""
    Hc, Wc = nbh * bs, nbw * bs
    r_blk = jax.lax.broadcasted_iota(jnp.int32, (nbh, Hc), 1) // bs
    r_id = jax.lax.broadcasted_iota(jnp.int32, (nbh, Hc), 0)
    sr = (r_blk == r_id).astype(jnp.float32)
    c_blk = jax.lax.broadcasted_iota(jnp.int32, (Wc, nbw), 0) // bs
    c_id = jax.lax.broadcasted_iota(jnp.int32, (Wc, nbw), 1)
    sc = (c_blk == c_id).astype(jnp.float32)
    return sr, sc


def _exact_dot(a, b):
    return jnp.dot(
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cost_volume_kernel(
    prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, T, nbw
):
    Wc = nbw * bs
    sr, sc = _pool_matrices(T, nbw, bs)
    prev = prev_ref[...]  # (T*bs, Wc), zero-padded past the real rows
    rows = win_ref[0]  # (T*bs, Wc + D - 1): this tile's window, this row offset
    for dc in range(D):  # static unroll: lane slices at known offsets
        diff = rows[:, dc : dc + Wc] - prev
        per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
        if bs < 8:
            # Sub-tile block edge: the strided (T, bs, Wc) sublane reduction
            # lowers to masked rotates whose stack temporaries Mosaic does
            # NOT reuse across the unrolled dc iterations (measured 36MB of
            # scoped vmem at 720p).  Pool rows on the MXU instead — one
            # (T, T*bs) 0/1 matrix, full-tile accesses only.
            t_ref[dc * T : (dc + 1) * T, :] = _exact_dot(sr, per_px)
        else:
            # Row pooling on the VPU: aligned sublane-split reshape + sum.
            # T is 8-aligned so every scratch store is a full aligned tile
            # (unaligned masked stores here cost ~20x in Mosaic compile time).
            t_ref[dc * T : (dc + 1) * T, :] = per_px.reshape(T, bs, Wc).sum(
                axis=1
            )
    # Column pooling as ONE tall MXU matmul (M = D*T keeps the systolic
    # array fed; a per-dc (T, Wc) @ (Wc, nbw) dot would run at T/128
    # utilization).
    out_ref[0, 0] = _exact_dot(t_ref[...], sc)


def _pick_tile_rows(nbh8: int, bs: int, Wc: int, D: int, nbw: int) -> int:
    """Largest 8-aligned block-row tile T whose VMEM footprint (double-
    buffered prev + window + out blocks, plus the (D*T, Wc) scratch) fits a
    conservative budget under the 16MB scoped-vmem limit.  Small frames get
    T = nbh8 (single tile — the original untiled kernel); 720p+ frames tile
    so the kernel fits at any resolution."""
    budget = 10 * 2**20  # bytes
    T = 8
    for cand in range(8, nbh8 + 8, 8):
        vmem = 4 * (
            2 * cand * bs * Wc  # prev block, double-buffered
            + 2 * cand * bs * (Wc + D - 1)  # window block
            + 2 * D * cand * nbw  # out block
            + D * cand * Wc  # scratch
        )
        if bs < 8:
            # Empirical Mosaic behaviour (measured on v5e): for sub-tile
            # block edges the per-dc temporaries (~3 buffers of (T*bs, Wc))
            # get distinct stack slots across the unrolled loop instead of
            # being reused, so they scale with D and must be budgeted.
            vmem += 4 * D * 3 * cand * bs * Wc
        if vmem <= budget:
            T = cand
        else:
            break
    return min(T, nbh8)


@functools.partial(
    jax.jit, static_argnames=("block_size", "n_offsets", "pnorm", "interpret")
)
def dfd_cost_volume(
    prev_crop: jnp.ndarray,
    curr_pad: jnp.ndarray,
    block_size: int,
    n_offsets: int,
    pnorm: int = MSE,
    interpret: bool = False,
) -> jnp.ndarray:
    """(D, D, nbh, nbw) DFD cost volume over a D x D offset window.

    Args:
        prev_crop: (Hc, Wc) float32, Hc/Wc multiples of block_size — the
            anchor frame cropped to whole blocks.
        curr_pad: (Hc + D - 1, Wc + D - 1) float32 — the current frame,
            padded/cropped by the caller so the window for offset index
            (i, j) is ``curr_pad[i:i+Hc, j:j+Wc]``.
        block_size: block edge (reference bbme.py:12-19 block_size).
        n_offsets: D, offsets per axis.
        pnorm: MAE (sum |diff|) or MSE (sum diff^2), reference bbme.py:67-94.

    Returns:
        (D, D, nbh, nbw) float32, entry [i, j] = DFD of every block at row
        offset i, column offset j (no validity masking — caller applies it).
    """
    if pnorm not in (MAE, MSE):
        raise ValueError(f"unknown pnorm index {pnorm}")
    bs, D = block_size, n_offsets
    Hc, Wc = prev_crop.shape
    nbh, nbw = Hc // bs, Wc // bs
    assert curr_pad.shape == (Hc + D - 1, Wc + D - 1), (
        curr_pad.shape,
        (Hc + D - 1, Wc + D - 1),
    )
    # Tile the block rows: T block rows per grid step, T chosen so the VMEM
    # working set fits the scoped limit at any frame size (720p+ included).
    # Padded blocks (zero rows in BOTH frames) produce exactly-zero pooled
    # sums, dropped at the end; every kernel memory access stays tile-aligned.
    nbh8 = _round8(nbh)
    T = _pick_tile_rows(nbh8, bs, Wc, D, nbw)
    num_tiles = -(-nbh8 // T)
    nbhp = num_tiles * T
    Hp = nbhp * bs
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    curr_f = jnp.pad(
        curr_pad.astype(jnp.float32),
        ((0, Hp + D - 1 - curr_pad.shape[0]), (0, 0)),
    )
    # Row-offset windows, pre-sliced by XLA (static slices, one concat);
    # windows[dr, rt*T*bs : (rt+1)*T*bs] is tile rt's window at row offset dr,
    # a block-aligned slice the BlockSpec below can address directly.
    windows = jnp.stack([curr_f[dr : dr + Hp] for dr in range(D)])

    kernel = functools.partial(
        _cost_volume_kernel, bs=bs, D=D, pnorm=pnorm, T=T, nbw=nbw
    )
    # Grid order (rt, dr): dr fastest, so the prev block (a function of rt
    # only) is DMA'd once per tile and reused across all D row offsets.
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles, D),
        in_specs=[
            pl.BlockSpec(
                (T * bs, Wc), lambda rt, dr: (rt, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, T * bs, Wc + D - 1),
                lambda rt, dr: (dr, rt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D * T, nbw),
            lambda rt, dr: (dr, rt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, num_tiles, D * T, nbw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * T, Wc), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * (Wc + D - 1) + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(prev_p, windows)
    # (D, num_tiles, D*T, nbw) -> (D, D, nbhp, nbw), drop alignment padding.
    out = out.reshape(D, num_tiles, D, T, nbw).transpose(0, 2, 1, 3, 4)
    return out.reshape(D, D, nbhp, nbw)[:, :, :nbh, :]


def use_pallas() -> bool:
    """Pallas path only on real TPU backends (CPU tests use interpret mode
    explicitly where they want to exercise the kernel)."""
    return jax.default_backend() == "tpu"

