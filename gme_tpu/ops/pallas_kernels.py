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
    prev_ref, win_ref, out_ref, t_ref, *, bs, D, pnorm, nbh8, nbw
):
    Wc = nbw * bs
    _, sc = _pool_matrices(nbh8, nbw, bs)
    prev = prev_ref[...]  # (nbh8*bs, Wc), zero-padded past the real rows
    rows = win_ref[0]  # (nbh8*bs, Wc + D - 1): the window for this row offset
    for dc in range(D):  # static unroll: lane slices at known offsets
        diff = rows[:, dc : dc + Wc] - prev
        per_px = jnp.abs(diff) if pnorm == MAE else diff * diff
        # Row pooling on the VPU: aligned sublane-split reshape + sum.
        # nbh8 is 8-aligned so every scratch store is a full aligned tile
        # (unaligned masked stores here cost ~20x in Mosaic compile time).
        t_ref[dc * nbh8 : (dc + 1) * nbh8, :] = per_px.reshape(
            nbh8, bs, Wc
        ).sum(axis=1)
    # Column pooling as ONE tall MXU matmul (M = D*nbh8 keeps the systolic
    # array fed; a per-dc (nbh, Wc) @ (Wc, nbw) dot would run at M/128
    # utilization).
    out_ref[0] = _exact_dot(t_ref[...], sc)


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
    # Pad the block-row count to a multiple of 8 with zero rows in BOTH
    # frames: the padded blocks produce exactly-zero pooled sums, dropped at
    # the end.  This keeps every kernel memory access tile-aligned.
    nbh8 = _round8(nbh)
    Hp = nbh8 * bs
    prev_p = jnp.pad(prev_crop.astype(jnp.float32), ((0, Hp - Hc), (0, 0)))
    curr_f = jnp.pad(
        curr_pad.astype(jnp.float32),
        ((0, Hp + D - 1 - curr_pad.shape[0]), (0, 0)),
    )
    # Row-offset windows, pre-sliced by XLA (static slices, one concat).
    windows = jnp.stack([curr_f[dr : dr + Hp] for dr in range(D)])

    kernel = functools.partial(
        _cost_volume_kernel, bs=bs, D=D, pnorm=pnorm, nbh8=nbh8, nbw=nbw
    )
    out = pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((Hp, Wc), lambda dr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, Hp, Wc + D - 1), lambda dr: (dr, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, D * nbh8, nbw), lambda dr: (dr, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, D * nbh8, nbw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D * nbh8, Wc), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * D * D * Hp * Wc,
            bytes_accessed=4 * (Hp * Wc + D * Hp * (Wc + D - 1) + D * D * nbh * nbw),
            transcendentals=0,
        ),
    )(prev_p, windows)
    # Drop the 8-alignment padding rows: (D, D*nbh8, nbw) -> (D, D, nbh, nbw).
    return out.reshape(D, D, nbh8, nbw)[:, :, :nbh, :]


def use_pallas() -> bool:
    """Pallas path only on real TPU backends (CPU tests use interpret mode
    explicitly where they want to exercise the kernel)."""
    return jax.default_backend() == "tpu"
