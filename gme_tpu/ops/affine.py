"""Affine global-motion model: dense field generation + weighted least-squares
fit with robust outlier rejection.

TPU-native re-design of reference motion.py:33-286.  The reference
accumulates 3x3/3x1 normal equations in a per-cell Python loop
(motion.py:55-64); here the whole fit is one masked einsum over the cell
grid followed by a 3x3 solve — and the einsum partials are exactly the
quantities that `psum` over a device mesh when the cell grid is sharded
(see gme_tpu.parallel).

Conventions preserved:
- parameters [a0, a1, a2, b0, b1, b2] with displacement
  d = [a0 + a1*x + a2*y, b0 + b1*x + b2*y] for cell (x=row, y=col)
  (reference motion.py:91-105);
- normal-equation cell coordinates use the hard-coded stride 4
  (x = i*4, y = j*4 — reference motion.py:57-58, 254-255 — despite block
  size 16; kept as `coord_stride` for output parity);
- outlier rule: per-cell L1 error between BBME field and affine field,
  threshold at the value `int(0.3*N)` positions from the end of the
  ascending sort, mask cells with error strictly greater
  (reference motion.py:236-244).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def affine_model(x, y, parameters: jnp.ndarray) -> jnp.ndarray:
    """Displacement of position (x, y) under the affine model.

    Mirrors reference motion.py:91-105 (A = [[1,x,y,0,0,0],[0,0,0,1,x,y]]).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    p = jnp.asarray(parameters, jnp.float32)
    d0 = p[0] + p[1] * x + p[2] * y
    d1 = p[3] + p[4] * x + p[5] * y
    return jnp.stack([d0, d1], axis=-1)


def get_motion_field_affine(
    shape: Tuple[int, int], parameters: jnp.ndarray
) -> jnp.ndarray:
    """Dense (shape[0], shape[1], 2) int16 motion field from affine params.

    Mirrors reference motion.py:139-157 — per-cell displacement rounded with
    round-half-to-even (Python round(); numpy/jnp.round match).
    """
    nbh, nbw = int(shape[0]), int(shape[1])
    xs = lax.broadcasted_iota(jnp.float32, (nbh, nbw), 0)
    ys = lax.broadcasted_iota(jnp.float32, (nbh, nbw), 1)
    d = affine_model(xs, ys, parameters)  # (nbh, nbw, 2)
    return jnp.round(d).astype(jnp.int16)


def compute_first_parameters(dense_motion_field: jnp.ndarray) -> jnp.ndarray:
    """Translation-only init: a0/b0 = mean shift (reference motion.py:176-188)."""
    a0 = jnp.mean(dense_motion_field[:, :, 0].astype(jnp.float32))
    b0 = jnp.mean(dense_motion_field[:, :, 1].astype(jnp.float32))
    z = jnp.float32(0)
    return jnp.stack([a0, z, z, b0, z, z])


def parameter_projection(parameters: jnp.ndarray) -> jnp.ndarray:
    """Project params one pyramid level finer: a0 *= 2, b0 *= 2
    (reference motion.py:191-207)."""
    scale = jnp.array([2.0, 1.0, 1.0, 2.0, 1.0, 1.0], dtype=jnp.float32)
    return parameters * scale


def fit_normal_equations(
    motion_field: jnp.ndarray,
    inlier_mask: jnp.ndarray,
    frame_shape: Tuple[int, int],
    coord_stride: int = 4,
) -> jnp.ndarray:
    """Weighted least-squares affine fit from a block motion field.

    Solves, per axis, (Σ w·AᵀA) a = (Σ w·Aᵀd) with A(cell) = [1, x, y],
    x = i*stride, y = j*stride, w = 1/(H·W), restricted to inlier cells —
    the einsum form of reference motion.py:52-84 / 248-282.

    Args:
        motion_field: (nbh, nbw, 2) int block motion field (channel 0 fits
            the first parameter triple, channel 1 the second — reference
            motion.py:62, 79).
        inlier_mask: (nbh, nbw) bool — True where the cell participates.
        frame_shape: (H, W) of the frame the field came from (for w).
        coord_stride: cell-coordinate stride (reference quirk: 4).

    Returns:
        (6,) float32 parameters [a0,a1,a2,b0,b1,b2].
    """
    nbh, nbw = motion_field.shape[:2]
    H, W = frame_shape
    w = jnp.float32(1.0 / (H * W))

    xs = lax.broadcasted_iota(jnp.float32, (nbh, nbw), 0) * coord_stride
    ys = lax.broadcasted_iota(jnp.float32, (nbh, nbw), 1) * coord_stride
    mw = inlier_mask.astype(jnp.float32) * w  # per-cell weight

    # Mean-center the coordinates before forming the normal equations — the
    # solution is algebraically identical (a0 is un-centered afterwards) but
    # the 3x3 system becomes near-block-diagonal, which keeps the float32
    # solve accurate where the reference leans on float64 (motion.py:52-65).
    wsum = jnp.sum(mw)
    xbar = jnp.sum(xs * mw) / wsum
    ybar = jnp.sum(ys * mw) / wsum
    xc = xs - xbar
    yc = ys - ybar
    ones = jnp.ones((nbh, nbw), jnp.float32)
    A = jnp.stack([ones, xc, yc], axis=-1)  # (nbh, nbw, 3)

    # These two reductions are the cross-device psum points when cells shard.
    # Precision.HIGHEST forces true-f32 accumulation (the default matmul
    # precision on TPU is bf16, far too coarse for a normal-equation solve).
    hi = lax.Precision.HIGHEST
    G = jnp.einsum("ija,ijb,ij->ab", A, A, mw, precision=hi)  # Σ w AᵀA  (3,3)
    d = motion_field.astype(jnp.float32)
    b = jnp.einsum("ija,ijc,ij->ac", A, d, mw, precision=hi)  # Σ w Aᵀ[dx,dy]

    sol = jnp.linalg.solve(G, b)  # (3, 2) rows: [c0, a1|b1, a2|b2]
    a0 = sol[0, 0] - sol[1, 0] * xbar - sol[2, 0] * ybar
    b0 = sol[0, 1] - sol[1, 1] * xbar - sol[2, 1] * ybar
    params = jnp.stack([a0, sol[1, 0], sol[2, 0], b0, sol[1, 1], sol[2, 1]])
    return params.astype(jnp.float32)


def outlier_mask(
    gt_motion_field: jnp.ndarray,
    affine_field: jnp.ndarray,
    outlier_fraction: float = 0.3,
) -> jnp.ndarray:
    """Top-`fraction` largest-error cells masked out.

    Mirrors reference motion.py:236-244: error = L1 norm of the field
    difference; threshold = ascending-sorted errors[-int(fraction*N)];
    outliers are cells with error strictly greater.  Returns the INLIER mask.
    """
    diff = jnp.abs(
        gt_motion_field.astype(jnp.int32) - affine_field.astype(jnp.int32)
    ).sum(axis=2)
    flat = jnp.sort(diff.reshape(-1))
    n = flat.shape[0]
    threshold_index = int(outlier_fraction * n)
    # all_diffs[-k] with k==0 degenerates to all_diffs[0] — preserved.
    threshold_value = flat[(n - threshold_index) % n]
    return ~(diff > threshold_value)


@partial(jax.jit, static_argnames=("shape",))
def get_motion_field_affine_jit(shape, parameters):
    return get_motion_field_affine(shape, parameters)
