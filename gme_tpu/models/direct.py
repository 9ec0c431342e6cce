"""Direct (gradient-descent) global-motion estimation.

The reference attempted *direct* parameter estimation — minimising the
photometric error between the motion-compensated previous frame and the
current frame — three separate times and abandoned every attempt as
non-functional (reference `test scripts/gradient descent tests/`:
hand-rolled NumPy GD `motion.py:108-147`, a PyTorch Adam attempt declared
"does not work" at `testing_GD_with_pytorch.py:33-38`, and a SymPy Hessian
attempt marked "#! does not work" at `hessian_gradient.py:82-85`).  The
root causes were structural: integer-rounded warps (no gradient), per-pixel
Python loops, and no smooth interpolation.

This module is the working TPU-native realisation of that feature:

- the legacy 8-parameter **perspective model** of the reference prototype
  (gd tests/motion.py:51-63: x' = (a0 + a2*x + a3*y) / (a6*x + a7*y + 1),
  y' = (a1 + a4*x + a5*y) / (a6*x + a7*y + 1)) and the 6-parameter affine
  model (motion.py:91-105), vectorised over the pixel grid;
- a **differentiable backward warp** (bilinear gather) so the photometric
  SSD loss (gd tests/motion.py:9-23) has usable gradients — JAX autodiff
  replaces the reference's symbolic/handmade derivative attempts;
- coarse-to-fine optimisation over the Gaussian pyramid with the
  prototype's parameter projection rule (a0,a1 doubled, a6,a7 halved per
  finer level — gd tests/motion.py:95-105), a fixed per-level iteration
  budget (N_MAX_ITERATIONS=100, gd tests/motion.py:6) inside `lax.scan`
  (static shapes, one compile), and Adam updates via optax;
- a vectorised **forward-warp** compensator matching the prototype's
  scatter semantics (gd tests/motion.py:66-80: destination coords clamped
  to the frame, later writes win) plus the standard backward compensator.

Everything is jit-compatible and batchable with `jax.vmap`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from gme_tpu.ops.pyramid import get_pyramids

N_MAX_ITERATIONS = 100  # per level, reference gd tests/motion.py:6

# ---------------------------------------------------------------------------
# Motion models (vectorised over coordinate grids)
# ---------------------------------------------------------------------------


def perspective_model(params: jnp.ndarray, x, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mapped coordinates under the 8-param perspective model.

    params = [a0..a7]; mirrors gd tests/motion.py:51-63 but without the
    int() truncation (smooth, so it differentiates) and without the bare
    try/except on a vanishing denominator — the denominator is kept away
    from zero by a tiny signed epsilon instead.
    """
    p = params
    den = p[6] * x + p[7] * y + 1.0
    den = jnp.where(jnp.abs(den) < 1e-6, jnp.where(den < 0, -1e-6, 1e-6), den)
    x1 = (p[0] + p[2] * x + p[3] * y) / den
    y1 = (p[1] + p[4] * x + p[5] * y) / den
    return x1, y1


def affine_coords(params: jnp.ndarray, x, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mapped coordinates under the 6-param affine DISPLACEMENT model
    (reference motion.py:91-105): source = coord + displacement."""
    p = params
    x1 = x + p[0] + p[1] * x + p[2] * y
    y1 = y + p[3] + p[4] * x + p[5] * y
    return x1, y1


def identity_params(model: str) -> jnp.ndarray:
    """Parameters mapping every pixel to itself."""
    if model == "perspective":
        # x' = (a0 + a2 x + a3 y)/(...): identity needs a2 = a5 = 1 — the
        # same fact the prototype discovered the hard way (gd tests/
        # motion.py:46 "#! first initialization needs a2 and a5 to be 1").
        return jnp.array([0, 0, 1, 0, 0, 1, 0, 0], jnp.float32)
    if model == "affine":
        return jnp.zeros((6,), jnp.float32)
    raise ValueError(f"unknown model {model!r}")


def project_params(params: jnp.ndarray, model: str) -> jnp.ndarray:
    """One pyramid level finer.  Perspective: a0,a1 *= 2, a6,a7 /= 2
    (gd tests/motion.py:95-105).  Affine: a0,b0 *= 2 (motion.py:191-207)."""
    if model == "perspective":
        s = jnp.array([2, 2, 1, 1, 1, 1, 0.5, 0.5], jnp.float32)
    else:
        s = jnp.array([2, 1, 1, 2, 1, 1], jnp.float32)
    return params * s


def _model_coords(model: str, params, x, y):
    if model == "perspective":
        return perspective_model(params, x, y)
    return affine_coords(params, x, y)


# ---------------------------------------------------------------------------
# Differentiable warps
# ---------------------------------------------------------------------------


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup img[x, y] with edge clamping (x = row coordinate,
    matching the reference's (i, j) = (row, col) convention throughout
    gd tests/motion.py:66-80)."""
    H, W = img.shape
    img = img.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, H - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, W - 1)
    v00 = img[x0i, y0i]
    v01 = img[x0i, y1i]
    v10 = img[x1i, y0i]
    v11 = img[x1i, y1i]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * (1 - fx) * fy
        + v10 * fx * (1 - fy)
        + v11 * fx * fy
    )


def warp_backward(
    frame: jnp.ndarray, params: jnp.ndarray, model: str = "perspective"
) -> jnp.ndarray:
    """Differentiable backward warp: out[i, j] = frame[model(i, j)]
    (bilinear).  Float32 output in [0, 255]."""
    H, W = frame.shape
    xs = lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ys = lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x1, y1 = _model_coords(model, params, xs, ys)
    return bilinear_sample(frame, x1, y1)


def warp_forward(
    frame: jnp.ndarray, params: jnp.ndarray, model: str = "perspective"
) -> jnp.ndarray:
    """Forward (scatter) warp with the legacy prototype's semantics
    (gd tests/motion.py:66-80): each source pixel (i, j) is written to the
    rounded-down mapped coordinate, clamped into the frame; pixels nothing
    maps to stay 0; among colliding writes the LAST source pixel in row-
    major order wins (the prototype's loop-order behaviour), realised here
    with `mode="drop"`-free scatter on int destination indices."""
    H, W = frame.shape
    xs = lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ys = lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x1, y1 = _model_coords(model, params, xs, ys)
    xd = jnp.clip(x1.astype(jnp.int32), 0, H - 1)
    yd = jnp.clip(y1.astype(jnp.int32), 0, W - 1)
    out = jnp.zeros_like(frame)
    # XLA scatter with duplicate indices: last update in operand order wins
    # when applied sequentially; `.at[].set` uses unique_indices=False and
    # applies updates in order for `set` on TPU via sort — semantics match
    # the prototype's row-major overwrite.
    return out.at[xd.reshape(-1), yd.reshape(-1)].set(frame.reshape(-1))


# ---------------------------------------------------------------------------
# Direct estimation (the working gradient descent)
# ---------------------------------------------------------------------------


def photometric_loss(
    params: jnp.ndarray,
    previous: jnp.ndarray,
    current: jnp.ndarray,
    model: str,
) -> jnp.ndarray:
    """Mean squared photometric error between the backward-warped previous
    frame and the current frame (the SSD of gd tests/motion.py:9-23,
    normalised so the loss scale is resolution-independent)."""
    warped = warp_backward(previous, params, model)
    err = warped - current.astype(jnp.float32)
    return jnp.mean(err * err)


@functools.partial(
    jax.jit, static_argnames=("model", "iterations", "learning_rate")
)
def optimize_level(
    params: jnp.ndarray,
    previous: jnp.ndarray,
    current: jnp.ndarray,
    model: str = "perspective",
    iterations: int = N_MAX_ITERATIONS,
    learning_rate: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-budget Adam minimisation of the photometric loss at one level.

    A bounded `lax.scan` (one compile, static shapes) replaces the
    reference's N_MAX_ITERATIONS Python loop that never computed a usable
    gradient.  Per-parameter scale normalisation: the linear terms (a1..a5)
    move pixels by ~coordinate magnitude and the perspective terms (a6, a7)
    by ~coordinate², so their gradients live on wildly different scales —
    Adam's per-parameter normalisation handles this without hand-tuning.

    Returns (final params, per-iteration loss trace).
    """
    prev_f = previous.astype(jnp.float32)
    curr_f = current.astype(jnp.float32)
    opt = optax.adam(learning_rate)
    grad_fn = jax.value_and_grad(photometric_loss)

    def step(carry, _):
        p, opt_state = carry
        loss, g = grad_fn(p, prev_f, curr_f, model)
        updates, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), loss

    (params, _), losses = lax.scan(
        step, (params, opt.init(params)), None, length=iterations
    )
    return params, losses


def direct_global_motion_estimation(
    previous: jnp.ndarray,
    current: jnp.ndarray,
    model: str = "perspective",
    levels: int = 3,
    iterations: int = N_MAX_ITERATIONS,
    learning_rate: float = 0.05,
) -> jnp.ndarray:
    """Coarse-to-fine direct GME: the working version of the reference's
    abandoned `global_motion_estimation` prototype (gd tests/motion.py:150+).

    Pipeline: Gaussian pyramids (coarsest first, reference utils.py:34-51)
    → identity init at the coarsest level → per level: Adam refinement of
    the photometric loss → parameter projection to the next finer level.

    Returns the (8,) perspective or (6,) affine parameters at full
    resolution.
    """
    prev_pyr = get_pyramids(previous, levels)
    curr_pyr = get_pyramids(current, levels)
    params = identity_params(model)
    for lvl in range(levels):
        params, _ = optimize_level(
            params,
            prev_pyr[lvl],
            curr_pyr[lvl],
            model=model,
            iterations=iterations,
            learning_rate=learning_rate,
        )
        if lvl != levels - 1:
            params = project_params(params, model)
    return params


def direct_motion_compensation(
    previous: jnp.ndarray,
    current: jnp.ndarray,
    model: str = "perspective",
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot direct estimate + backward compensation.

    Returns (params, compensated uint8 frame) — the shape of the one-shot
    `motion_compensation` wrapper (reference motion.py:324-341) for the
    direct path.
    """
    params = direct_global_motion_estimation(previous, current, model, **kw)
    comp = warp_backward(previous, params, model)
    return params, jnp.clip(jnp.round(comp), 0, 255).astype(jnp.uint8)
