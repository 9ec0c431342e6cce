"""Tests for direct (gradient-descent) GME — the working realisation of the
reference's abandoned prototypes (gd tests/motion.py:108-147, declared
non-functional at testing_GD_with_pytorch.py:33-38, hessian_gradient.py:82-85).

Known-motion recovery: `curr = warp_backward(prev, true_params)` makes the
photometric loss's global optimum exactly `true_params`, so the optimiser
must recover them (translation to < 0.5 px per the driver spec; in practice
it lands well under 0.1 px)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gme_tpu.models.direct import (
    DEFAULT_ITERATIONS,
    bilinear_sample,
    direct_global_motion_estimation,
    direct_motion_compensation,
    identity_params,
    params_from_pixel,
    params_to_pixel,
    perspective_model,
    project_params,
    warp_backward,
    warp_forward,
)
from gme_tpu.ops.metrics import psnr


def _smooth_image(H=96, W=128, seed=0):
    """Smooth synthetic frame: blocky random field blurred by repeated box
    filters (gradient-descent needs non-zero image gradients)."""
    rng = np.random.RandomState(seed)
    img = np.kron(rng.rand(H // 8, W // 8), np.ones((8, 8)))
    k = np.ones(9) / 9.0
    for _ in range(3):
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 0, img
        )
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, img
        )
    img = 255 * (img - img.min()) / (np.ptp(img) + 1e-9)
    return img.astype(np.uint8)


@pytest.fixture(scope="module")
def smooth():
    return jnp.asarray(_smooth_image())


def test_affine_recovers_translation(smooth):
    true = jnp.array([3.0, 0, 0, -4.0, 0, 0], jnp.float32)
    curr = warp_backward(smooth, true, "affine")
    est = np.array(direct_global_motion_estimation(smooth, curr, "affine"))
    assert abs(est[0] - 3.0) < 0.5 and abs(est[3] + 4.0) < 0.5, est
    assert np.allclose(est, np.array(true), atol=0.1), est


def test_affine_recovers_zoom_rotation(smooth):
    # mild affine: zoom + shear + translation
    true = jnp.array([2.0, 0.02, -0.01, -1.5, 0.015, 0.03], jnp.float32)
    curr = warp_backward(smooth, true, "affine")
    est = np.array(direct_global_motion_estimation(smooth, curr, "affine"))
    assert np.allclose(est, np.array(true), atol=0.1), est


def test_perspective_recovers_translation(smooth):
    true = jnp.array([3.0, -4.0, 1, 0, 0, 1, 0, 0], jnp.float32)
    curr = warp_backward(smooth, true, "perspective")
    est = np.array(
        direct_global_motion_estimation(smooth, curr, "perspective")
    )
    assert abs(est[0] - 3.0) < 0.5 and abs(est[1] + 4.0) < 0.5, est


def test_perspective_recovers_homography(smooth):
    """The DEFAULT configuration must recover a genuine homography
    (projective terms included) — the regression for the round-1 advisor
    finding that the perspective model diverged."""
    true = jnp.array(
        [2.0, -1.0, 1.01, 0.02, -0.015, 0.99, 1e-4, -5e-5], jnp.float32
    )
    curr = warp_backward(smooth, true, "perspective")
    est = np.array(
        direct_global_motion_estimation(smooth, curr, "perspective")
    )
    assert np.allclose(est[:6], np.array(true)[:6], atol=0.1), est
    assert np.allclose(est[6:], np.array(true)[6:], atol=2e-4), est


def test_compensation_improves_psnr(smooth):
    prev = np.array(smooth)
    curr = np.roll(prev, (3, -4), (0, 1))
    params, comp = direct_motion_compensation(
        jnp.asarray(prev), jnp.asarray(curr), "affine"
    )
    before = float(psnr(jnp.asarray(curr), jnp.asarray(prev)))
    after = float(psnr(jnp.asarray(curr), comp))
    assert after > before + 6.0, (before, after)


def test_bilinear_clamps_to_edge():
    img = jnp.asarray(np.arange(16, dtype=np.uint8).reshape(4, 4))
    # far out-of-bounds coordinates resolve to the true edge pixel, not a
    # blend of rows/cols 0 and 1 (round-1 advisor finding)
    v = float(bilinear_sample(img, jnp.float32(-10.3), jnp.float32(0.0)))
    assert v == 0.0
    v = float(bilinear_sample(img, jnp.float32(99.0), jnp.float32(99.0)))
    assert v == 15.0


def test_warp_forward_collision_last_write_wins():
    # two source pixels map to the same destination; the prototype's
    # row-major loop means the LAST source (higher rank) wins
    frame = jnp.asarray(np.array([[10, 20], [30, 40]], np.uint8))
    # params that map everything to (0, 0): x' = 0*x+0*y+0, y' = 0
    params = jnp.zeros((8,), jnp.float32)
    out = np.array(warp_forward(frame, params, "perspective"))
    assert out[0, 0] == 40  # last row-major source pixel
    assert out[0, 1] == 0 and out[1, 0] == 0 and out[1, 1] == 0


def test_warp_forward_identity():
    frame = jnp.asarray(_smooth_image(32, 32))
    out = np.array(warp_forward(frame, identity_params("perspective")))
    assert np.array_equal(out, np.array(frame))


def test_backward_forward_roundtrip_translation(smooth):
    """Directionality contract: `warp_backward(prev, d)` reads prev[x+d];
    forward-warping THAT result with the same d writes it back to x+d —
    round-tripping to the original away from the borders.  (Compensating
    the PREVIOUS frame with `warp_forward` instead needs the inverse
    mapping — see the module docstring.)"""
    t = jnp.array([5.0, 0, 0, 7.0, 0, 0], jnp.float32)
    curr = warp_backward(smooth, t, "affine")
    back = np.array(warp_forward(curr, t, "affine"))
    ref = np.array(smooth).astype(np.float32)
    interior = (slice(8, -8), slice(8, -8))
    assert np.allclose(back[interior], np.round(ref[interior]), atol=1.0)


def test_project_params_matches_prototype_rule():
    p = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], jnp.float32)
    out = np.array(project_params(p, "perspective"))
    assert np.allclose(out, [2, 4, 3, 4, 5, 6, 3.5, 4])  # gd motion.py:95-105
    a = jnp.array([1.0, 2, 3, 4, 5, 6], jnp.float32)
    assert np.allclose(np.array(project_params(a, "affine")), [2, 2, 3, 8, 5, 6])


def test_pixel_normalised_roundtrip():
    for model, n in (("affine", 6), ("perspective", 8)):
        p = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
        rt = np.array(
            params_from_pixel(params_to_pixel(p, 96.0, model), 96.0, model)
        )
        assert np.allclose(rt, np.array(p), rtol=1e-6)


def test_iteration_budget_is_static():
    # the per-level loop is a lax.scan of static length (no retracing)
    assert DEFAULT_ITERATIONS >= 100
