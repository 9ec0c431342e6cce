"""Sanitizer-layer tests: poisoned inputs raise clear errors under
`run_checked` instead of silently emitting NaN parameters (SURVEY.md §5;
the reference swallows numeric trouble, motion.py:311-318)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from gme_tpu.ops.affine import fit_normal_equations
from gme_tpu.utils.guards import run_checked


def _field(nbh=6, nbw=8):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(-3, 4, (nbh, nbw, 2)).astype(np.int32))


def test_empty_inlier_set_raises():
    mask = jnp.zeros((6, 8), bool)
    with pytest.raises(checkify.JaxRuntimeError, match="empty inlier set"):
        run_checked(fit_normal_equations, _field(), mask, (96, 128), 4)


def test_collinear_inliers_raise():
    mask = np.zeros((6, 8), bool)
    mask[2, :] = True  # one row: x has no variance -> singular system
    with pytest.raises(checkify.JaxRuntimeError, match="singular"):
        run_checked(fit_normal_equations, _field(), jnp.asarray(mask), (96, 128), 4)


def test_float_fallback_empty_mask_raises():
    # float-typed field -> f32 einsum path; same degenerate input
    mask = jnp.zeros((6, 8), bool)
    field = _field().astype(jnp.float32)
    with pytest.raises(checkify.JaxRuntimeError):
        run_checked(fit_normal_equations, field, mask, (96, 128), 4)


def test_healthy_input_passes_and_matches_unchecked():
    mask = jnp.ones((6, 8), bool)
    field = _field()
    checked = run_checked(fit_normal_equations, field, mask, (96, 128), 4)
    plain = fit_normal_equations(field, mask, (96, 128), 4)
    assert np.array_equal(np.array(checked), np.array(plain))


def test_checks_compile_to_nothing_by_default():
    # without run_checked, the degenerate input silently yields NaNs — the
    # documented zero-overhead production behaviour
    mask = jnp.zeros((6, 8), bool)
    out = np.array(fit_normal_equations(_field(), mask, (96, 128), 4))
    assert np.isnan(out).any()


def test_full_pipeline_step_runs_checked(rng):
    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import gme_pipeline_step

    prev = rng.randint(0, 256, (64, 80), np.uint8)
    curr = np.roll(prev, (1, -2), (0, 1))
    cfg = GMEConfig()
    out = run_checked(
        gme_pipeline_step, jnp.asarray(prev), jnp.asarray(curr), cfg
    )
    assert np.isfinite(np.array(out["parameters"])).all()
