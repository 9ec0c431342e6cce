import numpy as np
import jax.numpy as jnp

from gme_tpu.config import GMEConfig
from gme_tpu.models.gme import (
    best_affine_parameters,
    best_affine_parameters_robust,
)
from gme_tpu.ops.affine import (
    affine_model,
    compute_first_parameters,
    fit_normal_equations,
    get_motion_field_affine,
    outlier_mask,
    parameter_projection,
)


def test_affine_model_matches_definition():
    p = jnp.array([1.0, 0.5, -0.25, 2.0, 0.0, 0.125])
    d = np.array(affine_model(4, 8, p))
    assert np.allclose(d, [1.0 + 2.0 - 2.0, 2.0 + 1.0])


def test_affine_field_rounding_and_dtype():
    p = jnp.array([0.5, 0.0, 0.0, 1.5, 0.0, 0.0])
    mf = np.array(get_motion_field_affine((3, 3), p))
    assert mf.dtype == np.int16
    # round-half-to-even: 0.5 -> 0, 1.5 -> 2 (numpy/Python round semantics)
    assert (mf[..., 0] == 0).all()
    assert (mf[..., 1] == 2).all()


def test_first_parameters_mean():
    mf = jnp.array(np.stack([np.full((4, 4), 3), np.full((4, 4), -2)], -1))
    p = np.array(compute_first_parameters(mf))
    assert np.allclose(p, [3, 0, 0, -2, 0, 0])


def test_parameter_projection_doubles_translation():
    p = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    out = np.array(parameter_projection(p))
    assert np.allclose(out, [2.0, 2.0, 3.0, 8.0, 5.0, 6.0])


def test_fit_recovers_exact_affine_field():
    """If the motion field IS affine in the cell coords, the fit is exact."""
    nbh, nbw, stride = 6, 8, 4
    true = np.array([2.0, 0.25, -0.5, -1.0, 0.125, 0.75])
    xs, ys = np.meshgrid(
        np.arange(nbh) * stride, np.arange(nbw) * stride, indexing="ij"
    )
    mf = np.stack(
        [true[0] + true[1] * xs + true[2] * ys, true[3] + true[4] * xs + true[5] * ys],
        axis=-1,
    )
    fit = np.array(
        fit_normal_equations(
            jnp.asarray(mf), jnp.ones((nbh, nbw), bool), (96, 128), stride
        )
    )
    assert np.allclose(fit, true, atol=1e-4)


def test_fit_respects_inlier_mask():
    nbh, nbw = 6, 8
    mf = np.zeros((nbh, nbw, 2))
    mf[..., 0] = 5.0
    corrupted = mf.copy()
    corrupted[0, 0] = [999, -999]
    mask = np.ones((nbh, nbw), bool)
    mask[0, 0] = False
    fit = np.array(
        fit_normal_equations(jnp.asarray(corrupted), jnp.asarray(mask), (96, 128), 4)
    )
    assert np.allclose(fit, [5, 0, 0, 0, 0, 0], atol=1e-4)


def test_outlier_mask_rule():
    gt = np.zeros((4, 5, 2), np.int32)
    af = np.zeros((4, 5, 2), np.int16)
    gt[0, 0] = [10, 10]  # error 20
    gt[1, 1] = [3, 0]  # error 3
    mask = np.array(outlier_mask(jnp.asarray(gt), jnp.asarray(af), 0.3))
    # N=20, threshold_index=6, ascending sorted errors[-6] = 0
    # => outliers are all cells with error > 0
    assert not mask[0, 0] and not mask[1, 1]
    assert mask.sum() == 18


def test_nonrobust_fit_matches_reference_golden(goldens):
    g = goldens("affine_fit.npz")
    mine = np.array(best_affine_parameters(jnp.asarray(g["prev"]), jnp.asarray(g["curr"])))
    assert np.allclose(mine, g["nonrobust"], atol=2e-3)


def test_robust_fit_matches_reference_golden(goldens):
    g = goldens("affine_fit.npz")
    mine = np.array(
        best_affine_parameters_robust(
            jnp.asarray(g["prev"]), jnp.asarray(g["curr"]), jnp.asarray(g["old"])
        )
    )
    assert np.allclose(mine, g["robust"], atol=2e-3)
