import numpy as np
import jax.numpy as jnp
import pytest

from gme_tpu.ops.pyramid import get_pyramids, get_pyramids_jit, pyrdown

try:
    import cv2

    HAS_CV2 = True
except Exception:
    HAS_CV2 = False


@pytest.mark.skipif(not HAS_CV2, reason="cv2 unavailable")
@pytest.mark.parametrize("shape", [(8, 8), (9, 7), (240, 320), (121, 161), (15, 15)])
def test_pyrdown_matches_cv2_bitexact(rng, shape):
    x = rng.randint(0, 256, shape, np.uint8)
    assert np.array_equal(cv2.pyrDown(x), np.array(pyrdown(jnp.asarray(x))))


def test_pyramid_matches_reference_golden(goldens):
    g = goldens("pan240_pipeline.npz")
    pyr = get_pyramids_jit(g["prev_10_11"])
    for li in range(3):
        assert np.array_equal(np.array(pyr[li]), g[f"pyr_{li}"]), f"level {li}"


def test_pyramid_order_coarsest_first(rng):
    x = rng.randint(0, 256, (64, 96), np.uint8)
    pyr = get_pyramids(jnp.asarray(x), levels=3)
    assert [p.shape for p in pyr] == [(16, 24), (32, 48), (64, 96)]
    assert np.array_equal(np.array(pyr[2]), x)


def test_pyramid_odd_sizes():
    x = jnp.zeros((61, 81), jnp.uint8)
    pyr = get_pyramids(x, levels=3)
    assert [p.shape for p in pyr] == [(16, 21), (31, 41), (61, 81)]
