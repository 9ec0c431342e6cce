import numpy as np
import jax.numpy as jnp
import pytest

from gme_tpu.ops.metrics import frame_difference, psnr
from gme_tpu.ops.warp import (
    _warped_covered_gather,
    _warped_covered_mxu,
    compensate_frame,
)


@pytest.mark.parametrize(
    "shape,bs",
    [((64, 96), 16), ((48, 80), 16), ((30, 44), 4), ((33, 47), 8)],
)
def test_warp_mxu_path_matches_gather(rng, shape, bs):
    """The MXU (one-hot matmul) warp must be bit-identical to the gather
    path, including partially-out-of-bounds blocks and remainder regions."""
    H, W = shape
    nbh, nbw = H // bs, W // bs
    f = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    d = jnp.asarray(rng.randint(-20, 21, (nbh, nbw, 2), np.int32))
    cov_h, cov_w = nbh * bs, nbw * bs
    a = np.array(_warped_covered_gather(f, d, bs, cov_h, cov_w))
    b = np.array(_warped_covered_mxu(f, d, bs, cov_h, cov_w))
    # Both paths apply identical row/column clamps, so they are equal
    # EVERYWHERE — including OOB pixels the validity mask later overrides.
    assert np.array_equal(a, b)


def test_warp_matches_reference_golden(goldens):
    g = goldens("warp.npz")
    mine = np.array(compensate_frame(jnp.asarray(g["frame"]), jnp.asarray(g["mf"])))
    assert np.array_equal(mine, g["comp"])


def test_warp_zero_field_is_identity(rng):
    f = rng.randint(0, 256, (32, 48), np.uint8)
    mf = np.zeros((4, 6, 2), np.int16)
    out = np.array(compensate_frame(jnp.asarray(f), jnp.asarray(mf)))
    assert np.array_equal(out, f)


def test_warp_oob_keeps_original(rng):
    """Displacements pointing outside the frame must leave pixels unchanged
    (reference motion.py:311-318 skip semantics)."""
    f = rng.randint(0, 256, (16, 16), np.uint8)
    mf = np.full((2, 2, 2), 100, np.int16)  # source always out of range
    out = np.array(compensate_frame(jnp.asarray(f), jnp.asarray(mf)))
    assert np.array_equal(out, f)


def test_warp_pure_translation(rng):
    f = rng.randint(0, 256, (32, 32), np.uint8)
    mf = np.zeros((4, 4, 2), np.int16)
    mf[..., 0] = 2  # column shift
    mf[..., 1] = 3  # row shift
    out = np.array(compensate_frame(jnp.asarray(f), jnp.asarray(mf)))
    # interior pixels: out[r, c] = f[r-3, c-2]
    assert np.array_equal(out[3:, 2:], f[:-3, :-2])


def test_psnr_values(goldens):
    g = goldens("pan240_pipeline.npz")
    val = float(psnr(g["curr_10_11"], g["comp_10_11"]))
    assert abs(val - float(g["psnr_10_11"])) < 1e-3


def test_psnr_identical_is_minus_one(rng):
    f = rng.randint(0, 256, (8, 8), np.uint8)
    assert float(psnr(f, f)) == -1.0


def test_frame_difference(rng):
    a = rng.randint(0, 256, (8, 8), np.uint8)
    b = rng.randint(0, 256, (8, 8), np.uint8)
    d = np.array(frame_difference(a, b))
    assert np.array_equal(d, np.abs(a.astype(int) - b.astype(int)).astype(np.uint8))


@pytest.mark.parametrize(
    "shape,bs",
    [((64, 96), 16), ((48, 80), 16), ((30, 44), 4), ((33, 47), 8)],
)
def test_warp_pallas_kernel_matches_gather(rng, shape, bs):
    """The Pallas warp kernel (two one-hot MXU matmuls per block row, the
    TPU production path) is bit-identical to the gather formulation —
    including clipped-source pixels the validity mask later overrides."""
    from gme_tpu.ops.pallas_kernels import warp_block_field

    H, W = shape
    nbh, nbw = H // bs, W // bs
    f = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    d = jnp.asarray(rng.randint(-20, 21, (nbh, nbw, 2), np.int32))
    cov_h, cov_w = nbh * bs, nbw * bs
    a = np.array(_warped_covered_gather(f, d, bs, cov_h, cov_w))
    b = np.array(warp_block_field(f, d, bs, interpret=True))
    assert b.shape == (cov_h, cov_w) and b.dtype == np.uint8
    assert np.array_equal(a, b)


def test_warp_pallas_kernel_batched(rng):
    """vmap over a batch of (frame, field) pairs — the pipeline's usage."""
    import jax

    from gme_tpu.ops.pallas_kernels import warp_block_field

    H, W, bs = 32, 48, 8
    nbh, nbw = H // bs, W // bs
    fb = jnp.asarray(rng.randint(0, 256, (3, H, W), np.uint8))
    db = jnp.asarray(rng.randint(-10, 11, (3, nbh, nbw, 2), np.int32))
    out = np.array(
        jax.vmap(lambda f, d: warp_block_field(f, d, bs, interpret=True))(fb, db)
    )
    for i in range(3):
        ref = np.array(
            _warped_covered_gather(fb[i], db[i], bs, nbh * bs, nbw * bs)
        )
        assert np.array_equal(out[i], ref)
