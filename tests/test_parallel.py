import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gme_tpu.config import GMEConfig
from gme_tpu.models.gme import gme_pipeline_step_jit
from gme_tpu.ops.bbme import exhaustive_search
from gme_tpu.ops.affine import fit_normal_equations
from gme_tpu.parallel.mesh import make_mesh
from gme_tpu.parallel.data_parallel import make_sharded_pipeline
from gme_tpu.parallel.spatial import make_spatial_pipeline

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _pairs(rng, B, H, W):
    prev = rng.randint(0, 256, (B, H, W), np.uint8)
    curr = np.stack(
        [np.roll(p, (rng.randint(-2, 3), rng.randint(-2, 3)), (0, 1)) for p in prev]
    )
    return prev, curr


def test_data_parallel_matches_single_device(rng):
    mesh = make_mesh(data=8, space=1)
    cfg = GMEConfig()
    B, H, W = 8, 64, 80
    prev, curr = _pairs(rng, B, H, W)
    step = make_sharded_pipeline(mesh, cfg)
    out = jax.device_get(step(jnp.asarray(prev), jnp.asarray(curr)))
    for k in range(B):
        single = gme_pipeline_step_jit(prev[k], curr[k], cfg)
        assert np.allclose(out["parameters"][k], np.array(single["parameters"]), atol=1e-4)
        assert np.array_equal(out["compensated"][k], np.array(single["compensated"]))
        assert abs(float(out["psnr"][k]) - float(single["psnr"])) < 1e-3


def test_spatial_sharded_step_matches_unsharded(rng):
    """Halo-exchanged, psum'd spatial step == same math on one device."""
    cfg = GMEConfig()
    B, H, W = 2, 128, 80  # 128 rows / (space=4 * bs=16) = 2 block-rows/shard
    mesh = make_mesh(data=2, space=4)
    prev, curr = _pairs(rng, B, H, W)
    step = make_spatial_pipeline(mesh, cfg, H, W, B)
    out = jax.device_get(step(jnp.asarray(prev), jnp.asarray(curr)))

    for k in range(B):
        # unsharded oracle: exhaustive field + unmasked fit + affine warp
        mf = np.array(exhaustive_search(
            jnp.asarray(prev[k]), jnp.asarray(curr[k]),
            cfg.pnorm_distance, cfg.block_size, 2,
        ))
        ref_params = np.array(fit_normal_equations(
            jnp.asarray(mf), jnp.ones(mf.shape[:2], bool), (H, W), cfg.coord_stride
        ))
        assert np.allclose(out["parameters"][k], ref_params, atol=1e-4), (
            f"pair {k}: {out['parameters'][k]} vs {ref_params}"
        )
        assert np.isfinite(out["psnr"][k])


def test_spatial_params_identical_across_devices(rng):
    """psum guarantees identical parameters everywhere; the gathered output
    must be consistent (one value per pair)."""
    cfg = GMEConfig()
    B, H, W = 2, 128, 80
    mesh = make_mesh(data=2, space=4)
    prev, curr = _pairs(rng, B, H, W)
    step = make_spatial_pipeline(mesh, cfg, H, W, B)
    out = step(jnp.asarray(prev), jnp.asarray(curr))
    params = jax.device_get(out["parameters"])
    assert params.shape == (B, 6)
    assert np.isfinite(params).all()
