"""Pallas kernel parity tests (interpret mode on CPU).

The compiled-TPU path is exercised by bench.py / the driver; here the kernel
runs through the Pallas interpreter and must be bit-identical to both the
XLA scan formulation (bbme.compute_cost_volume) and a NumPy oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gme_tpu.config import MAE, MSE
from gme_tpu.ops import bbme
from gme_tpu.ops.pallas_kernels import dfd_cost_volume


def _np_cost_volume(prev, cpad, bs, D, pnorm):
    Hc, Wc = prev.shape
    nbh, nbw = Hc // bs, Wc // bs
    out = np.zeros((D, D, nbh, nbw), np.float32)
    for i in range(D):
        for j in range(D):
            d = cpad[i : i + Hc, j : j + Wc] - prev
            p = np.abs(d) if pnorm == MAE else d * d
            out[i, j] = p.reshape(nbh, bs, nbw, bs).sum(axis=(1, 3))
    return out


@pytest.mark.parametrize("pnorm", [MAE, MSE])
@pytest.mark.parametrize(
    "bs,Hc,Wc,D",
    [
        (8, 32, 40, 9),
        (4, 24, 24, 7),
        (2, 16, 24, 5),
        # Chunked planes path (bs < 8, D >= 8): D % G != 0 (chunk crop),
        # nbh % 8 != 0 (tile padding), the dense-init shape family.
        (2, 16, 24, 9),
        (4, 24, 32, 13),
        (2, 36, 64, 33),
        (4, 52, 68, 11),
        # Hankel MXU path (MSE, bs >= 8, bs + D - 1 <= 128): block edges 8
        # and 16, D odd/even coverage, nbw not divisible by the Jc chunk.
        (16, 48, 80, 9),
        (16, 32, 48, 33),
        (8, 40, 56, 17),
        (12, 36, 60, 21),
    ],
)
def test_kernel_matches_numpy_oracle(rng, pnorm, bs, Hc, Wc, D):
    prev = rng.randint(0, 256, (Hc, Wc)).astype(np.float32)
    cpad = rng.randint(0, 256, (Hc + D - 1, Wc + D - 1)).astype(np.float32)
    got = np.asarray(
        dfd_cost_volume(jnp.asarray(prev), jnp.asarray(cpad), bs, D, pnorm, interpret=True)
    )
    want = _np_cost_volume(prev, cpad, bs, D, pnorm)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pnorm", [MAE, MSE])
def test_kernel_matches_xla_cost_volume(rng, monkeypatch, pnorm):
    """Masked volume through compute_cost_volume: pallas (interpret) ==
    XLA scan path, bit for bit, including the +inf out-of-frame mask."""
    H, W, bs, R = 48, 56, 8, 8
    prev = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    curr = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))

    v_xla = bbme.compute_cost_volume(prev, curr, bs, R, pnorm)

    # Route the pallas branch through the interpreter on CPU.
    monkeypatch.setattr(bbme, "use_pallas", lambda: True)
    import gme_tpu.ops.pallas_kernels as pk

    orig = pk.dfd_cost_volume

    def interp_kernel(p, c, bsz, D, pn, interpret=False):
        return orig(p, c, bsz, D, pn, interpret=True)

    monkeypatch.setattr(bbme, "dfd_cost_volume", interp_kernel)
    v_pal = bbme.compute_cost_volume(prev, curr, bs, R, pnorm)

    fin = np.isfinite(np.asarray(v_xla))
    assert (np.isfinite(np.asarray(v_pal)) == fin).all()
    np.testing.assert_array_equal(np.asarray(v_pal)[fin], np.asarray(v_xla)[fin])


def test_exhaustive_pallas_branch_matches(rng, monkeypatch):
    """exhaustive_search through the pallas branch (interpret) matches the
    XLA branch, including tie-breaking scan order."""
    H, W, bs, sw = 36, 48, 12, 8
    prev = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    curr = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))

    ref = np.asarray(bbme.exhaustive_search(prev, curr, MAE, bs, sw))

    import gme_tpu.ops.pallas_kernels as pk

    orig = pk.dfd_cost_volume

    def interp_kernel(p, c, bsz, D, pn, interpret=False):
        return orig(p, c, bsz, D, pn, interpret=True)

    monkeypatch.setattr(bbme, "use_pallas", lambda: True)
    monkeypatch.setattr(bbme, "dfd_cost_volume", interp_kernel)
    got = np.asarray(bbme.exhaustive_search(prev, curr, MAE, bs, sw))
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Successor-map builder parity (diamond walk)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("H,W,bs,R", [(48, 64, 16, 6), (20, 28, 2, 5), (40, 40, 8, 12)])
def test_succ_map_packed_matches_select(rng, H, W, bs, R):
    """The packed-minimum successor-map builder (production) == the
    select-chain builder (verification twin), bit for bit, on a real masked
    cost volume — including frame-border blocks where the reference's
    position clamps (bbme.py:503-504) saturate candidates."""
    prev = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    curr = jnp.asarray(rng.randint(0, 256, (H, W), np.uint8))
    vol = bbme.compute_cost_volume(prev, curr, bs, R, MSE)
    nbh, nbw = H // bs, W // bs
    origins = bbme._block_origins(nbh, nbw, bs)

    want = np.asarray(bbme._succ_map_select(vol, origins, H, W, bs, R))
    got = np.asarray(bbme._succ_map_packed(vol, origins, H, W, bs, R))
    np.testing.assert_array_equal(got, want)


def test_succ_map_packed_ties_and_inf(rng):
    """Tie-breaking (strict <, LDSP order) and all-inf blocks behave exactly
    like the select builder on adversarial volumes: constant volumes (every
    candidate ties), fully-masked (+inf) volumes, and the maximum
    representable cost (255^2 * bs^2, the pack-exactness boundary)."""
    H, W, bs, R = 32, 32, 8, 4
    nbh, nbw = H // bs, W // bs
    D = 2 * R + 1
    origins = bbme._block_origins(nbh, nbw, bs)

    max_cost = float(255 * 255 * bs * bs)
    for vol in (
        jnp.zeros((nbh, nbw, D * D), jnp.float32),
        jnp.full((nbh, nbw, D * D), np.inf, jnp.float32),
        jnp.full((nbh, nbw, D * D), max_cost, jnp.float32),
        jnp.asarray(
            np.random.RandomState(3).choice(
                [0.0, 1.0, max_cost, np.inf], (nbh, nbw, D * D)
            ).astype(np.float32)
        ),
    ):
        want = np.asarray(bbme._succ_map_select(vol, origins, H, W, bs, R))
        got = np.asarray(bbme._succ_map_packed(vol, origins, H, W, bs, R))
        np.testing.assert_array_equal(got, want)


def test_chase_kernel_matches_sequential_oracle(rng):
    """The Pallas fixpoint chase (interpret mode) == a per-cell sequential
    numpy walk over the same rank map: same fixpoints, same ring-visited
    flags — on plain motion AND on a shift big enough to escape the
    radius (walks clamped at the volume edge)."""
    import jax.numpy as jnp

    from gme_tpu.ops import bbme as B
    from gme_tpu.ops.pallas_kernels import chase_fixpoint

    H, W, bs = 48, 64, 8
    for shift in (2, 9):  # 9 > R: forces ring visits and volume clamping
        R = 5
        D = 2 * R + 1
        base = rng.randint(0, 256, (H + shift, W + shift), np.uint8)
        prev = jnp.asarray(base[:H, :W])
        curr = jnp.asarray(base[shift:, shift:])
        nbh, nbw = H // bs, W // bs
        origins = B._block_origins(nbh, nbw, bs)
        vol = B.compute_cost_volume(prev, curr, bs, R, 1)
        rank = np.asarray(
            B._succ_map(vol, origins, H, W, bs, R)
        ).reshape(nbh * nbw, D * D)
        og = np.asarray(origins).reshape(-1, 2)
        lo_r, hi_r = -og[:, 0], (H - bs - 1) - og[:, 0]
        lo_c, hi_c = -og[:, 1], (W - bs - 1) - og[:, 1]

        # Sequential oracle: follow the rank map per cell.
        exp_o = np.zeros(len(og), np.int32)
        exp_t = np.zeros(len(og), bool)
        for cell in range(len(og)):
            o = R * D + R
            for _ in range(4096):
                r, c = o // D - R, o % D - R
                exp_t[cell] |= max(abs(r), abs(c)) >= R - 1
                a, b = B._LDSP[rank[cell, o]]
                er = np.clip(r + a, lo_r[cell], hi_r[cell])
                ec = np.clip(c + b, lo_c[cell], hi_c[cell])
                nxt = (er + R) * D + (ec + R)
                if nxt == o:
                    break
                o = nxt
            exp_o[cell] = o

        bounds = jnp.asarray(
            np.stack(
                [lo_r, hi_r, lo_c, hi_c] + [np.zeros(len(og), np.int64)] * 4,
                axis=1,
            ).astype(np.int32)
        )
        got_o, got_t = chase_fixpoint(
            jnp.asarray(rank), bounds, D, R, 4096, interpret=True
        )
        assert np.array_equal(np.asarray(got_o), exp_o), f"shift={shift}"
        assert np.array_equal(np.asarray(got_t), exp_t), f"shift={shift}"
