"""Hierarchical (coarse-to-fine) block matching.

Re-design of reference bbme.py:537-605.  Distinct from the GME hierarchy:
this refines the *motion field* across pyramid levels (the GME model refines
*model parameters*).  Quirks preserved:

- upscale = nearest-neighbour 2x repeat, then values * 2
  (reference `rescale_motion_field`, bbme.py:537-546);
- on odd-size rounding mismatches, the upscaled field is zero-padded with ONE
  row OR one column (rows take priority — bbme.py:596-602);
- the per-level fresh field always uses diamond search regardless of the
  requested procedure (reference bbme.py:588-594 hard-codes 3), while the
  coarsest level honours `searching_procedure`;
- the average `(old + new) / 2` is a true division — the returned field is
  float (reference bbme.py:604).
"""

from __future__ import annotations

import jax.numpy as jnp

from gme_tpu.config import DIAMOND
from gme_tpu.ops.bbme import get_motion_field
from gme_tpu.ops.pyramid import get_pyramids


def rescale_motion_field(motion_field: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample by `scale`, values doubled
    (reference bbme.py:537-546).  Quirks preserved: values are always *2
    regardless of `scale`, and the reference assigns into an int32 zeros
    array (bbme.py:539-544) — float inputs (from the previous level's /2
    average) TRUNCATE toward zero before doubling."""
    mf = jnp.repeat(jnp.repeat(motion_field, scale, axis=0), scale, axis=1)
    mf = jnp.trunc(mf.astype(jnp.float32)).astype(jnp.int32)
    return mf * 2


def hierarchical_wrapper(
    previous: jnp.ndarray,
    current: jnp.ndarray,
    block_size: int = 10,
    search_window: int = 4,
    searching_procedure: int = DIAMOND,
    levels: int = 3,
    max_iters: int = 4096,
) -> jnp.ndarray:
    """Coarse-to-fine block matching over a Gaussian pyramid
    (reference bbme.py:549-605).  Returns a float32 motion field."""
    previous_pyr = get_pyramids(previous, levels=levels)
    current_pyr = get_pyramids(current, levels=levels)

    motion_field = get_motion_field(
        previous_pyr[0],
        current_pyr[0],
        block_size=block_size,
        search_window=search_window,
        searching_procedure=searching_procedure,
        max_iters=max_iters,
    ).astype(jnp.float32)

    for level in range(1, levels):
        prev = previous_pyr[level]
        curr = current_pyr[level]
        motion_field = rescale_motion_field(motion_field, scale=2)
        new_mf = get_motion_field(
            prev,
            curr,
            block_size=block_size,
            search_window=search_window,
            searching_procedure=DIAMOND,
            max_iters=max_iters,
        ).astype(jnp.float32)
        # Integer-rounding shape fixups (reference bbme.py:596-602): pad one
        # zero row OR one zero column (rows take priority).
        if motion_field.shape != new_mf.shape:
            if motion_field.shape[0] != new_mf.shape[0]:
                filler = jnp.zeros((1, motion_field.shape[1], 2), motion_field.dtype)
                motion_field = jnp.concatenate([motion_field, filler], axis=0)
            else:
                filler = jnp.zeros((motion_field.shape[0], 1, 2), motion_field.dtype)
                motion_field = jnp.concatenate([motion_field, filler], axis=1)
        motion_field = (motion_field + new_mf) / 2
    return motion_field
