"""Gaussian pyramid as an XLA convolution.

Bit-exact TPU-native replacement for the reference's `cv2.pyrDown` loop
(reference utils.py:34-51).  OpenCV's pyrDown on uint8 is: REFLECT_101 border
padding of 2, separable 5-tap binomial kernel [1,4,6,4,1] (2-D weights sum to
256), stride-2 decimation starting at index 0, and fixed-point rounding
`(acc + 128) >> 8`.  All accumulator values are <= 255*256 = 65280, exactly
representable in float32, so the conv can run on the VPU/MXU in f32 and
reproduce OpenCV bit-for-bit (verified in tests/test_pyramid.py).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax import lax

# 5-tap binomial kernel with integer weights (sum 16 per axis, 256 in 2-D).


def _reflect101_pad2(img: jnp.ndarray) -> jnp.ndarray:
    """Pad by 2 on each side with REFLECT_101 (edge pixel not duplicated)."""
    return jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")


_W5 = (1.0, 4.0, 6.0, 4.0, 1.0)


def pyrdown(img: jnp.ndarray) -> jnp.ndarray:
    """Downsample one pyramid level, matching cv2.pyrDown on uint8 exactly.

    Implemented as explicit strided-slice multiply-adds rather than
    `lax.conv` — XLA may rewrite small convs with transforms (Winograd-style)
    whose intermediates are non-integer, breaking bit-exactness; slice+add
    keeps every intermediate an exact f32 integer and maps to pure VPU work.

    Args:
        img: (H, W) uint8 (or integer-valued float32) image.

    Returns:
        ((H+1)//2, (W+1)//2) uint8 image.
    """
    H, W = img.shape
    oh, ow = (H + 1) // 2, (W + 1) // 2
    x = _reflect101_pad2(img.astype(jnp.float32))
    # Vertical pass: v[i, :] = sum_k w[k] * x[2i + k, :], i in [0, oh).
    v = sum(w * x[k : k + 2 * oh - 1 : 2, :] for k, w in enumerate(_W5))
    # Horizontal pass on the vertically-filtered rows.
    acc = sum(w * v[:, k : k + 2 * ow - 1 : 2] for k, w in enumerate(_W5))
    # OpenCV fixed-point rounding: (acc + 128) >> 8 == floor((acc + 128)/256).
    return jnp.floor((acc + 128.0) * (1.0 / 256.0)).astype(jnp.uint8)


def get_pyramids(img: jnp.ndarray, levels: int = 3) -> List[jnp.ndarray]:
    """Gaussian pyramid, list ordered coarsest-first.

    Matches reference utils.py:34-51: `levels` images, where index 0 is the
    most-downsampled and index `levels-1` is the original (the reference
    `insert(0, scaled)`s each downsample).
    """
    pyramid = [img]
    curr = img
    for _ in range(1, levels):
        curr = pyrdown(curr)
        pyramid.insert(0, curr)
    return pyramid


@partial(jax.jit, static_argnames=("levels",))
def get_pyramids_jit(img: jnp.ndarray, levels: int = 3):
    return tuple(get_pyramids(img, levels))
