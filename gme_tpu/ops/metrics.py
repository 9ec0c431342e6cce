"""Quality metrics.

PSNR mirrors reference utils.py:100-116 numerically but returns a real
float32 (the reference's `cmath.log10` returns a complex number — a bug whose
real part we match; the complex repr is not ported, see SURVEY.md §2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(original: jnp.ndarray, noisy: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB; -1.0 when the images are identical
    (reference utils.py:112-113)."""
    diff = original.astype(jnp.float32) - noisy.astype(jnp.float32)
    mse = jnp.mean(diff * diff)
    val = 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))
    return jnp.where(mse == 0, jnp.float32(-1.0), val.astype(jnp.float32))


psnr_jit = jax.jit(psnr)


def frame_difference(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """|a - b| as uint8 (reference results.py:80-85)."""
    return jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)).astype(jnp.uint8)
