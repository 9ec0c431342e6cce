"""Motion compensation (block warp) as a masked gather.

Replaces the reference's per-pixel Python warp loop (reference
motion.py:289-321) with a single vectorised gather.  Boundary semantics are
preserved exactly:

- block size is derived from the frame/field *row* ratio
  (motion.py:303: bs = frame.shape[0] // motion_field.shape[0]);
- source pixel = (r - d[1], c - d[0]) (X=1 is the row shift, Y=0 the column
  shift — motion.py:299-300, 312-313);
- negative source indices are rejected (the reference's `assert > -1`) and
  out-of-range positive indices raise-and-skip — in both cases the output
  pixel keeps the ORIGINAL frame value (motion.py:311-318);
- pixels beyond the field's coverage (bottom/right remainders) keep their
  original value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compensate_frame(frame: jnp.ndarray, motion_field: jnp.ndarray) -> jnp.ndarray:
    """Warp `frame` by the per-block `motion_field`.

    Args:
        frame: (H, W) uint8 frame.
        motion_field: (nbh, nbw, 2) int field; channel 0 = column shift,
            channel 1 = row shift.

    Returns:
        (H, W) uint8 compensated frame.
    """
    H, W = frame.shape
    nbh, nbw = motion_field.shape[:2]
    bs = H // nbh
    cov_h, cov_w = nbh * bs, nbw * bs  # region covered by the field

    d = motion_field.astype(jnp.int32)
    # Upsample the per-block displacement to per-pixel over the covered region.
    d_px = jnp.repeat(jnp.repeat(d, bs, axis=0), bs, axis=1)  # (cov_h, cov_w, 2)

    rr = jnp.arange(cov_h, dtype=jnp.int32)[:, None]
    cc = jnp.arange(cov_w, dtype=jnp.int32)[None, :]
    src_r = rr - d_px[..., 1]
    src_c = cc - d_px[..., 0]
    valid = (src_r >= 0) & (src_c >= 0) & (src_r < H) & (src_c < W)

    gr = jnp.clip(src_r, 0, H - 1)
    gc = jnp.clip(src_c, 0, W - 1)
    warped = frame[gr, gc]
    covered = jnp.where(valid, warped, frame[:cov_h, :cov_w])

    if cov_h == H and cov_w == W:
        return covered
    out = frame
    out = out.at[:cov_h, :cov_w].set(covered)
    return out


compensate_frame_jit = jax.jit(compensate_frame)
