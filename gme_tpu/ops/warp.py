"""Motion compensation (block warp).

Replaces the reference's per-pixel Python warp loop (reference
motion.py:289-321).  Boundary semantics are preserved exactly:

- block size is derived from the frame/field *row* ratio
  (motion.py:303: bs = frame.shape[0] // motion_field.shape[0]);
- source pixel = (r - d[1], c - d[0]) (X=1 is the row shift, Y=0 the column
  shift — motion.py:299-300, 312-313);
- negative source indices are rejected (the reference's `assert > -1`) and
  out-of-range positive indices raise-and-skip — in both cases the output
  pixel keeps the ORIGINAL frame value (motion.py:311-318);
- pixels beyond the field's coverage (bottom/right remainders) keep their
  original value.

Three implementations, bit-identical (asserted in tests/test_warp.py):

- a vectorised per-pixel gather (the portable path — CPU backends lower 2D
  gathers well; XLA on TPU lowers the arbitrary 2D gather to a slow
  per-element sequence, measured 14.4 ms/pair at 720p on a v5e);
- an XLA MXU formulation (`_warped_covered_mxu`, the pre-Pallas TPU path,
  kept as a verification twin): per-block-column row gather + one-hot
  column-select matmul — ~300 MB of gathered-row intermediates at 720p,
  measured ~1.2 ms/pair;
- the production TPU path, a Pallas kernel
  (`pallas_kernels.warp_block_field`): the frame stays VMEM-resident and
  each block row costs two exact one-hot MXU matmuls (row select, then
  batched column select) — HBM traffic is one frame read + one output
  write, measured ~0.3 ms/pair at 720p.  Frame values are 0..255 integers —
  exact in bfloat16, and each one-hot row selects exactly one product, so
  the matmuls are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _warped_covered_gather(frame, d, bs, cov_h, cov_w):
    """(cov_h, cov_w) warped pixels via one per-pixel 2D gather (no OOB
    masking — the caller applies it)."""
    H, W = frame.shape
    d_px = jnp.repeat(jnp.repeat(d, bs, axis=0), bs, axis=1)  # (cov_h, cov_w, 2)
    rr = jnp.arange(cov_h, dtype=jnp.int32)[:, None]
    cc = jnp.arange(cov_w, dtype=jnp.int32)[None, :]
    gr = jnp.clip(rr - d_px[..., 1], 0, H - 1)
    gc = jnp.clip(cc - d_px[..., 0], 0, W - 1)
    return frame[gr, gc]


def _warped_covered_mxu(frame, d, bs, cov_h, cov_w):
    """(cov_h, cov_w) warped pixels via row gather + one-hot column matmul.

    Per block column: the row shift is a gather along axis 0 (fast on TPU),
    and the column shift selects, for each of the column's `bs` output
    lanes, one source column — a (nbh, bs_rows, W) x (nbh, W, bs_cols)
    batched matmul against a 0/1 one-hot built from an iota compare.  Exact
    for uint8 pixel values (see module docstring)."""
    H, W = frame.shape
    nbh, nbw = d.shape[:2]
    f32 = frame.astype(jnp.float32)
    dy, dx = d[..., 1], d[..., 0]  # (nbh, nbw) row / column shifts
    rows_i = jnp.arange(cov_h, dtype=jnp.int32)
    cols_j = jnp.arange(bs, dtype=jnp.int32)
    warr = jnp.arange(W, dtype=jnp.int32)

    def per_bc(bc):
        dyc = jnp.repeat(dy[:, bc], bs)  # (cov_h,) per-pixel row shift
        src_r = jnp.clip(rows_i - dyc, 0, H - 1)
        rows_g = f32[src_r, :]  # (cov_h, W) row gather
        tgt = bc * bs + cols_j[None, :] - dx[:, bc][:, None]  # (nbh, bs)
        tgtc = jnp.clip(tgt, 0, W - 1)
        oh = (tgtc[:, None, :] == warr[None, :, None]).astype(jnp.float32)
        bands = rows_g.reshape(nbh, bs, W)
        return jnp.einsum(
            "niw,nwj->nij", bands, oh, preferred_element_type=jnp.float32
        )  # (nbh, bs, bs)

    outs = jax.vmap(per_bc)(jnp.arange(nbw))  # (nbw, nbh, bs, bs)
    blocks = outs.transpose(1, 2, 0, 3).reshape(cov_h, cov_w)
    return blocks.astype(frame.dtype)


def compensate_frame(frame: jnp.ndarray, motion_field: jnp.ndarray) -> jnp.ndarray:
    """Warp `frame` by the per-block `motion_field`.

    Args:
        frame: (H, W) uint8 frame.
        motion_field: (nbh, nbw, 2) int field; channel 0 = column shift,
            channel 1 = row shift.

    Returns:
        (H, W) uint8 compensated frame.

    Note: the gather/MXU dispatch keys off `jax.default_backend()` at TRACE
    time, not the device the computation ultimately runs on (e.g.
    `jit(..., device=cpu)` on a TPU host still picks the MXU path).  Both
    paths are bit-identical, so a mismatch is performance-only.
    """
    H, W = frame.shape
    nbh, nbw = motion_field.shape[:2]
    bs = H // nbh
    cov_h, cov_w = nbh * bs, nbw * bs  # region covered by the field

    d = motion_field.astype(jnp.int32)
    if jax.default_backend() == "tpu":
        from gme_tpu.ops.pallas_kernels import warp_block_field

        warped = warp_block_field(frame, d, bs)
    else:
        warped = _warped_covered_gather(frame, d, bs, cov_h, cov_w)

    # Reference OOB semantics: a pixel whose source falls outside the frame
    # keeps its original value (motion.py:311-318).
    d_px = jnp.repeat(jnp.repeat(d, bs, axis=0), bs, axis=1)
    rr = jnp.arange(cov_h, dtype=jnp.int32)[:, None]
    cc = jnp.arange(cov_w, dtype=jnp.int32)[None, :]
    src_r = rr - d_px[..., 1]
    src_c = cc - d_px[..., 0]
    valid = (src_r >= 0) & (src_c >= 0) & (src_r < H) & (src_c < W)
    covered = jnp.where(valid, warped, frame[:cov_h, :cov_w])

    if cov_h == H and cov_w == W:
        return covered
    out = frame
    out = out.at[:cov_h, :cov_w].set(covered)
    return out


compensate_frame_jit = jax.jit(compensate_frame)
