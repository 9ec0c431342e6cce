from gme_tpu.ops import pyramid, bbme, affine, warp, metrics  # noqa: F401
