from gme_tpu.pipeline import results  # noqa: F401
