from gme_tpu.io import video, draw, writers  # noqa: F401
