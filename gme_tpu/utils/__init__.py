from gme_tpu.utils import profiling  # noqa: F401
