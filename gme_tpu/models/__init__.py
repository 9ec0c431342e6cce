from gme_tpu.models import direct, gme, hierarchical_bbme  # noqa: F401
