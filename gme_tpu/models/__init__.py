from gme_tpu.models import gme, hierarchical_bbme  # noqa: F401
