from gme_tpu.parallel import mesh, data_parallel, spatial  # noqa: F401
