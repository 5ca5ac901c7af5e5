from pmv_tpu.parallel import dist_ba, mesh  # noqa: F401
