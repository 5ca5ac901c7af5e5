from pmv_tpu.pipeline import heuristics, odometry, steps  # noqa: F401
