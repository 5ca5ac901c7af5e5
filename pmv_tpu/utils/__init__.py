from pmv_tpu.utils import profiling  # noqa: F401
