from pmv_tpu.core import geometry, state  # noqa: F401
