from pmv_tpu.frontend import corners, image, lucas_kanade  # noqa: F401
