from pmv_tpu.viz import render, video  # noqa: F401
