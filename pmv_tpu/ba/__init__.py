from pmv_tpu.ba import schur_lm  # noqa: F401
