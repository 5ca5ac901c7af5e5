from pmv_tpu.solvers import essential, pnp, ransac  # noqa: F401
