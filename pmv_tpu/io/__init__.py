from pmv_tpu.io import kitti, png, synthetic  # noqa: F401
