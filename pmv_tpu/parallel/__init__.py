from pmv_tpu.parallel import dist_ba, global_refine, mesh, multi_seq, pose_graph  # noqa: F401
