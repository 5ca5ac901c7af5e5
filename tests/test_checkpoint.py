"""Checkpoint/resume round-trip tests."""

import numpy as np

from pmv_tpu.config import VOConfig
from pmv_tpu.io import synthetic
from pmv_tpu.pipeline.odometry import OdometryPipeline
from pmv_tpu.utils import checkpoint


def make_pipe(tmp_path, frames=10):
    seq = synthetic.make_sequence(n_frames=frames, shape=(96, 160), density=40, seed=3)
    paths = synthetic.write_kitti_layout(seq, tmp_path / "data")
    cfg = VOConfig(
        image_dir=paths["image_dir"],
        camera_calibration=paths["camera_calibration"],
        poses=paths["poses"],
        frames=frames, init_frames=2, min_tracked_features=150,
        tracked_features_tol=60, bundle_size=4, max_iterations=3,
        feature_capacity=256, map_capacity=1024, grid_rows=96, grid_cols=160,
        lk_window=15,
    )
    return OdometryPipeline(cfg)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        pipe = make_pipe(tmp_path)
        pipe.run()
        ck = tmp_path / "state.npz"
        checkpoint.save(pipe, ck)

        pipe2 = make_pipe(tmp_path)
        checkpoint.load(pipe2, ck)
        assert pipe2.init_offset == pipe.init_offset
        assert len(pipe2.t) == len(pipe.t)
        np.testing.assert_allclose(np.stack(pipe2.t), np.stack(pipe.t))
        np.testing.assert_allclose(
            np.asarray(pipe2.map.xyz), np.asarray(pipe.map.xyz)
        )
        assert len(pipe2.tables) == len(pipe.tables)
        np.testing.assert_array_equal(
            np.asarray(pipe2.tables[-1].valid), np.asarray(pipe.tables[-1].valid)
        )
        # restored pipeline computes identical error metrics
        pipe2._compute_errors()
        pipe._compute_errors()
        np.testing.assert_allclose(pipe2.errors_t, pipe.errors_t)
