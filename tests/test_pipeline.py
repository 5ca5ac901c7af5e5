"""End-to-end pipeline tests on synthetic ground-truthed sequences.

The reference has no tests; its de-facto regression artifact is the
trajectory-error file computed against KITTI ground truth
(OdometryPipeline.cpp:267-296). These tests reproduce that loop in miniature:
synthetic sequence -> disk KITTI layout -> full pipeline -> error metrics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.config import VOConfig
from pmv_tpu.core.state import FeatureTable, MapState
from pmv_tpu.io import synthetic
from pmv_tpu.pipeline import steps
from pmv_tpu.pipeline.heuristics import motion_gate
from pmv_tpu.pipeline.odometry import OdometryPipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    seq = synthetic.make_sequence(
        n_frames=30, shape=(192, 512), density=80, speed=1.0, yaw_rate=0.002, seed=7
    )
    out = tmp_path_factory.mktemp("kitti")
    paths = synthetic.write_kitti_layout(seq, out)
    return seq, paths


def make_cfg(paths, **kw):
    defaults = dict(
        image_dir=paths["image_dir"],
        camera_calibration=paths["camera_calibration"],
        poses=paths["poses"],
        camera=0,
        frames=30,
        init_frames=3,
        min_tracked_features=300,
        tracked_features_tol=100,
        bundle_size=5,
        max_iterations=5,
        feature_capacity=512,
        map_capacity=4096,
        grid_rows=96,
        grid_cols=128,
        lk_window=21,
        verbose=0,
        traj_cap=64,  # small device histories: CPU tests pay real time for
        # the default 2048-row trajectory + map-snapshot arrays
    )
    defaults.update(kw)
    return VOConfig(**defaults)


class TestMotionGate:
    def test_accepts_forward_motion(self):
        R_new, t_new, R_s, t_s, acc = motion_gate(
            jnp.eye(3), jnp.array([0.01, 0.02, -1.0]),
            jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3), jnp.float32(1.0),
        )
        assert bool(acc)
        np.testing.assert_allclose(np.asarray(t_new), [0.01, 0.02, -1.0], atol=1e-6)

    def test_rejects_backward_and_replays(self):
        prev_delta = np.array([0.0, 0.0, -0.9])
        R_new, t_new, R_s, t_s, acc = motion_gate(
            jnp.eye(3), jnp.array([0.0, 0.0, +1.0]),  # backward
            jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.asarray(prev_delta),
            jnp.float32(1.0),
        )
        assert not bool(acc)
        np.testing.assert_allclose(np.asarray(t_new), prev_delta, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_s), prev_delta, atol=1e-6)

    def test_rejects_oversized_step(self):
        _, _, _, _, acc = motion_gate(
            jnp.eye(3), jnp.array([0.0, 0.0, -5.0]),
            jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3), jnp.float32(1.0),
        )
        assert not bool(acc)  # |tz| >= 2*scale

    def test_rejects_sideways_dominant(self):
        _, _, _, _, acc = motion_gate(
            jnp.eye(3), jnp.array([1.0, 0.0, -0.5]),
            jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3), jnp.float32(1.0),
        )
        assert not bool(acc)


class TestReseed:
    def test_fills_free_slots_only(self, rng):
        from tests_helpers_blob import blob_image

        img = blob_image((96, 128), [(20, 20), (50, 40), (90, 70), (110, 30)])
        table = FeatureTable.empty(8)
        table = table._replace(
            xy=table.xy.at[0].set(jnp.array([20.0, 20.0], jnp.float32)),
            valid=table.valid.at[0].set(True),
            landmark=table.landmark.at[0].set(42),
        )
        out = steps.reseed_step(table, jnp.asarray(img), n_per_tile=8, tile_h=96, tile_w=128)
        # slot 0 untouched
        assert out.landmark[0] == 42
        assert bool(out.valid[0])
        np.testing.assert_allclose(np.asarray(out.xy[0]), [20, 20])
        # new corners landed in later slots, not near (20,20)
        new = np.asarray(out.xy[np.asarray(out.valid)])
        assert len(new) >= 3
        d = np.abs(new - [20.0, 20.0]).max(axis=1)
        assert (d[1:] >= 5).all()
        # fresh features have no landmark
        assert (np.asarray(out.landmark[np.asarray(out.valid)])[1:] == -1).all()


class TestEndToEnd:
    def test_pipeline_tracks_synthetic_trajectory(self, dataset):
        seq, paths = dataset
        cfg = make_cfg(paths)
        pipe = OdometryPipeline(cfg)
        result = pipe.run()
        assert result["frames"] >= 25
        # Trajectory should follow the z-flipped GT within a few meters over
        # a ~27 m run (bootstrap + PnP + gate + BA all working together).
        t_est = np.stack(pipe.t)
        gt = pipe.gt_t.copy()
        gt[:, 2] *= -1
        errs = [
            np.linalg.norm(t_est[i] - gt[i + pipe.init_offset])
            for i in range(1, len(t_est))
        ]
        mean_err = float(np.mean(errs))
        # Includes the reference metric's constant un-rebased init offset
        # (~init_offset meters); seed-to-seed spread is ~+-0.5 m.
        assert mean_err < 4.0, f"mean trajectory error {mean_err} m; tail {errs[-5:]}"

    def test_bundle_size_10_window(self, dataset):
        """BASELINE config #2 (bundle_size=10): the P=10 sliding window —
        doubled Schur shapes, cadence 10//3*2=6 — must run e2e through the
        fused path with accuracy comparable to P=5 on the same sequence.
        Match: CeresBundleAdjustment.cpp:7-8 (window = min(bundle_size,
        frame+1)).

        Runs in a fresh interpreter: compiling the P=10 chunk program after
        ~130 prior in-process XLA:CPU compilations segfaults the compiler
        deterministically on this host (backend_compile_and_load, observed
        twice at the same suite position), while the identical test alone
        passes in ~1 min. Until the XLA bug is isolated, the child process
        keeps the full lane green without dropping the coverage."""
        import os
        import subprocess
        import sys

        if os.environ.get("PMV_P10_CHILD") != "1":
            here = os.path.abspath(__file__)
            node = f"{here}::TestEndToEnd::test_bundle_size_10_window"
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-q", node],
                env=dict(os.environ, PMV_P10_CHILD="1"),
                cwd=os.path.dirname(os.path.dirname(here)),
                capture_output=True, text=True, timeout=900,
            )
            assert r.returncode == 0, (
                f"child P=10 e2e failed (rc={r.returncode}):\n"
                f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
            )
            return
        seq, paths = dataset
        cfg = make_cfg(paths, bundle_size=10, max_iterations=10)
        pipe = OdometryPipeline(cfg)
        result = pipe.run()
        assert result["frames"] >= 25
        t_est = np.stack(pipe.t)
        gt = pipe.gt_t.copy()
        gt[:, 2] *= -1
        errs = [
            np.linalg.norm(t_est[i] - gt[i + pipe.init_offset])
            for i in range(1, len(t_est))
        ]
        mean_err = float(np.mean(errs))
        assert mean_err < 4.0, f"P=10 mean trajectory error {mean_err} m"

    def test_error_file_format(self, dataset, tmp_path):
        seq, paths = dataset
        err_file = tmp_path / "error.txt"
        cfg = make_cfg(paths, error_path=str(err_file), frames=12, init_frames=2)
        pipe = OdometryPipeline(cfg)
        pipe.run()
        text = err_file.read_text()
        lines = text.strip().splitlines()
        keys = [l.split(":")[0] for l in lines]
        assert keys == [
            "Runtime", "R total", "R min", "R max", "R std",
            "t total", "t min", "t max", "t std",
        ]
        for l in lines:
            float(l.split(":")[1])  # every value parses


class TestMapHistoryAndLive:
    """Landmark-position snapshot history (StepState.map_hist) + the live
    during-run map — the drawMap read-at-draw-time semantics
    (OdometryPipeline.cpp:110-127, :423-425)."""

    def test_mid_run_snapshot_differs_from_final(self, dataset, tmp_path):
        seq, paths = dataset
        # video_path triggers the map_hist readback in run().
        cfg = make_cfg(paths, video_path=str(tmp_path / "out.avi"))
        pipe = OdometryPipeline(cfg)
        pipe.run()
        assert pipe.map_hist is not None and len(pipe.map_hist) > 2
        cad = pipe.map_hist_cadence
        final = np.asarray(pipe.map.xyz)
        alive = np.asarray(pipe.map.alive)
        k_last = len(pipe.t) - 1
        # The last written row must equal the final map exactly.
        last_row = min(k_last // cad, len(pipe.map_hist) - 1)
        np.testing.assert_array_equal(pipe.map_hist[last_row], final)
        # A mid-run frame's THEN-current positions must differ from the
        # final optimized positions for at least one of its live landmarks
        # (BA keeps refining them afterwards).
        k_mid = k_last // 2
        tbl = pipe.tables[k_mid]
        lm = np.asarray(tbl.landmark)
        bound = np.asarray(tbl.valid) & (lm >= 0)
        bound[bound] &= alive[lm[bound]]
        ids = lm[bound]
        assert ids.size > 0
        then = pipe.map_hist[min(k_mid // cad, len(pipe.map_hist) - 1)][ids]
        assert np.abs(then - final[ids]).max() > 1e-6, (
            "mid-run snapshot positions identical to final — history inert"
        )

    def test_replay_uses_snapshots(self, dataset, tmp_path):
        from pmv_tpu.viz.render import save_run_visuals

        seq, paths = dataset
        cfg = make_cfg(
            paths, video_path=str(tmp_path / "out.avi"), fancy_video=1,
            error_path=str(tmp_path / "err.txt"),
        )
        pipe = OdometryPipeline(cfg)
        pipe.run()
        artifacts = save_run_visuals(pipe, tmp_path)
        assert (tmp_path / "map.png").exists()
        assert "video" in artifacts

    def test_live_map_written(self, dataset, tmp_path):
        seq, paths = dataset
        cfg = make_cfg(
            paths, live_every=5, error_path=str(tmp_path / "err.txt")
        )
        pipe = OdometryPipeline(cfg)
        pipe.run()
        assert (tmp_path / "map_live.png").exists()

    def test_map_hist_off(self, dataset, tmp_path):
        seq, paths = dataset
        cfg = make_cfg(paths, map_hist=0, video_path=str(tmp_path / "o.avi"))
        pipe = OdometryPipeline(cfg)
        pipe.run()
        assert pipe.map_hist is None  # disabled: no readback, replay falls back


class TestFusedKnnHighDensity:
    """BASELINE.json config #3: high-density FAST+kNN through the FUSED
    loop (kNNFeatureMatcher.cpp:3-61, OpenCVFASTFeatureExtractor.cpp:4-22)."""

    def test_fused_knn_tracks(self, dataset):
        seq, paths = dataset
        cfg = make_cfg(paths, matcher="knn", extractor="fast")
        pipe = OdometryPipeline(cfg)
        result = pipe.run()
        assert result["frames"] >= 25
        t_est = np.stack(pipe.t)
        gt = pipe.gt_t.copy()
        gt[:, 2] *= -1
        errs = [
            np.linalg.norm(t_est[i] - gt[i + pipe.init_offset])
            for i in range(1, len(t_est))
        ]
        # Integer-corner kNN association is much coarser than subpixel LK;
        # the path must still produce a usable trajectory on the 27 m run.
        assert float(np.mean(errs)) < 8.0, f"mean err {np.mean(errs)}"

    def test_fused_knn_matches_modular_matcher(self, dataset):
        """The fused step's knn association must equal the modular
        knn_match call on the same pair."""
        import jax
        import jax.numpy as jnp

        from pmv_tpu.frontend import knn_matcher
        from pmv_tpu.frontend.corners import grid_extract
        from pmv_tpu.frontend.image import build_pyramid
        from pmv_tpu.pipeline import fused

        seq, paths = dataset
        cfg = make_cfg(paths, matcher="knn", extractor="fast")
        pipe = OdometryPipeline(cfg)
        init = [jnp.asarray(seq["images"][i]) for i in range(cfg.init_frames)]
        pipe.initialise([np.asarray(im) for im in init])
        img0 = init[pipe.init_offset]
        step_cfg = pipe._step_config(np.asarray(img0).shape)
        state = fused.init_state(
            pyr=tuple(build_pyramid(img0, step_cfg.lk_levels)),
            table=pipe.tables[0], map_state=pipe.map, cfg=step_cfg,
        )
        nxt_img = jnp.asarray(seq["images"][pipe.init_offset + 1], jnp.float32)
        key = jax.random.PRNGKey(0)
        s2, _, stats = fused.frame_step(
            state, nxt_img, jnp.float32(1.0), key, pipe.K, step_cfg
        )
        # Modular twin
        pyr_n = build_pyramid(nxt_img, step_cfg.lk_levels)
        kc_xy, _, kc_valid = grid_extract(
            pyr_n[0], step_cfg.knn_cand_per_tile,
            tile_h=step_cfg.tile_h, tile_w=step_cfg.tile_w,
            quality=step_cfg.quality, min_distance=step_cfg.min_distance,
            response=step_cfg.response,
        )
        ref = knn_matcher.knn_match(
            img0.astype(jnp.float32), pyr_n[0], pipe.tables[0], kc_xy, kc_valid,
            k=step_cfg.knn_k, window=step_cfg.knn_window,
            threshold=step_cfg.knn_threshold,
        )
        # Tracked positions agree for slots the fused step kept (it may
        # additionally reseed/bind landmarks afterwards).
        keep = np.asarray(ref.valid)
        np.testing.assert_array_equal(
            np.asarray(s2.table.xy)[keep], np.asarray(ref.xy)[keep]
        )
        assert int(stats["tracked"]) == int(ref.num_valid())

    @pytest.mark.slow  # ~3 min on the 2-core CPU mesh (L_win = P*2048 BA)
    def test_high_density_capacity_2048(self, dataset):
        """N=2048 feature slots + flat BA assembly path (the one-hot grid
        would be P*N*L_win > 32M elements) — pins BASELINE config #3's
        shapes end-to-end."""
        seq, paths = dataset
        cfg = make_cfg(
            paths, matcher="knn", extractor="fast",
            feature_capacity=2048, frames=14,
            min_tracked_features=1200, tracked_features_tol=100,
            reseed_tol=400,
        )
        pipe = OdometryPipeline(cfg)
        result = pipe.run()
        assert result["frames"] >= 10
        assert np.isfinite(np.stack(pipe.t)).all()
