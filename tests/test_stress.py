"""Hardened-scenario tests: sharp turns, occlusions, photometric noise.

VERDICT round-1 item 4c: the smooth bench corridor never exercised the
motion gate or the reseed path the way KITTI 07's corners and traffic do.
These tests run the stress profile of pmv_tpu.io.synthetic and assert the
resilience mechanisms actually fire and hold the trajectory together.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.config import VOConfig
from pmv_tpu.io import synthetic
from pmv_tpu.pipeline.odometry import OdometryPipeline


def stress_cfg(paths, seed=11, **overrides):
    kw = dict(
        image_dir=paths["image_dir"],
        camera_calibration=paths["camera_calibration"],
        poses=paths["poses"],
        frames=40, init_frames=2, min_tracked_features=200,
        tracked_features_tol=80, bundle_size=5, max_iterations=3,
        feature_capacity=256, map_capacity=4096,
        grid_rows=128, grid_cols=256, lk_window=15, chunk_frames=1,
        seed=seed, traj_cap=64,
    )
    kw.update(overrides)
    return VOConfig(**kw)


def make_stress_seq(tmp_path, seed=11):
    seq = synthetic.make_sequence(
        n_frames=40, shape=(128, 256), density=80, seed=seed,
        turn_every=12, turn_len=8, turn_yaw=0.05,
        occluders=2, noise_std=3.0, flicker=0.1,
    )
    return synthetic.write_kitti_layout(seq, tmp_path / f"stress{seed}")


def ate_of(pipe):
    gt = pipe.gt_t.copy()
    gt[:, 2] *= -1
    off = pipe.init_offset
    t_est = np.stack(pipe.t)
    n = min(len(t_est), len(gt) - off)
    rel = (t_est[1:n] - t_est[0]) - (gt[off + 1 : off + n] - gt[off])
    return float(np.sqrt(np.mean(np.sum(rel**2, axis=1))))


class TestStressScenario:
    def test_mechanisms_fire_and_hold_ate(self, tmp_path, monkeypatch):
        """On the combined stress profile the reseed path and the motion
        gate must both trigger, and the trajectory must stay bounded."""
        from pmv_tpu.pipeline import heuristics, steps
        import pmv_tpu.pipeline.odometry as od

        paths = make_stress_seq(tmp_path)
        counts = {"reseed": 0, "gate_reject": 0}
        orig_reseed = steps.reseed_step

        def spy_reseed(*a, **k):
            counts["reseed"] += 1
            return orig_reseed(*a, **k)

        orig_gate = heuristics.motion_gate

        def spy_gate(*a, **k):
            out = orig_gate(*a, **k)
            if not bool(out[4]):
                counts["gate_reject"] += 1
            return out

        monkeypatch.setattr(steps, "reseed_step", spy_reseed)
        monkeypatch.setattr(od, "motion_gate", spy_gate)

        pipe = OdometryPipeline(stress_cfg(paths, ba_obs_gate_px=4.0))
        res = pipe.run_modular()
        assert res["frames"] == 40
        assert counts["reseed"] >= 2, counts
        assert counts["gate_reject"] >= 2, counts
        ate = ate_of(pipe)
        # 39 m trajectory with moving occluders + sensor noise + corners:
        # bounded, not divergent (measured ~10 m; divergent runs reach 90+).
        assert ate < 20.0, ate

    def test_ba_divergence_contained(self, tmp_path):
        """Seed 13 was the measured worst case: moving-occluder landmarks
        dragged the un-gated window BA to ATE ~94 m. Two independent
        defenses now hold it: the f32 LM gauge hygiene in schur_solve
        (scale-aware Tikhonov + lam floor) contains the un-gated run to
        ~8 m by itself, and the initial-residual observation gate
        (ba_obs_gate_px) stays bounded on top of it. Both must remain far
        from the divergent regime."""
        paths = make_stress_seq(tmp_path, seed=13)
        ungated = OdometryPipeline(stress_cfg(paths, seed=13))
        ungated.run_modular()
        ate_ungated = ate_of(ungated)

        gated = OdometryPipeline(stress_cfg(paths, seed=13, ba_obs_gate_px=4.0))
        gated.run_modular()
        ate_gated = ate_of(gated)

        assert ate_ungated < 25.0, ate_ungated
        assert ate_gated < 25.0, ate_gated


class TestObsGateUnit:
    def test_gate_drops_corrupted_observations(self):
        """ba_solve with obs_gate_px must recover poses when a block of
        observations is displaced (simulating tracks stuck on a moving
        object), where the un-gated solve is dragged away."""
        from test_ba import make_window
        from pmv_tpu.ba.schur_lm import ba_solve

        rng = np.random.default_rng(3)
        prob, tr_gt, X_gt = make_window(rng, P=5, L=64, noise=0.05)
        # corrupt a scattered 25% of observations with a large coherent
        # shift; the gate must sit above the initial-residual noise floor
        # (lm_err=0.2 m at ~20 m depth ~ 7 px) and below the corruption
        uv = np.asarray(prob.obs_uv).copy()
        bad = rng.choice(len(uv), len(uv) // 4, replace=False)
        uv[bad] += 60.0
        prob = prob._replace(obs_uv=jnp.asarray(uv))

        tr_plain, _, _ = ba_solve(prob, iters=8)
        tr_gated, _, _ = ba_solve(prob, iters=8, obs_gate_px=20.0)
        err_plain = float(np.abs(np.asarray(tr_plain) - tr_gt).max())
        err_gated = float(np.abs(np.asarray(tr_gated) - tr_gt).max())
        assert err_gated < 0.05, err_gated
        assert err_gated < err_plain, (err_gated, err_plain)
