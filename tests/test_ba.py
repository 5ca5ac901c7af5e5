"""Tests for the Schur-complement Levenberg-Marquardt bundle adjustment."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ba.schur_lm import BAProblem, ba_solve, ba_solve_grid, robust_cost
from pmv_tpu.core import geometry as geo

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def make_window(rng, P=5, L=120, noise=0.0, pose_err=0.02, lm_err=0.2):
    """Ground-truth BA window in the reference's conventions: world poses
    (R_i, t_i) with cameras looking along -z (pipeline world), landmarks in
    front of all cameras."""
    Rs, ts = [], []
    for i in range(P):
        yaw = 0.01 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        Rs.append(R)
        ts.append(np.array([0.1 * i, 0.0, -1.0 * i]))  # forward = -z
    Rs, ts = np.stack(Rs), np.stack(ts)
    # Landmarks ahead of the cameras (negative z, pipeline convention).
    X = np.stack(
        [rng.uniform(-15, 15, L), rng.uniform(-5, 5, L), rng.uniform(-40, -10, L)], -1
    )
    tr_gt = np.stack(
        [np.asarray(geo.pose_to_ba_params(jnp.asarray(Rs[i]), jnp.asarray(ts[i]))) for i in range(P)]
    )
    # Observations: every landmark seen in every frame.
    obs_uv, obs_pose, obs_lm = [], [], []
    for i in range(P):
        uv = np.asarray(
            geo.project_points(jnp.asarray(X), jnp.asarray(Rs[i]), jnp.asarray(ts[i]), jnp.asarray(K))
        )
        obs_uv.append(uv + (rng.normal(0, noise, uv.shape) if noise else 0))
        obs_pose.append(np.full(L, i))
        obs_lm.append(np.arange(L))
    obs_uv = np.concatenate(obs_uv)
    obs_pose = np.concatenate(obs_pose)
    obs_lm = np.concatenate(obs_lm)

    tr0 = tr_gt + rng.normal(0, pose_err, tr_gt.shape)
    # Monocular BA has a similarity gauge: pin TWO poses (6 DOF + scale) so
    # the optimum is unique and comparable to ground truth.
    tr0[0] = tr_gt[0]
    tr0[1] = tr_gt[1]
    X0 = X + rng.normal(0, lm_err, X.shape)
    pose_free = np.ones(P, bool)
    pose_free[0] = False
    pose_free[1] = False
    prob = BAProblem(
        tr=jnp.asarray(tr0),
        lm=jnp.asarray(X0),
        obs_uv=jnp.asarray(obs_uv),
        obs_pose=jnp.asarray(obs_pose, dtype=np.int32),
        obs_lm=jnp.asarray(obs_lm, dtype=np.int32),
        obs_mask=jnp.ones(len(obs_uv), bool),
        pose_free=jnp.asarray(pose_free),
        K=jnp.asarray(K),
    )
    return prob, tr_gt, X


class TestBASolve:
    def test_noiseless_convergence_to_gt(self, rng):
        prob, tr_gt, X_gt = make_window(rng)
        tr, lm, stats = ba_solve(prob, iters=15)
        assert float(stats["cost"]) < 1e-6 * float(stats["cost0"])
        np.testing.assert_allclose(np.asarray(tr), tr_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lm), X_gt, atol=1e-3)

    def test_cost_monotone_nonincreasing(self, rng):
        prob, _, _ = make_window(rng, noise=0.5)
        _, _, stats = ba_solve(prob, iters=8)
        hist = np.asarray(stats["history"])
        assert (np.diff(hist) <= 1e-9).all()
        assert hist[-1] < float(stats["cost0"])

    def test_fixed_pose_untouched(self, rng):
        prob, tr_gt, _ = make_window(rng)
        tr, _, _ = ba_solve(prob, iters=5)
        np.testing.assert_array_equal(np.asarray(tr[0]), np.asarray(prob.tr[0]))

    def test_masked_observations_ignored(self, rng):
        prob, tr_gt, X_gt = make_window(rng)
        # corrupt 30% of observations but mask them out
        n = prob.obs_uv.shape[0]
        idx = rng.choice(n, n // 3, replace=False)
        uv = np.asarray(prob.obs_uv).copy()
        uv[idx] += 500.0
        mask = np.ones(n, bool)
        mask[idx] = False
        prob2 = prob._replace(obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask))
        tr, lm, stats = ba_solve(prob2, iters=15)
        np.testing.assert_allclose(np.asarray(tr), tr_gt, atol=1e-4)

    def test_huber_robust_to_outlier_obs(self, rng):
        prob, tr_gt, X_gt = make_window(rng, noise=0.3)
        n = prob.obs_uv.shape[0]
        idx = rng.choice(n, n // 20, replace=False)  # 5% gross outliers
        uv = np.asarray(prob.obs_uv).copy()
        uv[idx] += rng.uniform(30, 80, (len(idx), 2))
        prob2 = prob._replace(obs_uv=jnp.asarray(uv))
        tr, lm, stats = ba_solve(prob2, iters=10)
        # poses still near GT despite outliers (Huber downweights them)
        err = np.abs(np.asarray(tr)[1:, 3:] - tr_gt[1:, 3:]).max()
        assert err < 0.05, f"pose translation error {err}"

    def test_improves_perturbed_window(self, rng):
        """The headline behavior: BA reduces reprojection error of a
        perturbed window by orders of magnitude (the reference's slide-14
        improvement, Presentation.pdf)."""
        prob, _, _ = make_window(rng, noise=0.2, pose_err=0.05, lm_err=0.5)
        tr, lm, stats = ba_solve(prob, iters=5)
        assert float(stats["cost"]) < 0.05 * float(stats["cost0"])

    def test_unobserved_landmarks_not_moved(self, rng):
        prob, _, X_gt = make_window(rng)
        # add 10 extra landmarks with no observations
        extra = jnp.asarray(rng.normal(size=(10, 3)) * 100)
        lm_all = jnp.concatenate([prob.lm, extra])
        prob2 = prob._replace(lm=lm_all)
        _, lm_out, _ = ba_solve(prob2, iters=5)
        np.testing.assert_array_equal(np.asarray(lm_out[-10:]), np.asarray(extra))


class TestBASolveGrid:
    """ba_solve_grid (one-hot matmul assembly, the fused path's solver) must
    match ba_solve on the same window up to f32 summation-order noise."""

    def _gridify(self, prob, P=5):
        O = prob.obs_uv.shape[0]
        N = O // P
        return (
            prob.obs_uv.reshape(P, N, 2),
            prob.obs_lm.reshape(P, N),
            prob.obs_mask.reshape(P, N),
        )

    def test_matches_flat_solver(self, rng):
        prob, tr_gt, X_gt = make_window(rng, noise=0.3)
        uv, local, mask = self._gridify(prob)
        tr_f, lm_f, st_f = ba_solve(prob, iters=8)
        tr_g, lm_g, st_g = ba_solve_grid(
            prob.tr, prob.lm, uv, local, mask, prob.pose_free, prob.K, iters=8
        )
        np.testing.assert_allclose(np.asarray(tr_g), np.asarray(tr_f), atol=5e-4)
        np.testing.assert_allclose(np.asarray(lm_g), np.asarray(lm_f), atol=5e-3)
        np.testing.assert_allclose(
            float(st_g["cost0"]), float(st_f["cost0"]), rtol=1e-6
        )

    def test_masked_and_duplicate_locals_inert(self, rng):
        """Masked slots may carry arbitrary (clamped) local ids — they must
        not contribute, exactly like ba_solve's pad handling."""
        prob, tr_gt, _ = make_window(rng)
        uv, local, mask = self._gridify(prob)
        mask = np.asarray(mask).copy()
        local = np.asarray(local).copy()
        uv = np.asarray(uv).copy()
        mask[:, 40:60] = False
        local[:, 40:60] = local[:, 0:1]  # duplicate a live landmark's id
        uv[:, 40:60] += 1e6  # poison masked pixels
        tr_g, lm_g, _ = ba_solve_grid(
            prob.tr, prob.lm, jnp.asarray(uv), jnp.asarray(local),
            jnp.asarray(mask), prob.pose_free, prob.K, iters=15,
        )
        np.testing.assert_allclose(np.asarray(tr_g), tr_gt, atol=1e-4)

    def test_p10_window_matches_flat_solver(self, rng):
        """BASELINE config #2 shape (bundle_size=10): every Schur tensor
        doubles vs P=5 — S is (48,48) after gauge pins, W is (L,10,6,3).
        The grid assembly must still agree with the flat solver."""
        prob, tr_gt, X_gt = make_window(rng, P=10, noise=0.3)
        uv, local, mask = self._gridify(prob, P=10)
        tr_f, lm_f, st_f = ba_solve(prob, iters=8)
        tr_g, lm_g, st_g = ba_solve_grid(
            prob.tr, prob.lm, uv, local, mask, prob.pose_free, prob.K, iters=8
        )
        np.testing.assert_allclose(np.asarray(tr_g), np.asarray(tr_f), atol=5e-4)
        np.testing.assert_allclose(np.asarray(lm_g), np.asarray(lm_f), atol=5e-3)
        assert float(st_g["cost"]) < 0.05 * float(st_g["cost0"])

    def test_obs_gate(self, rng):
        prob, tr_gt, _ = make_window(rng)
        uv, local, mask = self._gridify(prob)
        uv = np.asarray(uv).copy()
        uv[:, 10:20] += 300.0  # corrupted associations
        tr_g, _, _ = ba_solve_grid(
            prob.tr, prob.lm, jnp.asarray(uv), local, mask,
            prob.pose_free, prob.K, iters=15, obs_gate_px=50.0,
        )
        np.testing.assert_allclose(np.asarray(tr_g), tr_gt, atol=1e-3)


def test_grid_assembly_chunked_matches_precomputed():
    """The landmark-chunked one-hot assembly (used when (P, N, L) is too
    big to materialize) must equal the precomputed-one-hot path exactly —
    each observation matches exactly one chunk, so the f32 sums are
    identical term-for-term."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmv_tpu.ba import schur_lm

    rng = np.random.default_rng(3)
    P, N, L = 4, 64, 48
    K = jnp.asarray(
        np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]], np.float32)
    )
    tr = jnp.asarray(rng.normal(0, 0.1, (P, 6)).astype(np.float32))
    lm = jnp.asarray(
        np.stack([rng.uniform(-5, 5, L), rng.uniform(-3, 3, L),
                  rng.uniform(-30, -10, L)], -1).astype(np.float32)
    )
    local = jnp.asarray(rng.integers(0, L, (P, N)), jnp.int32)
    obs_uv = jnp.asarray(rng.uniform(0, 64, (P, N, 2)).astype(np.float32))
    obs_mask = jnp.asarray(rng.random((P, N)) < 0.8)
    pose_free = jnp.asarray([False, True, True, True])

    onehot = (
        (local[..., None] == jnp.arange(L, dtype=jnp.int32))
        & obs_mask[..., None]
    ).astype(jnp.float32)
    a = schur_lm.assemble_blocks_grid(
        tr, lm, obs_uv, local, obs_mask, onehot, pose_free, K, 1.0
    )
    b = schur_lm.assemble_blocks_grid(
        tr, lm, obs_uv, local, obs_mask, None, pose_free, K, 1.0
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
