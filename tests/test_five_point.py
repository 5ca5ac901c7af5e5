"""Tests for the Nister five-point minimal solver."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.core import geometry as geo
from pmv_tpu.solvers import essential, five_point
from test_solvers import K, make_two_view


def essential_error(E_est, E_gt):
    """Distance between essential matrices up to scale and sign."""
    a = np.asarray(E_est) / np.linalg.norm(E_est)
    b = np.asarray(E_gt) / np.linalg.norm(E_gt)
    return min(np.abs(a - b).max(), np.abs(a + b).max())


class TestFivePointMinimal:
    def test_exact_recovery_from_5_points(self, rng):
        tv = make_two_view(rng, n=5)
        x1 = essential.normalize_points(jnp.asarray(tv["uv1"]), jnp.asarray(K))
        x2 = essential.normalize_points(jnp.asarray(tv["uv2"]), jnp.asarray(K))
        Es, ok = five_point.five_point_candidates(x1, x2)
        E_gt = np.asarray(geo.hat(jnp.asarray(tv["t"]))) @ tv["R"]
        errs = [
            essential_error(Es[i], E_gt)
            for i in range(10)
            if bool(ok[i])
        ]
        assert len(errs) >= 1
        assert min(errs) < 5e-3, f"best candidate error {min(errs)}"

    def test_candidates_satisfy_epipolar_constraint(self, rng):
        tv = make_two_view(rng, n=5, noise=0.0)
        x1 = essential.normalize_points(jnp.asarray(tv["uv1"]), jnp.asarray(K))
        x2 = essential.normalize_points(jnp.asarray(tv["uv2"]), jnp.asarray(K))
        Es, ok = five_point.five_point_candidates(x1, x2)
        for i in range(10):
            if not bool(ok[i]):
                continue
            err = np.asarray(essential.sampson_error(Es[i], x1, x2))
            assert err.max() < 1e-6, f"candidate {i} violates constraints: {err.max()}"
            # essential matrix structure: det = 0
            assert abs(np.linalg.det(np.asarray(Es[i]))) < 1e-5


class TestFivePointRansac:
    def test_clean_recovery(self, rng):
        tv = make_two_view(rng, n=100)
        key = jax.random.PRNGKey(0)
        E, inl = five_point.find_essential_5pt_ransac(
            jnp.asarray(tv["uv1"]), jnp.asarray(tv["uv2"]),
            jnp.ones(100, bool), jnp.asarray(K), key, n_hypos=32,
        )
        assert int(inl.sum()) >= 95
        R, t, X, front = essential.recover_pose(
            E, jnp.asarray(tv["uv1"]), jnp.asarray(tv["uv2"]), inl, jnp.asarray(K)
        )
        np.testing.assert_allclose(np.asarray(R), tv["R"], atol=1e-3)
        assert abs(np.dot(np.asarray(t), tv["t"])) > 0.9999

    def test_outliers(self, rng):
        tv = make_two_view(rng, n=150, n_outliers=45, noise=0.3)
        key = jax.random.PRNGKey(1)
        E, inl = five_point.find_essential_5pt_ransac(
            jnp.asarray(tv["uv1"]), jnp.asarray(tv["uv2"]),
            jnp.ones(150, bool), jnp.asarray(K), key, n_hypos=64, thresh_px=1.5,
        )
        inl_np = np.asarray(inl)
        assert inl_np[~tv["outlier"]].mean() > 0.85
        R, t, _, _ = essential.recover_pose(
            E, jnp.asarray(tv["uv1"]), jnp.asarray(tv["uv2"]), inl, jnp.asarray(K)
        )
        assert abs(np.dot(np.asarray(t), tv["t"])) > 0.995
