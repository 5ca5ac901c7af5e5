"""Unit tests for pmv_tpu.core.geometry against hand-computed reference values.

The reference conventions under test are documented at Feature3D.cpp:18-33
(projection), CeresBundleAdjustment.cpp:26-34 (BA parameterization),
include/ProjectionResidual.h:38-58 (BA residual) and
include/OdometryPipeline.h:89-108 (yaw extraction).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.core import geometry as geo


def random_rotation(rng):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.1, 3.0)
    return np.asarray(geo.rodrigues(jnp.asarray(aa)))


class TestRodrigues:
    def test_identity(self):
        R = geo.rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_quarter_turn_z(self):
        aa = jnp.array([0.0, 0.0, np.pi / 2])
        R = geo.rodrigues(aa)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
        np.testing.assert_allclose(R, expected, atol=1e-12)

    def test_roundtrip(self, rng):
        for _ in range(50):
            aa = rng.normal(size=3)
            aa = aa / np.linalg.norm(aa) * rng.uniform(1e-8, 3.1)
            R = geo.rodrigues(jnp.asarray(aa))
            aa2 = geo.rodrigues_inv(R)
            np.testing.assert_allclose(aa2, aa, atol=1e-6)

    def test_roundtrip_near_pi(self, rng):
        aa = np.array([1.0, -2.0, 0.5])
        aa = aa / np.linalg.norm(aa) * (np.pi - 1e-6)
        R = geo.rodrigues(jnp.asarray(aa))
        R2 = geo.rodrigues(geo.rodrigues_inv(R))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_orthonormal(self, rng):
        aa = jnp.asarray(rng.normal(size=(16, 3)))
        R = geo.rodrigues(aa)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-12)


class TestAngleAxisRotate:
    def test_matches_matrix(self, rng):
        for _ in range(20):
            aa = rng.normal(size=3) * rng.uniform(0, 3)
            p = rng.normal(size=(7, 3))
            R = np.asarray(geo.rodrigues(jnp.asarray(aa)))
            got = geo.angle_axis_rotate(jnp.asarray(aa), jnp.asarray(p))
            np.testing.assert_allclose(got, p @ R.T, atol=1e-10)

    def test_tiny_angle(self):
        aa = jnp.array([1e-9, 0.0, 0.0])
        p = jnp.array([0.0, 1.0, 0.0])
        got = geo.angle_axis_rotate(aa, p)
        np.testing.assert_allclose(got, [0.0, 1.0, 1e-9], atol=1e-15)


class TestProjection:
    K = np.array([[718.856, 0.0, 607.1928], [0.0, 718.856, 185.2157], [0.0, 0.0, 1.0]])

    def test_reference_model_by_hand(self):
        # Hand-execute Feature3D.cpp:18-33 for a known case.
        R = np.eye(3)
        t = np.array([1.0, 2.0, 3.0])
        p = np.array([[2.0, 4.0, -1.0]])  # p - t = (1, 2, -4); z-flip -> z=4
        uv = geo.project_points(jnp.asarray(p), jnp.asarray(R), jnp.asarray(t), jnp.asarray(self.K))
        exp_u = 1.0 / 4.0 * self.K[0, 0] + self.K[0, 2]
        exp_v = 2.0 / 4.0 * self.K[1, 1] + self.K[1, 2]
        np.testing.assert_allclose(uv, [[exp_u, exp_v]], atol=1e-9)

    def test_magic_z_guard(self):
        # z == 0 after flip -> magic_z = 1 (Feature3D.cpp:29)
        R = np.eye(3)
        t = np.zeros(3)
        p = np.array([[3.0, 5.0, 0.0]])
        uv = geo.project_points(jnp.asarray(p), jnp.asarray(R), jnp.asarray(t), jnp.asarray(self.K))
        np.testing.assert_allclose(
            uv, [[3.0 * self.K[0, 0] + self.K[0, 2], 5.0 * self.K[1, 1] + self.K[1, 2]]]
        )

    def test_rotated_camera(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        pts = rng.normal(size=(11, 3)) * 10
        pc = (pts - t) @ R  # R^T (p - t)
        pc[:, 2] *= -1
        good = np.abs(pc[:, 2]) > 1e-3
        expected = np.stack(
            [
                pc[:, 0] / pc[:, 2] * self.K[0, 0] + self.K[0, 2],
                pc[:, 1] / pc[:, 2] * self.K[1, 1] + self.K[1, 2],
            ],
            axis=-1,
        )
        got = np.asarray(
            geo.project_points(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), jnp.asarray(self.K))
        )
        np.testing.assert_allclose(got[good], expected[good], atol=1e-8)

    def test_transform_roundtrip(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        pts = rng.normal(size=(5, 3))
        back = geo.transform(geo.transform_inv(jnp.asarray(pts), R, t), R, t)
        np.testing.assert_allclose(back, pts, atol=1e-10)


class TestBAParameterization:
    def test_roundtrip(self, rng):
        R = jnp.asarray(random_rotation(rng))
        t = jnp.asarray(rng.normal(size=3))
        params = geo.pose_to_ba_params(R, t)
        R2, t2 = geo.ba_params_to_pose(params)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-12)

    def test_ba_project_matches_projection(self, rng):
        """ProjectionResidual's model with tr=[aa(R^T), -t] must equal
        projectPoint's model (both implement R^T(p - t) with z-flip)."""
        K = jnp.asarray(TestProjection.K)
        R = jnp.asarray(random_rotation(rng))
        t = jnp.asarray(rng.normal(size=3))
        pts = jnp.asarray(rng.normal(size=(9, 3)) * 5 + np.array([0, 0, 20.0]))
        tr = geo.pose_to_ba_params(R, t)
        uv_ba = geo.ba_project(tr, pts, K)
        uv_proj = geo.project_points(pts, R, t, K)
        np.testing.assert_allclose(uv_ba, uv_proj, atol=1e-7)


class TestYaw:
    def test_yaw_sign_convention(self):
        # R[0,0]=cos, R[0,2]=sin of a y-rotation
        ang = 0.3
        Ry = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        # sin > 0 -> returns -acos(cos) without flip
        got = geo.calc_y_rotation(jnp.asarray(Ry))
        np.testing.assert_allclose(got, -ang, atol=1e-12)
        got_flip = geo.calc_y_rotation(jnp.asarray(Ry), flip=True)
        np.testing.assert_allclose(got_flip, ang, atol=1e-12)


class TestCompose:
    def test_compose_delta(self, rng):
        Rp = jnp.asarray(random_rotation(rng))
        tp = jnp.asarray(rng.normal(size=3))
        Rd = jnp.asarray(random_rotation(rng))
        td = jnp.asarray(rng.normal(size=3))
        Rn, tn = geo.compose_delta(Rp, tp, Rd, td)
        np.testing.assert_allclose(tn, np.asarray(Rp) @ np.asarray(td) + np.asarray(tp), atol=1e-12)
        np.testing.assert_allclose(Rn, np.asarray(Rd) @ np.asarray(Rp), atol=1e-12)


class TestHuber:
    def test_weights(self):
        r2 = jnp.array([0.25, 1.0, 4.0, 100.0])
        w = geo.huber_weight(r2, delta=1.0)
        np.testing.assert_allclose(w, [1.0, 1.0, 0.5, 0.1], atol=1e-12)
