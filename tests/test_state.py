"""Tests for the static-shape state tables (pmv_tpu.core.state)."""

import jax.numpy as jnp
import numpy as np

from pmv_tpu.core.state import FeatureTable, MapState, has_neighbor


class TestFeatureTable:
    def test_empty_counts(self):
        ft = FeatureTable.empty(16)
        assert int(ft.num_valid()) == 0
        assert ft.capacity == 16

    def test_count_3d_respects_alive_mask(self):
        ft = FeatureTable.empty(8)
        ft = ft._replace(
            valid=ft.valid.at[:4].set(True),
            landmark=ft.landmark.at[:4].set(jnp.array([0, 1, 2, -1], jnp.int32)),
        )
        alive = jnp.array([True, False, True, True])
        # features 0 and 2 bound to alive landmarks; 1 dead; 3 unbound
        assert int(ft.count_3d(alive)) == 2


class TestMapState:
    def test_insert_and_slots(self):
        m = MapState.empty(8)
        pts = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
        mask = jnp.array([True, False, True, True])
        m2, slots = m.insert(pts, mask)
        assert slots.tolist() == [0, -1, 1, 2]
        assert int(m2.head) == 3
        assert m2.alive[:3].tolist() == [True, True, True]
        np.testing.assert_allclose(m2.xyz[0], pts[0])
        np.testing.assert_allclose(m2.xyz[1], pts[2])
        np.testing.assert_allclose(m2.xyz[2], pts[3])

    def test_ring_wrap(self):
        m = MapState.empty(4)
        pts = jnp.ones((3, 3))
        m, _ = m.insert(pts, jnp.array([True] * 3))
        m, slots = m.insert(2 * pts, jnp.array([True] * 3))
        assert slots.tolist() == [3, 0, 1]
        assert int(m.head) == 2

    def test_kill(self):
        m = MapState.empty(4)
        m, slots = m.insert(jnp.ones((3, 3)), jnp.array([True] * 3))
        m = m.kill(slots, jnp.array([True, False, True]))
        assert m.alive.tolist() == [False, True, False, False]

    def test_kill_ignores_negative_slots(self):
        m = MapState.empty(4)
        m, _ = m.insert(jnp.ones((2, 3)), jnp.array([True, True]))
        m = m.kill(jnp.array([-1, 0]), jnp.array([True, True]))
        assert m.alive.tolist() == [False, True, False, False]

    def test_update_points(self):
        m = MapState.empty(4)
        m, slots = m.insert(jnp.zeros((2, 3)), jnp.array([True, True]))
        new_pts = jnp.array([[1.0, 2, 3], [4, 5, 6]])
        m = m.update_points(slots, new_pts, jnp.array([True, False]))
        np.testing.assert_allclose(m.xyz[0], [1, 2, 3])
        np.testing.assert_allclose(m.xyz[1], [0, 0, 0])


class TestHasNeighbor:
    def test_chebyshev_semantics(self):
        existing = jnp.array([[10.0, 10.0], [50.0, 50.0]])
        valid = jnp.array([True, False])
        new = jnp.array([[14.0, 10.0], [15.0, 10.0], [50.0, 50.0]])
        got = has_neighbor(new, existing, valid, dist=5)
        # (14,10): cheb dist 4 < 5 -> neighbor; (15,10): 5 not < 5 -> no;
        # (50,50): only matches an invalid feature -> no
        assert got.tolist() == [True, False, False]
