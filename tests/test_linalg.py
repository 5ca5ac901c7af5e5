"""Pivot-free Gauss-Jordan vs jnp.linalg.solve on damped-SPD systems."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.core.linalg import det3, gj_inverse, gj_solve


def _spd(rng, n, batch=()):
    A = rng.normal(size=batch + (n, n)).astype(np.float64)
    return A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(n)


def test_gj_solve_matches_linalg_solve():
    rng = np.random.default_rng(0)
    A = _spd(rng, 30)
    b = rng.normal(size=(30, 4))
    x = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-9)


def test_gj_solve_batched():
    rng = np.random.default_rng(1)
    A = _spd(rng, 12, batch=(128,))
    b = rng.normal(size=(128, 12, 1))
    x = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-8)


def test_gj_solve_pinned_identity_rows():
    """The Schur reduced system pins fixed poses as identity rows/cols with
    zero rhs — GJ must pass those through exactly."""
    rng = np.random.default_rng(2)
    n, free = 30, np.zeros(30, bool)
    free[6:] = True
    A = _spd(rng, 30)
    m = free.astype(np.float64)
    A = A * m[:, None] * m[None, :] + np.diag(1.0 - m)
    b = rng.normal(size=(30,)) * m
    x = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(b)[:, None]))[:, 0]
    ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-12)
    assert np.all(x[:6] == 0.0)


def test_gj_inverse():
    rng = np.random.default_rng(3)
    A = _spd(rng, 12, batch=(8,))
    inv = np.asarray(gj_inverse(jnp.asarray(A)))
    eye = np.broadcast_to(np.eye(12), (8, 12, 12))
    np.testing.assert_allclose(inv @ A, eye, atol=1e-8)


def test_gj_solve_f32_conditioning():
    """f32 accuracy on an LM-like system (condition ~1e4) stays ~1e-3
    relative — the same ballpark as pivoted LU in f32."""
    rng = np.random.default_rng(4)
    Q, _ = np.linalg.qr(rng.normal(size=(30, 30)))
    A = (Q * np.logspace(0, 4, 30)) @ Q.T + 1e-2 * np.eye(30)
    b = rng.normal(size=(30, 1))
    x = np.asarray(gj_solve(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
    ref = np.linalg.solve(A, b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 5e-3


def test_det3():
    rng = np.random.default_rng(5)
    M = rng.normal(size=(17, 3, 3))
    np.testing.assert_allclose(
        np.asarray(det3(jnp.asarray(M))), np.linalg.det(M), rtol=1e-10
    )


def test_gj_solve_under_jit_grad():
    """gj_solve must be differentiable (the GN polish sits under jacfwd in
    some callers' autodiff paths)."""
    A = jnp.asarray(_spd(np.random.default_rng(6), 6))

    def f(b):
        return jnp.sum(gj_solve(A, b[:, None]))

    g = jax.grad(f)(jnp.ones(6))
    ref = jnp.sum(jnp.linalg.inv(A), axis=0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-8)
