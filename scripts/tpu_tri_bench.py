"""Decompose the ~4.5 ms taken-tri-branch event cost on the real chip.

tpu_cond_attrib measured each taken five-point bootstrap at ~4.5 ms. This
bench splits it: 5pt RANSAC (polynomial solve + Sampson scoring + 8-point
refit), recover_pose (4x candidate triangulation — each a batched (N,4,4)
DLT EIGENDECOMPOSITION, the prime TPU suspect), triangulate_points alone,
a closed-form 3x3 inhomogeneous-DLT alternative, and
register_triangulated. Scan-differenced (C iterations inside one jit)
so the tunnel's per-dispatch overhead cancels.

Usage: python scripts/tpu_tri_bench.py   (idle host!)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pmv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

C = int(os.environ.get("PROF_CHUNK", "32"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))
N = 512


def main() -> None:
    from pmv_tpu.core import geometry as geo
    from pmv_tpu.solvers import essential
    from pmv_tpu.solvers.five_point import (
        find_essential_5pt_ransac,
        five_point_candidates,
        ransac_budget,
    )

    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}", flush=True)
    rng = np.random.default_rng(0)
    K = jnp.asarray(
        np.array([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]], np.float32)
    )
    # A realistic correspondence pair: forward motion, noise, 20% outliers.
    X = np.stack(
        [rng.uniform(-20, 20, N), rng.uniform(-5, 5, N), rng.uniform(8, 60, N)], -1
    )
    R_gt = np.eye(3, dtype=np.float64)
    t_gt = np.array([0.02, 0.01, 1.0])
    x1w = X
    x2w = (X - t_gt) @ R_gt
    uv1 = x1w[:, :2] / x1w[:, 2:] * 718.856 + np.array([607.19, 185.2])
    uv2 = x2w[:, :2] / x2w[:, 2:] * 718.856 + np.array([607.19, 185.2])
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    out_idx = rng.choice(N, N // 5, replace=False)
    uv2[out_idx] += rng.uniform(-40, 40, (len(out_idx), 2))
    p1 = jnp.asarray(uv1, jnp.float32)
    p2 = jnp.asarray(uv2, jnp.float32)
    valid = jnp.ones((N,), bool)
    budget = ransac_budget(256)

    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(7), C)))

    def scan(fn):
        def body(c, key):
            return c + fn(key), 0
        return jax.jit(lambda ks: lax.scan(body, jnp.float32(0), ks)[0])

    def best_of(fn, args):
        out = fn(*args)
        np.asarray(out)
        best = np.inf
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def s_base(key):
        return jax.random.uniform(key)

    def s_5pt(key):
        E, inl = find_essential_5pt_ransac(
            p1, p2, valid, K, key, n_hypos=budget, thresh_px=1.0
        )
        return E[0, 0] + jnp.sum(inl).astype(jnp.float32)

    def s_5pt_cands_only(key):
        # the polynomial solves alone (no scoring/refit): budget samples
        from pmv_tpu.solvers.ransac import sample_minimal_sets

        x1 = essential.normalize_points(p1, K)
        x2 = essential.normalize_points(p2, K)
        idx = sample_minimal_sets(key, valid, budget, 5)
        Es, ok = jax.vmap(lambda i: five_point_candidates(x1[i], x2[i]))(idx)
        return jnp.sum(Es) + jnp.sum(ok).astype(jnp.float32)

    # One fixed E for the downstream stages.
    E_fix, _ = find_essential_5pt_ransac(
        p1, p2, valid, K, jax.random.PRNGKey(0), n_hypos=budget, thresh_px=1.0
    )
    E_fix = jax.device_put(np.asarray(E_fix))

    def s_recover(key):
        R_d, t_u, X_tri, front = essential.recover_pose(E_fix, p1, p2, valid, K)
        return R_d[0, 0] + t_u[0] + jnp.sum(X_tri) + jax.random.uniform(key)

    x1n = essential.normalize_points(p1, K)
    x2n = essential.normalize_points(p2, K)
    R_c = jnp.eye(3)
    t_c = jnp.asarray(np.array([0.0, 0.0, -1.0], np.float32))

    def s_tri_dlt(key):
        Xt = essential.triangulate_points(R_c, t_c, x1n, x2n)
        return jnp.sum(Xt) + jax.random.uniform(key)

    def s_tri_3x3(key):
        # Inhomogeneous DLT: fix w=1, solve the 4x3 LS via 3x3 normal
        # equations closed form (adjugate) — no eigendecomposition.
        P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P2 = jnp.concatenate([R_c, t_c[:, None]], axis=1)

        def rows(P, x):
            r1 = x[..., 0:1] * P[2][None, :] - P[0][None, :]
            r2 = x[..., 1:2] * P[2][None, :] - P[1][None, :]
            return r1, r2

        a1, a2 = rows(P1, x1n)
        a3, a4 = rows(P2, x2n)
        A = jnp.stack([a1, a2, a3, a4], axis=-2)  # (N, 4, 4)
        M = A[..., :3]
        b = -A[..., 3]
        AtA = jnp.einsum("nij,nik->njk", M, M)
        Atb = jnp.einsum("nij,ni->nj", M, b)
        # 3x3 solve by adjugate
        a, bb, c = AtA[..., 0, :], AtA[..., 1, :], AtA[..., 2, :]
        det = (
            a[..., 0] * (bb[..., 1] * c[..., 2] - bb[..., 2] * c[..., 1])
            - a[..., 1] * (bb[..., 0] * c[..., 2] - bb[..., 2] * c[..., 0])
            + a[..., 2] * (bb[..., 0] * c[..., 1] - bb[..., 1] * c[..., 0])
        )
        det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
        inv = jnp.stack(
            [
                bb[..., 1] * c[..., 2] - bb[..., 2] * c[..., 1],
                a[..., 2] * c[..., 1] - a[..., 1] * c[..., 2],
                a[..., 1] * bb[..., 2] - a[..., 2] * bb[..., 1],
                bb[..., 2] * c[..., 0] - bb[..., 0] * c[..., 2],
                a[..., 0] * c[..., 2] - a[..., 2] * c[..., 0],
                a[..., 2] * bb[..., 0] - a[..., 0] * bb[..., 2],
                bb[..., 0] * c[..., 1] - bb[..., 1] * c[..., 0],
                a[..., 1] * c[..., 0] - a[..., 0] * c[..., 1],
                a[..., 0] * bb[..., 1] - a[..., 1] * bb[..., 0],
            ],
            axis=-1,
        ).reshape(AtA.shape)
        Xt = jnp.einsum("njk,nk->nj", inv, Atb) / det[..., None]
        return jnp.sum(Xt) + jax.random.uniform(key)

    variants = [
        ("scan control       ", s_base),
        ("5pt RANSAC full    ", s_5pt),
        ("5pt candidates only", s_5pt_cands_only),
        ("recover_pose (4tri)", s_recover),
        ("triangulate eigh   ", s_tri_dlt),
        ("triangulate 3x3 cf ", s_tri_3x3),
    ]
    t0 = None
    for name, fn in variants:
        t = best_of(scan(fn), (keys,))
        if t0 is None:
            t0 = t
            print(f"{name}: {t / C * 1e3:7.3f} ms/it", flush=True)
        else:
            print(f"{name}: {(t - t0) / C * 1e3:7.3f} ms/it", flush=True)

    # accuracy cross-check of the 3x3 closed form vs the eigh DLT
    Xa = np.asarray(essential.triangulate_points(R_c, t_c, x1n, x2n))
    import jax.random as jr

    Xb_sum = None
    # re-evaluate s_tri_3x3's math directly for comparison
    # (reuse by calling the body once)
    def tri3(x1n, x2n):
        P2 = jnp.concatenate([R_c, t_c[:, None]], axis=1)
        P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

        def rows(P, x):
            return (
                x[..., 0:1] * P[2][None, :] - P[0][None, :],
                x[..., 1:2] * P[2][None, :] - P[1][None, :],
            )

        a1, a2 = rows(P1, x1n)
        a3, a4 = rows(P2, x2n)
        A = jnp.stack([a1, a2, a3, a4], axis=-2)
        M, b = A[..., :3], -A[..., 3]
        AtA = jnp.einsum("nij,nik->njk", M, M)
        Atb = jnp.einsum("nij,ni->nj", M, b)
        return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]

    Xb = np.asarray(tri3(x1n, x2n))
    good = np.abs(Xa[:, 2]) < 100
    print(
        "3x3-vs-eigh max |dX| on sane-depth points:",
        float(np.abs(Xa[good] - Xb[good]).max()),
    )


if __name__ == "__main__":
    main()
