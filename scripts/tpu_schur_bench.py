"""Scan-differenced decomposition of schur_solve's internals on chip.

tpu_stage_bench showed one LM iteration = assemble 0.17 ms + schur 0.60 ms,
and swapping the (30, 30) pivoted LU for Gauss-Jordan did not move it — the
wall is elsewhere in schur_solve. This bench times the cumulative stages:
damping -> V_inv -> Y -> S_corr/b_corr -> reduced solve -> back-substitution.

Usage: python scripts/tpu_schur_bench.py    (idle host!)
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

from pmv_tpu.ba.schur_lm import _inv3x3
from pmv_tpu.core.linalg import gj_solve

C = int(os.environ.get("PROF_CHUNK", "32"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))
P, L = 5, 1024
_PREC = jax.lax.Precision.HIGHEST


def best_of(fn, args, repeats=REPEATS):
    out = fn(*args)
    np.asarray(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}  P={P} L={L}")
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(P, 6, 6)).astype(np.float32))
    U = U @ jnp.swapaxes(U, -1, -2) + 10 * jnp.eye(6)
    V = jnp.asarray(rng.normal(size=(L, 3, 3)).astype(np.float32))
    V = V @ jnp.swapaxes(V, -1, -2) + 10 * jnp.eye(3)
    Wc = jnp.asarray(rng.normal(size=(L, P, 6, 3)).astype(np.float32)) * 0.1
    b_pose = jnp.asarray(rng.normal(size=(P, 6)).astype(np.float32))
    b_lm = jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32))
    has_obs = jnp.ones((L,), bool)
    pose_free = jnp.asarray([False, True, True, True, True])
    lam = jnp.float32(1e-4)
    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(1), C)))

    eyeP = jnp.eye(6, dtype=jnp.float32)
    eyeL = jnp.eye(3, dtype=jnp.float32)

    def staged(upto):
        def fn(key):
            # tiny key-dependent perturbation defeats loop-invariant hoisting
            j = jax.random.uniform(key)
            Uk = U + 1e-12 * j
            Vk = V + 1e-12 * j
            Wck = Wc + 1e-12 * j
            muP = 1e-6 * jnp.mean(jnp.abs(jnp.diagonal(Uk, axis1=-2, axis2=-1))) + 1e-9
            muV = (1e-6 * jnp.mean(jnp.abs(jnp.diagonal(Vk, axis1=-2, axis2=-1)), axis=-1) + 1e-9)[:, None, None]
            U_d = Uk + lam * (Uk * eyeP) + muP * eyeP
            V_d = Vk + lam * (Vk * eyeL) + muV * eyeL
            if upto == "damp":
                return jnp.sum(U_d) + jnp.sum(V_d) + j
            V_inv = _inv3x3(V_d)
            if upto == "vinv":
                return jnp.sum(V_inv) + j
            Y = jnp.einsum("lpij,ljk->lpik", Wck, V_inv, precision=_PREC)
            if upto == "y":
                return jnp.sum(Y) + j
            S_corr = jnp.einsum("lpik,lqjk->piqj", Y, Wck, precision=_PREC)
            b_corr = jnp.einsum("lpik,lk->pi", Y, b_lm, precision=_PREC)
            if upto == "scorr":
                return jnp.sum(S_corr) + jnp.sum(b_corr) + j
            S = jnp.zeros((P, 6, P, 6), jnp.float32)
            S = S.at[jnp.arange(P), :, jnp.arange(P), :].add(U_d)
            S = S - S_corr
            b_red = b_pose - b_corr
            m6 = jnp.repeat(pose_free, 6).astype(jnp.float32)
            S_flat = S.reshape(6 * P, 6 * P)
            S_flat = S_flat * m6[:, None] * m6[None, :] + jnp.diag(1.0 - m6)
            b_flat = b_red.reshape(-1) * m6
            dp = gj_solve(S_flat, b_flat[:, None])[:, 0].reshape(P, 6)
            if upto == "solve":
                return jnp.sum(dp) + j
            Wt_dp = jnp.einsum("lpik,pi->lk", Wck, dp, precision=_PREC)
            dx = jnp.einsum("ljk,lk->lj", V_inv, b_lm - Wt_dp, precision=_PREC)
            dx = dx * has_obs[:, None]
            return jnp.sum(dp) + jnp.sum(dx) + j
        return fn

    def scan(fn):
        def body(c, key):
            return c + fn(key), 0
        return jax.jit(lambda ks: lax.scan(body, jnp.float32(0), ks)[0])

    t0 = best_of(scan(lambda key: jax.random.uniform(key)), (keys,))
    ms = lambda t: (t - t0) / C * 1e3
    print(f"scan control: {t0 / C * 1e3:7.3f} ms/it")
    for name in ["damp", "vinv", "y", "scorr", "solve", "full"]:
        t = best_of(scan(staged(name)), (keys,))
        print(f"upto {name:6s}: {ms(t):7.3f} ms/it")

    # variants of the reduced-system solve alone
    S = jnp.asarray(rng.normal(size=(30, 30)).astype(np.float32))
    S = S @ S.T + 30 * jnp.eye(30)
    b = jnp.asarray(rng.normal(size=(30,)).astype(np.float32))

    def s_lu(key):
        Sk = S + 1e-12 * jax.random.uniform(key)  # defeat loop hoisting
        return jnp.sum(jnp.linalg.solve(Sk, b))

    def s_gj(key):
        Sk = S + 1e-12 * jax.random.uniform(key)
        return jnp.sum(gj_solve(Sk, b[:, None]))

    for name, fn in [("linalg.solve 30x30", s_lu), ("gj_solve 30x30    ", s_gj)]:
        t = best_of(scan(fn), (keys,))
        print(f"{name}: {ms(t):7.3f} ms/it")


if __name__ == "__main__":
    main()
