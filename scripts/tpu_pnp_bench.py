"""Micro-bench: PnP RANSAC sub-stage costs on the real chip.

The round-3 profile puts pose estimation at ~2.2 ms/frame after the
tiny-matrix linalg rewrite. This bench scan-differences the stages of
``solvers.pnp.solve_pnp_ransac`` (sampling -> DLT hypotheses -> scoring ->
GN polish) on production shapes (N=512 slots, H=128 hypotheses) so the
next optimization targets the measured hotspot, not a guess.

Usage: python scripts/tpu_pnp_bench.py   (idle host!)
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

from pmv_tpu.core import geometry as geo
from pmv_tpu.solvers import pnp
from pmv_tpu.solvers.ransac import best_hypothesis, sample_minimal_sets

C = int(os.environ.get("PROF_CHUNK", "32"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))
N, H = 512, 128


def best_of(fn, args, repeats=REPEATS):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.21], [0, 0, 1]],
                    jnp.float32)
    X = rng.uniform([-20, -5, 4], [20, 5, 60], (N, 3)).astype(np.float32)
    aa = np.array([0.01, -0.02, 0.005], np.float32)
    t = np.array([0.1, -0.05, 0.9], np.float32)
    R = np.asarray(geo.rodrigues(jnp.asarray(aa)))
    xc = X @ R.T + t
    uv = np.stack(
        [xc[:, 0] / xc[:, 2] * 718.856 + 607.19,
         xc[:, 1] / xc[:, 2] * 718.856 + 185.21], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    out = rng.random(N) < 0.25  # 25% outliers
    uv[out] += rng.uniform(-80, 80, (out.sum(), 2)).astype(np.float32)
    valid = jnp.asarray(rng.random(N) < 0.8)
    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(1), C)))
    return (jnp.asarray(X), jnp.asarray(uv), valid, K,
            jnp.asarray(R), jnp.asarray(t), keys)


def main() -> None:
    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}  N={N} H={H}")
    X, uv, valid, K, Rg_, tg_, keys = make_inputs()
    xn = jnp.stack(
        [(uv[:, 0] - K[0, 2]) / K[0, 0], (uv[:, 1] - K[1, 2]) / K[1, 1]], -1
    )

    def scan(fn):
        def body(c, key):
            return c + fn(key), 0
        return jax.jit(lambda ks: lax.scan(body, jnp.float32(0), ks)[0])

    def s_base(key):  # scan overhead control
        return jax.random.uniform(key)

    def s_sample(key):
        idx = sample_minimal_sets(key, valid, H, 6)
        return jnp.sum(idx).astype(jnp.float32)

    def s_dlt(key):
        idx = sample_minimal_sets(key, valid, H, 6)
        Rs, ts = jax.vmap(lambda i: pnp._dlt_pose(X[i], xn[i], jnp.ones(6, X.dtype)))(idx)
        return jnp.sum(Rs) + jnp.sum(ts)

    def s_score(key):
        idx = sample_minimal_sets(key, valid, H, 6)
        Rs, ts = jax.vmap(lambda i: pnp._dlt_pose(X[i], xn[i], jnp.ones(6, X.dtype)))(idx)
        Rs = jnp.concatenate([Rs, Rg_[None]], axis=0)
        ts = jnp.concatenate([ts, tg_[None]], axis=0)

        def reproj_err(R, t):
            pred = pnp._project_std(geo.rodrigues_inv(R), t, X, K)
            behind = (jnp.matmul(X, R.T, precision=pnp._PREC) + t)[:, 2] <= 0
            err = jnp.linalg.norm(uv - pred, axis=-1)
            return jnp.where(behind, jnp.inf, err)

        errs = jax.vmap(reproj_err)(Rs, ts)
        inl = (errs < 8.0) & valid[None, :]
        best, best_mask = best_hypothesis(inl)
        return Rs[best][0, 0] + ts[best][0] + jnp.sum(best_mask).astype(jnp.float32)

    def s_full(key):
        R, t, inl = pnp.solve_pnp_ransac(X, uv, valid, K, key, Rg_, tg_,
                                         n_hypos=H, thresh_px=8.0)
        return R[0, 0] + t[0] + jnp.sum(inl).astype(jnp.float32)

    t0 = best_of(scan(s_base), (keys,))
    ms = lambda t: (t - t0) / C * 1e3
    print(f"scan control       : {t0 / C * 1e3:7.3f} ms/it")
    for name, fn in [("sampling (gumbel+topk)", s_sample),
                     ("+ DLT hypotheses      ", s_dlt),
                     ("+ scoring             ", s_score),
                     ("+ GN polish (full)    ", s_full)]:
        t = best_of(scan(fn), (keys,))
        print(f"{name}: {ms(t):7.3f} ms/it cumulative")


if __name__ == "__main__":
    main()
