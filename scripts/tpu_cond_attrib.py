"""Attribute the frame_step vs cond-free gap (round-4: 2.90 vs 1.41 ms/it).

Round 4 read the gap as "lax.cond machinery" — but the cond-free manual
step ALSO never runs the five-point bootstrap, which production takes on
~10% of frames (diag traces: every 6-18 frames). This bench separates the
three candidate costs on the real chip by scanning the REAL frame_step in
three compiled programs over the same warmed production state:

  full    — production program, tri taken whenever n3d < tracked_tol
  notri   — same program shape, tracked_tol=1 so the tri branch is
            compiled but never taken (isolates taken-branch cost)
  steady  — steady=True program: no pose cond, no register_triangulated,
            single hist writes (isolates cond presence + no-op bookkeeping)

(full - notri)/n_tri = per-event cost of a taken five-point bootstrap.
(notri - steady)     = the true per-frame cond + bookkeeping overhead.

Usage: python scripts/tpu_cond_attrib.py   (idle host!)
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

SHAPE = (370, 1226)
C = int(os.environ.get("PROF_CHUNK", "32"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))


def main() -> None:
    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.corners import grid_extract, select_top
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.io import synthetic
    from pmv_tpu.pipeline import fused

    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}", flush=True)
    N, M = 512, 8192
    cfg = fused.StepConfig(
        lk_levels=4, lk_window=21, lk_iters=10, tile_h=255, tile_w=255,
        n_per_tile=40, tracked_tol=150, e_hypos=256, pnp_hypos=128,
        pnp_thresh=3.0, bundle_size=5, ba_iters=5, traj_cap=2048,
        response="min_eig", lk_impl="auto", reseed_tol=300,
    )
    K = jnp.asarray(synthetic.KITTI_K.astype(np.float32))
    seq = synthetic.make_sequence(
        n_frames=C + 12, shape=SHAPE, K=synthetic.KITTI_K,
        density=150.0, speed=1.0, yaw_rate=0.004, seed=0,
    )
    img0 = jnp.asarray(seq["images"][0].astype(np.float32))
    xy, sc, va = grid_extract(img0, cfg.n_per_tile, tile_h=255, tile_w=255,
                              quality=0.01, min_distance=5,
                              response="min_eig_xla")
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(xy=txy, valid=tva,
                         landmark=jnp.full((N,), -1, jnp.int32), score=tsc)
    state0 = fused.init_state(
        pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
        table=table, map_state=MapState.empty(M), cfg=cfg,
    )
    imgs8 = jax.device_put(seq["images"][1:9].astype(np.uint8))
    gts8 = jnp.ones((8,), jnp.float32)
    keys8 = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(0), 8)))
    state, _ = fused.chunk_step(state0, imgs8, gts8, keys8, K, cfg)
    np.asarray(state.t)

    imgsC = jax.device_put(seq["images"][9 : 9 + C].astype(np.uint8))
    gtsC = jnp.ones((C,), jnp.float32)
    keysC = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(7), C)))

    # BA off (bundle_size>0 gates it per frame index — use ba-free scan via
    # cadence trick: measure chunk-internal steps only through frame_step
    # scans, mirroring round 4's "frame_step (scan, noba)" harness).
    from jax import lax

    def make_scan(cfg_v, steady):
        @jax.jit
        def run(st, imgs_u8, ks):
            def body(s, xs):
                img, key, gt = xs
                s, _, stats = fused.frame_step(
                    s, img.astype(jnp.float32), gt, key, K, cfg_v,
                    steady=steady,
                )
                return s, stats["used_pnp"]
            return lax.scan(body, st, (imgs_u8, ks, gtsC))
        return run

    cfg_notri = cfg._replace(tracked_tol=1)
    variants = [
        ("full  ", make_scan(cfg, False)),
        ("notri ", make_scan(cfg_notri, False)),
        ("steady", make_scan(cfg, True)),
    ]
    results = {}
    for name, fn in variants:
        out = fn(state, imgsC, keysC)
        np.asarray(out[0].t)
        best = np.inf
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(state, imgsC, keysC)
            np.asarray(out[0].t)
            best = min(best, time.perf_counter() - t0)
        n_pnp = int(np.asarray(jnp.sum(out[1])))
        results[name.strip()] = best
        print(
            f"{name}: {best / C * 1e3:7.3f} ms/it  (pnp {n_pnp}/{C} frames)",
            flush=True,
        )
    n_tri_full = None
    out = variants[0][1](state, imgsC, keysC)
    n_tri_full = C - int(np.asarray(jnp.sum(out[1])))
    d_tri = results["full"] - results["notri"]
    d_cond = results["notri"] - results["steady"]
    print(f"tri events in full scan: {n_tri_full}")
    if n_tri_full:
        print(f"per-tri-event cost: {d_tri / n_tri_full * 1e3:7.3f} ms")
    print(f"amortized tri cost : {d_tri / C * 1e3:7.3f} ms/it")
    print(f"cond+bookkeeping   : {d_cond / C * 1e3:7.3f} ms/it")


if __name__ == "__main__":
    main()
