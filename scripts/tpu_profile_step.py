"""Steady-state ms/frame breakdown on the real chip, by differential timing.

Per-op timers are meaningless through the tunnel (15-30 ms dispatch floor),
so each stage is measured as a C-frame jitted scan — same amortization as
production ``chunk_step`` — and the stage costs fall out of differences:

  pyramid           = T(scan pyramid)
  + LK track        = T(scan pyramid+track) - pyramid
  + pose estimation = T(scan frame_step, BA disabled) - pyramid+track
  + BA amortized    = T(chunk_step) - T(scan frame_step no BA)

Usage: python scripts/tpu_profile_step.py   (idle host!)
Env: PROF_CHUNK=8 PROF_REPEATS=5
"""

from __future__ import annotations

import functools
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

SHAPE = (370, 1226)
C = int(os.environ.get("PROF_CHUNK", "8"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))


def best_of(fn, args, sync, repeats=REPEATS):
    out = fn(*args)
    np.asarray(sync(out))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(sync(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.corners import grid_extract, select_top
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.io import synthetic
    from pmv_tpu.pipeline import fused, steps

    print(f"device: {jax.devices()[0]}")
    H, W = SHAPE
    N, M = 512, 8192
    cfg = fused.StepConfig(
        lk_levels=4, lk_window=21, lk_iters=10, tile_h=255, tile_w=255,
        n_per_tile=40, tracked_tol=150, e_hypos=256, pnp_hypos=128,
        pnp_thresh=3.0, bundle_size=5, ba_iters=5, traj_cap=2048,
        response="min_eig", lk_impl="auto", reseed_tol=300,
    )
    cfg_noba = cfg._replace(ba_cadence=10**6)
    K = jnp.asarray(synthetic.KITTI_K.astype(np.float32))
    seq = synthetic.make_sequence(
        n_frames=C + 12, shape=SHAPE, K=synthetic.KITTI_K,
        density=150.0, speed=1.0, yaw_rate=0.004, seed=0,
    )
    img0 = jnp.asarray(seq["images"][0].astype(np.float32))
    xy, sc, va = grid_extract(img0, cfg.n_per_tile, tile_h=255, tile_w=255,
                              quality=0.01, min_distance=5, response="min_eig_xla")
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(xy=txy, valid=tva,
                         landmark=jnp.full((N,), -1, jnp.int32), score=tsc)
    state0 = fused.init_state(
        pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
        table=table, map_state=MapState.empty(M), cfg=cfg,
    )
    imgs = jax.device_put(seq["images"][1 : C + 1].astype(np.uint8))
    imgs2 = jax.device_put(seq["images"][C + 1 : 2 * C + 1].astype(np.uint8))
    gts = jnp.ones((C,), jnp.float32)
    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(0), C)))

    # Bootstrap the state so PnP (the steady-state branch) is live.
    state, _ = fused.chunk_step(state0, imgs, gts, keys, K, cfg)
    np.asarray(state.t)

    # --- stage programs (each a C-frame scan) ---
    @jax.jit
    def scan_pyr(imgs_u8):
        def body(c, img):
            pyr = build_pyramid(img.astype(jnp.float32), cfg.lk_levels)
            return c + pyr[0][0, 0] + pyr[-1][0, 0], 0
        return lax.scan(body, jnp.float32(0), imgs_u8)[0]

    @functools.partial(jax.jit, static_argnames=())
    def scan_track(st, imgs_u8):
        def body(s, img):
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            return s._replace(blocks=blocks, table=tbl), 0
        return lax.scan(body, st, imgs_u8)[0]

    t_pyr = best_of(scan_pyr, (imgs2,), lambda o: o)
    t_trk = best_of(scan_track, (state, imgs2), lambda o: o.table.xy)
    t_noba = best_of(
        lambda s, i: fused.chunk_step(s, i, gts, keys, K, cfg_noba),
        (state, imgs2), lambda o: o[0].t,
    )
    t_full = best_of(
        lambda s, i: fused.chunk_step(s, i, gts, keys, K, cfg),
        (state, imgs2), lambda o: o[0].t,
    )

    ms = lambda t: t / C * 1e3
    print(f"chunk={C} repeats={REPEATS}")
    print(f"pyramid build        : {ms(t_pyr):7.2f} ms/frame")
    print(f"+ LK track (cached)  : {ms(t_trk):7.2f} ms/frame  (LK = {ms(t_trk - t_pyr):.2f})")
    print(f"+ pose est (no BA)   : {ms(t_noba):7.2f} ms/frame  (pose = {ms(t_noba - t_trk):.2f})")
    print(f"+ BA (cadenced)      : {ms(t_full):7.2f} ms/frame  (BA amortized = {ms(t_full - t_noba):.2f})")
    print(f"steady-state fps (compute, device-resident frames): {C / t_full:.1f}")


if __name__ == "__main__":
    main()
