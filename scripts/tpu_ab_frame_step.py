"""A/B the fused frame_step against a prior structure on the real chip.

Usage: OLD_FUSED=/tmp/oldmod/old_fused.py python scripts/tpu_ab_frame_step.py
Scans C frames of each module's frame_step over identical KITTI-sized
inputs (bench config: N=512, win=21, lk_impl=auto) and prints best-of-N
marginal ms/frame for each. Both modules import the CURRENT pmv_tpu
package — only the frame_step orchestration differs.
"""

from __future__ import annotations

import importlib.util
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
C = int(os.environ.get("PROF_CHUNK", "32"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))


def load_old(path: str):
    spec = importlib.util.spec_from_file_location("old_fused_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.corners import grid_extract, select_top
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.io import synthetic
    from pmv_tpu.pipeline import fused as new_fused

    mods = {"new": new_fused}
    old_path = os.environ.get("OLD_FUSED", "")
    if old_path and Path(old_path).exists():
        mods["old"] = load_old(old_path)

    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}")
    seq = synthetic.make_sequence(
        n_frames=C + 10, shape=SHAPE, K=synthetic.KITTI_K,
        density=150.0, speed=1.0, yaw_rate=0.004, seed=0,
    )
    N, M = 512, 8192
    img0 = jnp.asarray(seq["images"][0])
    xy, sc, va = grid_extract(img0, 40, tile_h=255, tile_w=255)
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(
        xy=txy, valid=tva, landmark=jnp.full((N,), -1, jnp.int32), score=tsc
    )
    K = jnp.asarray(seq["K"], jnp.float32)
    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(0), C + 8)))
    imgs_warm = jax.device_put(seq["images"][1 : 9].astype(np.uint8))
    imgs = jax.device_put(seq["images"][9 : 9 + C].astype(np.uint8))

    for name, mod in mods.items():
        cfg = mod.StepConfig(
            lk_levels=4, lk_window=21, lk_iters=10, tile_h=255, tile_w=255,
            n_per_tile=40, tracked_tol=150, reseed_tol=300,
            e_hypos=256, pnp_hypos=128, bundle_size=5, ba_iters=5,
            traj_cap=2048, lk_impl="auto",
        )
        state0 = mod.init_state(
            pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
            table=table, map_state=MapState.empty(M), cfg=cfg,
        )

        @jax.jit
        def scan_steps(st, imgs_u8, ks):
            def body(s, xs):
                img, key = xs
                s, _, _ = mod.frame_step(
                    s, img.astype(jnp.float32), jnp.float32(1.0), key, K, cfg
                )
                return s, 0

            return lax.scan(body, st, (imgs_u8, ks))[0]

        # Steady state: run 8 frames so PnP is the live branch.
        state, _, _ = None, None, None
        st = state0
        st = scan_steps(st, imgs_warm, keys[:8])
        np.asarray(st.t)
        best = np.inf
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = scan_steps(st, imgs, keys[8 : 8 + C])
            np.asarray(out.t)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: frame_step scan {best / C * 1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
