"""Pallas-LK kernel vs XLA tap-matrix tracker on the real TPU chip.

Production shapes: KITTI-size frames, N=512 features, win=21, 4 levels.
Times a chain of R dependent track_cached calls (outputs feed inputs, so
the chip serializes them) with a single readback — the tunnel's
block_until_ready is not a reliable barrier.

Usage: python scripts/tpu_lk_bench.py   (real chip; idle host!)
Env: LKB_REPS=20 LKB_N=512 LKB_WIN=21 LKB_LEVELS=4
"""

from __future__ import annotations

import json
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

from pmv_tpu.frontend import corners, image, lucas_kanade as lk, pallas_lk
from pmv_tpu.io import synthetic

REPS = int(os.environ.get("LKB_REPS", "20"))
N = int(os.environ.get("LKB_N", "512"))
WIN = int(os.environ.get("LKB_WIN", "21"))
LEVELS = int(os.environ.get("LKB_LEVELS", "4"))
SHAPE = (370, 1226)


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    seq = synthetic.make_sequence(
        n_frames=2, shape=SHAPE, K=synthetic.KITTI_K, density=150.0,
        speed=1.0, yaw_rate=0.004, seed=0,
    )
    img0 = jnp.asarray(seq["images"][0].astype(np.float32))
    img1 = jnp.asarray(seq["images"][1].astype(np.float32))
    xy, sc, va = corners.grid_extract(
        img0, 40, tile_h=255, tile_w=255, response="min_eig_xla"
    )
    xy, sc, va = corners.select_top(xy, sc, va, N)
    pyr0 = tuple(image.build_pyramid(img0, LEVELS))
    pyr1 = tuple(image.build_pyramid(img1, LEVELS))

    results = {}
    outs = {}
    for name, mod in (("tap", lk), ("pallas", pallas_lk)):
        blocks = mod.capture_blocks(pyr0, xy, win=WIN)

        # One jitted dispatch chaining REPS dependent tracks: per-dispatch
        # tunnel overhead (~15-30 ms) would otherwise swamp the kernel.
        def _chain(pts, st, blocks, n, _mod=mod):
            for _ in range(n):
                pts, st, blocks = _mod.track_cached(
                    blocks, list(pyr1), pts, st, win=WIN
                )
            return pts, st

        chain = jax.jit(_chain, static_argnames=("n",))

        p, s = chain(xy, va, blocks, 1)
        outs[name] = (np.asarray(p), np.asarray(s))  # warm + correctness
        chain(xy, va, blocks, REPS)[0].block_until_ready()  # warm REPS shape

        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            p, s = chain(xy, va, blocks, REPS)
            np.asarray(p)
            best = min(best, time.perf_counter() - t0)
        results[name] = {"ms_per_track": round(best / REPS * 1e3, 3)}
        print(json.dumps({name: results[name]}), flush=True)

    both = outs["tap"][1] & outs["pallas"][1]
    if both.any():
        d = np.abs(outs["tap"][0][both] - outs["pallas"][0][both]).max()
        results["max_abs_px_diff"] = float(d)
    results["status_agree"] = float(
        (outs["tap"][1] == outs["pallas"][1]).mean()
    )
    results["speedup"] = round(
        results["tap"]["ms_per_track"] / results["pallas"]["ms_per_track"], 2
    )
    print(json.dumps(results), flush=True)
    Path("/tmp/pmv_tpu_lk_bench.json").write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
