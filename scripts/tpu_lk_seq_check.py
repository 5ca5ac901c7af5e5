"""Per-frame tap-vs-pallas LK comparison over a real moving sequence.

The A/B bench (tpu_lk_bench.py) re-tracks one frame pair, so features sit
near their region centers; this check threads blocks through a moving
sequence, exercising edge offsets, drift flags, and block re-capture —
prints the first frame where the two backends disagree.

Usage: python scripts/tpu_lk_seq_check.py  (real chip; idle host)
Env: LKC_FRAMES=30 LKC_WIN=21 LKC_N=512
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pmv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pmv_tpu.frontend import corners, image, lucas_kanade as lk, pallas_lk
from pmv_tpu.io import synthetic

FRAMES = int(os.environ.get("LKC_FRAMES", "30"))
WIN = int(os.environ.get("LKC_WIN", "21"))
N = int(os.environ.get("LKC_N", "512"))
LEVELS = 4
SHAPE = (370, 1226)


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    seq = synthetic.make_sequence(
        n_frames=FRAMES, shape=SHAPE, K=synthetic.KITTI_K, density=150.0,
        speed=1.0, yaw_rate=0.004, seed=0,
    )
    imgs = [jnp.asarray(f.astype(np.float32)) for f in seq["images"]]
    pyrs = [tuple(image.build_pyramid(im, LEVELS)) for im in imgs]
    xy, sc, va = corners.grid_extract(
        imgs[0], 40, tile_h=255, tile_w=255, response="min_eig_xla"
    )
    xy, sc, va = corners.select_top(xy, sc, va, N)

    state = {}
    for name, mod in (("tap", lk), ("pallas", pallas_lk)):
        state[name] = {
            "pts": xy, "st": va, "blocks": mod.capture_blocks(pyrs[0], xy, win=WIN),
            "mod": mod,
        }

    for f in range(1, FRAMES):
        rows = {}
        for name, s in state.items():
            pts, st, blocks = s["mod"].track_cached(
                s["blocks"], list(pyrs[f]), s["pts"], s["st"], win=WIN
            )
            s.update(pts=pts, st=st, blocks=blocks)
            rows[name] = (np.asarray(pts), np.asarray(st))
        ta, pa = rows["tap"], rows["pallas"]
        both = ta[1] & pa[1]
        d = np.abs(ta[0][both] - pa[0][both]).max() if both.any() else 0.0
        mism = int((ta[1] != pa[1]).sum())
        print(
            f"frame {f:3d}: live tap={int(ta[1].sum()):3d} pal={int(pa[1].sum()):3d} "
            f"status_mismatch={mism:3d} max_px_diff={d:.5f}",
            flush=True,
        )
        if mism > 8 or d > 0.5:
            bad = np.where(ta[1] != pa[1])[0][:8]
            print("  mismatched slots:", bad.tolist())
            if both.any():
                worst = np.argmax(np.abs(ta[0][both] - pa[0][both]).max(axis=1))
                idx = np.where(both)[0][worst]
                print(
                    f"  worst slot {idx}: tap={ta[0][idx]} pal={pa[0][idx]}"
                )


if __name__ == "__main__":
    main()
