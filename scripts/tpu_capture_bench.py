"""Micro-bench: LK search-region block capture strategies on the real chip.

The round-3 profile puts "LK block re-capture" at ~2.3 ms/frame — the
vmapped ``lax.dynamic_slice`` of (N, Rg, Rg) blocks from each freshly built
pyramid level plus the transpose into the Pallas kernel's feature-lanes
layout (pmv_tpu/frontend/lucas_kanade.py:_capture_region,
pallas_lk.py:_track_level_cached). Controls showed a loop-invariant source
costs only ~0.6 ms, so most of the cost is tied to gathering from a
freshly-written source. This bench isolates the capture stage (scan over C
frames, differential vs a pyramid-only scan, same methodology as
tpu_profile_step.py) and compares strategies:

  v0_pallas   pad + vmap dynamic_slice + transpose (production pallas path)
  v1_tap      pad + vmap dynamic_slice, feature-major (production tap path)
  v2_nopad    clamped origins into the unpadded level + transpose
  v3_lanes    advanced-index gather directly into (Rg, Rg, N) lanes layout
  v4_invar    v0 from a loop-invariant pyramid (the 0.6 ms control)
  v5_dma      Pallas whole-level-in-VMEM extract kernel (feature-major out)
  v6_dma_t    v5 + XLA transpose to lanes layout

Usage: python scripts/tpu_capture_bench.py   (idle host!)
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

from pmv_tpu.frontend import lucas_kanade as lk
from pmv_tpu.frontend.image import build_pyramid

SHAPE = (370, 1226)
C = int(os.environ.get("PROF_CHUNK", "8"))
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))
N = 512
WIN = 21
SEARCH = 10
LEVELS = 4


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


def checksum(blocks):
    return sum(jnp.sum(b[0]) for b in blocks)


def capture_v0(pyr, pts):
    """Production pallas-layout capture: pad + vmap dslice + transpose."""
    PAD = lk._pad_for(WIN, SEARCH)
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        img_p = jnp.pad(img, PAD, mode="edge")
        region, r0, c0 = lk._capture_region(img_p, pts / s + PAD, WIN, SEARCH)
        out.append((jnp.transpose(region, (1, 2, 0)), r0, c0))
    return tuple(out)


def capture_v1(pyr, pts):
    """Feature-major (tap path): pad + vmap dslice, no transpose."""
    PAD = lk._pad_for(WIN, SEARCH)
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        img_p = jnp.pad(img, PAD, mode="edge")
        out.append(lk._capture_region(img_p, pts / s + PAD, WIN, SEARCH))
    return tuple(out)


def capture_v2(pyr, pts):
    """No pad: clamp origins into the raw level image + transpose."""
    Rg = lk.region_size(WIN, SEARCH)
    half = (WIN - 1) / 2.0
    m = (Rg - WIN) // 2
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        H, W = img.shape
        r0 = jnp.clip(jnp.floor(pts[:, 1] / s - half).astype(jnp.int32) - m,
                      0, max(H - Rg, 0))
        c0 = jnp.clip(jnp.floor(pts[:, 0] / s - half).astype(jnp.int32) - m,
                      0, max(W - Rg, 0))
        region = lk._slice_blocks(img, r0, c0, Rg)
        out.append((jnp.transpose(region, (1, 2, 0)), r0, c0))
    return tuple(out)


def capture_v3(pyr, pts):
    """Advanced-index gather directly into the (Rg, Rg, N) lanes layout."""
    PAD = lk._pad_for(WIN, SEARCH)
    Rg = lk.region_size(WIN, SEARCH)
    half = (WIN - 1) / 2.0
    m = (Rg - WIN) // 2
    ii = jnp.arange(Rg)
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        img_p = jnp.pad(img, PAD, mode="edge")
        H, W = img_p.shape
        p = pts / s + PAD
        r0 = jnp.clip(jnp.floor(p[:, 1] - half).astype(jnp.int32) - m, 0, max(H - Rg, 0))
        c0 = jnp.clip(jnp.floor(p[:, 0] - half).astype(jnp.int32) - m, 0, max(W - Rg, 0))
        region_t = img_p[
            r0[None, None, :] + ii[:, None, None],
            c0[None, None, :] + ii[None, :, None],
        ]  # (Rg, Rg, N)
        out.append((region_t, r0, c0))
    return tuple(out)


def _scan_capture(imgs_u8, pts, fn):
    def body(c, img):
        pyr = build_pyramid(img.astype(jnp.float32), LEVELS)
        blocks = fn(tuple(pyr), pts)
        return c + checksum(blocks), 0
    return lax.scan(body, jnp.float32(0), imgs_u8)[0]


def _scan_pyr(imgs_u8):
    def body(c, img):
        pyr = build_pyramid(img.astype(jnp.float32), LEVELS)
        return c + pyr[0][0, 0] + pyr[-1][0, 0], 0
    return lax.scan(body, jnp.float32(0), imgs_u8)[0]


def _scan_invar(imgs_u8, pts, pyr0, fn):
    def body(c, img):
        blocks = fn(pyr0, pts + c * 1e-6)  # keep pts loop-variant, image not
        return c + checksum(blocks) + img[0, 0].astype(jnp.float32), 0
    return lax.scan(body, jnp.float32(0), imgs_u8)[0]


def main() -> None:
    from pmv_tpu.frontend import pallas_capture

    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}")
    rng = np.random.default_rng(0)
    H, W = SHAPE
    imgs = jax.device_put(
        rng.integers(0, 255, (C, H, W), dtype=np.uint8)
    )
    pts = jax.device_put(
        np.stack([rng.uniform(5, W - 5, N), rng.uniform(5, H - 5, N)], -1)
        .astype(np.float32)
    )
    pyr0 = tuple(build_pyramid(imgs[0].astype(jnp.float32), LEVELS))

    t_pyr = best_of(jax.jit(_scan_pyr), (imgs,))
    ms = lambda t: (t - t_pyr) / C * 1e3
    print(f"pyramid-only scan: {t_pyr / C * 1e3:7.2f} ms/frame")

    variants = [
        ("v0_pallas (pad+dslice+T)", capture_v0),
        ("v1_tap    (pad+dslice)  ", capture_v1),
        ("v2_nopad  (dslice+T)    ", capture_v2),
        ("v3_lanes  (adv-idx)     ", capture_v3),
        ("v5_dma    (pallas, N-major)", pallas_capture.capture_feature_major),
        ("v6_dma_t  (pallas + T)  ", pallas_capture.capture_lanes),
    ]
    for name, fn in variants:
        try:
            t = best_of(jax.jit(lambda i, p, f=fn: _scan_capture(i, p, f)), (imgs, pts))
            print(f"{name}: {ms(t):7.2f} ms/frame capture")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    t = best_of(
        jax.jit(lambda i, p: _scan_invar(i, p, pyr0, capture_v0)), (imgs, pts)
    )
    print(f"v4_invar  (v0, static img): {ms(t):7.2f} ms/frame capture")


if __name__ == "__main__":
    main()
