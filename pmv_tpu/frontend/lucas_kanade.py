"""Batched pyramidal Lucas-Kanade sparse optical flow (XLA implementation).

TPU-native rewrite of the reference's tracker call
``cv::calcOpticalFlowPyrLK(prev, next, pts, ..., Size(32, 32), 4)``
(OpenCVLucasKanadeFM.cpp:15): all N features are tracked simultaneously as a
single batched computation — per-feature windows become (N, win, win) tensors
sampled bilinearly, the 2x2 normal systems are solved in closed form, and the
level/iteration loops are static (lax.fori_loop) so the whole tracker is one
fused XLA program. A Pallas kernel variant lives in
``pmv_tpu.frontend.pallas_kernels``.

Convention: feature positions are (u=column, v=row) float32 pixels, matching
the reference's Feature(column, row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def bilinear_sample(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Bilinear sample ``img`` (H, W) at float coords (broadcast shapes).

    Coordinates are clamped to the valid interior, so out-of-bounds samples
    replicate the border (callers mask by in-bounds status separately).
    """
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.000001)
    y = jnp.clip(y, 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = x - x0
    dy = y - y0
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )


def _patch_coords(center: jax.Array, win: int) -> tuple[jax.Array, jax.Array]:
    """(N, 2) centers -> (N, win, win) y/x sample coordinates."""
    off = jnp.arange(win, dtype=center.dtype) - (win - 1) / 2.0
    yy = center[:, 1, None, None] + off[None, :, None]
    xx = center[:, 0, None, None] + off[None, None, :]
    return jnp.broadcast_to(yy, (center.shape[0], win, win)), jnp.broadcast_to(
        xx, (center.shape[0], win, win)
    )


@functools.partial(jax.jit, static_argnames=("win", "iters"))
def _track_level(
    prev_img: jax.Array,
    next_img: jax.Array,
    pts_level: jax.Array,
    guess: jax.Array,
    win: int,
    iters: int,
) -> tuple[jax.Array, jax.Array]:
    """One pyramid level of LK. Returns (new guess (N, 2), min_eig (N,))."""
    gy, gx = jnp.gradient(prev_img)
    yy, xx = _patch_coords(pts_level, win)
    T = bilinear_sample(prev_img, yy, xx)
    Ix = bilinear_sample(gx, yy, xx)
    Iy = bilinear_sample(gy, yy, xx)
    Gxx = jnp.sum(Ix * Ix, axis=(1, 2))
    Gxy = jnp.sum(Ix * Iy, axis=(1, 2))
    Gyy = jnp.sum(Iy * Iy, axis=(1, 2))
    det = Gxx * Gyy - Gxy * Gxy
    # min eigenvalue of G / window area — OpenCV's trackability measure
    mean = (Gxx + Gyy) * 0.5
    rad = jnp.sqrt(jnp.maximum(((Gxx - Gyy) * 0.5) ** 2 + Gxy * Gxy, 0.0))
    min_eig = (mean - rad) / (win * win)
    inv_det = jnp.where(det > 1e-6, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)

    def body(_, g):
        ny, nx = _patch_coords(g, win)
        I = bilinear_sample(next_img, ny, nx)
        r = T - I
        bx = jnp.sum(r * Ix, axis=(1, 2))
        by = jnp.sum(r * Iy, axis=(1, 2))
        du = (Gyy * bx - Gxy * by) * inv_det
        dv = (Gxx * by - Gxy * bx) * inv_det
        return g + jnp.stack([du, dv], axis=-1)

    guess = lax.fori_loop(0, iters, body, guess)
    return guess, min_eig


def track(
    prev_pyr: list[jax.Array],
    next_pyr: list[jax.Array],
    pts: jax.Array,
    valid: jax.Array,
    win: int = 32,
    iters: int = 10,
    min_eig_threshold: float = 1e-4,
) -> tuple[jax.Array, jax.Array]:
    """Track (N, 2) points from prev to next through the pyramids.

    Returns (new_pts (N, 2), status (N,) bool). Status clears when the point
    leaves the image, the normal matrix is degenerate (untextured window), or
    the input slot was invalid — the mask-based equivalent of OpenCV's
    status output consumed at OpenCVLucasKanadeFM.cpp:21-30.
    """
    levels = len(prev_pyr)
    H, W = prev_pyr[0].shape
    scale_top = 2.0 ** (levels - 1)
    guess = pts / scale_top
    min_eig0 = jnp.zeros(pts.shape[0], pts.dtype)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0**lvl
        pts_l = pts / s
        guess, min_eig0 = _track_level(
            prev_pyr[lvl], next_pyr[lvl], pts_l, guess, win, iters
        )
        if lvl > 0:
            guess = guess * 2.0
    new_pts = guess
    inside = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 0] <= W - 1)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 1] <= H - 1)
    )
    status = valid & inside & (min_eig0 > min_eig_threshold)
    return new_pts, status
