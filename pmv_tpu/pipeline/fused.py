"""The fused per-frame step: one XLA program per frame.

The reference hides latency with a two-thread pipeline
(OdometryPipeline.cpp:210-245). On TPU the equivalent concern is dispatch
latency: each jitted call costs a host->device round trip, so the whole
per-frame flow — pyramid build, batched LK tracking, conditional reseed,
conditional PnP-vs-triangulation, landmark bookkeeping, motion gate — is
fused into a single jit with ``lax.cond`` branches. The host loop feeds
images and reads back one pose per frame; everything else stays on device.

Branch semantics mirror estimatePose (OdometryPipeline.cpp:376-426):
``count3DPoints >= tracked_features_tol`` selects RANSAC PnP, otherwise the
essential-matrix bootstrap (with GT-derived scale ``gt_step``) triangulates
a fresh map.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pmv_tpu.core.state import FeatureTable, MapState
from pmv_tpu.frontend.image import build_pyramid
from pmv_tpu.pipeline import steps
from pmv_tpu.pipeline.heuristics import motion_gate
from pmv_tpu.solvers import essential, pnp


class StepConfig(NamedTuple):
    """Static (hashable) configuration of the fused step."""

    lk_levels: int = 4
    lk_window: int = 32
    lk_iters: int = 10
    tile_h: int = 255
    tile_w: int = 255
    n_per_tile: int = 40
    quality: float = 0.01
    min_distance: int = 5
    tracked_tol: int = 150
    e_hypos: int = 256
    e_thresh: float = 1.0
    pnp_hypos: int = 128
    pnp_thresh: float = 8.0


class StepState(NamedTuple):
    """Device-resident state threaded through frames."""

    pyr: tuple  # image pyramid of the current frame
    table: FeatureTable
    map: MapState
    R: jax.Array  # (3, 3) current world pose
    t: jax.Array  # (3,)
    R_s: jax.Array  # (3, 3) last accepted delta
    t_s: jax.Array  # (3,)
    scale: jax.Array  # () GT-derived step scale


@functools.partial(jax.jit, static_argnames=("cfg",))
def frame_step(
    state: StepState,
    next_img: jax.Array,
    gt_step: jax.Array,
    key: jax.Array,
    K: jax.Array,
    cfg: StepConfig,
):
    """Process one frame. Returns (new_state, src_table', stats).

    ``src_table'`` is the previous frame's table with any landmark bindings
    added by the triangulation branch (the reference also back-writes the
    source frame, OpenCVFivePointTri.cpp:51) — the host keeps it for BA
    windows.
    """
    next_pyr = tuple(build_pyramid(next_img, cfg.lk_levels))

    tracked_table = steps.track_step(
        list(state.pyr), list(next_pyr), state.table,
        win=cfg.lk_window, iters=cfg.lk_iters,
    )
    tracked = tracked_table.num_valid()

    def do_reseed(tbl):
        return steps.reseed_step(
            tbl, next_pyr[0], cfg.n_per_tile,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            quality=cfg.quality, min_distance=cfg.min_distance,
        )

    next_table = lax.cond(
        tracked < cfg.tracked_tol, do_reseed, lambda tbl: tbl, tracked_table
    )

    n3d = state.table.count_3d(state.map.alive)
    key_pose, _ = jax.random.split(key)

    def pnp_branch(op):
        src, nxt, m = op
        X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, state.R, state.t)
        R_d, t_d, inliers = pnp.solve_pnp_ransac(
            X_std, uv, mask, K, key_pose, state.R_s, state.t_s,
            n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
        )
        m = steps.kill_outlier_landmarks(m, lm_slots, mask, inliers)
        return R_d, t_d, src, nxt, m, state.scale, jnp.sum(inliers)

    def tri_branch(op):
        src, nxt, m = op
        corr = src.valid & nxt.valid
        E, inl = essential.find_essential_ransac(
            src.xy, nxt.xy, corr, K, key_pose,
            n_hypos=cfg.e_hypos, thresh_px=cfg.e_thresh,
        )
        R_d, t_unit, X_tri, front = essential.recover_pose(E, src.xy, nxt.xy, inl, K)
        t_d = t_unit * gt_step
        src2, nxt2, m2 = steps.register_triangulated(
            src, nxt, m, X_tri, inl & front, gt_step, state.R, state.t
        )
        return R_d, t_d, src2, nxt2, m2, gt_step, jnp.sum(inl & front)

    R_d, t_d, src_table, next_table, new_map, scale, n_inl = lax.cond(
        n3d >= cfg.tracked_tol,
        pnp_branch,
        tri_branch,
        (state.table, next_table, state.map),
    )

    R_new, t_new, R_s_new, t_s_new, accepted = motion_gate(
        R_d, t_d, state.R, state.t, state.R_s, state.t_s, scale
    )

    new_state = StepState(
        pyr=next_pyr,
        table=next_table,
        map=new_map,
        R=R_new,
        t=t_new,
        R_s=R_s_new,
        t_s=t_s_new,
        scale=scale,
    )
    stats = {
        "tracked": tracked,
        "n3d": n3d,
        "inliers": n_inl,
        "accepted": accepted,
        "used_pnp": n3d >= cfg.tracked_tol,
    }
    return new_state, src_table, stats
