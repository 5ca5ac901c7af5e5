"""Fine-grained scan-differenced decomposition of the pose-estimation stage
and the BA call on the real chip.

The round-3 profile reads LK 2.2 / pose 2.1 / BA 2.2 ms/frame, but the PnP
core (sampling + DLT + scoring + GN) is only 0.71 ms (tpu_pnp_bench) — the
rest of the pose stage is bookkeeping: pnp_inputs' map gathers, the outlier
kill scatter, the motion gate, and the 8 per-frame history row writes. This
bench isolates those, and the BA call's assemble / solve / compaction split,
so the next optimization targets measurements.

Usage: python scripts/tpu_stage_bench.py    (idle host!)
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

SHAPE = (370, 1226)
C = int(os.environ.get("PROF_CHUNK", "32"))
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
    from pmv_tpu.ba import schur_lm
    from pmv_tpu.core import geometry as geo
    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.corners import grid_extract, select_top
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.io import synthetic
    from pmv_tpu.pipeline import fused, steps
    from pmv_tpu.pipeline.heuristics import motion_gate
    from pmv_tpu.solvers import pnp

    print(f"device: {jax.devices()[0]}  C={C} repeats={REPEATS}")
    H, W = SHAPE
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
                              quality=0.01, min_distance=5, response="min_eig_xla")
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(xy=txy, valid=tva,
                         landmark=jnp.full((N,), -1, jnp.int32), score=tsc)
    state0 = fused.init_state(
        pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
        table=table, map_state=MapState.empty(M), cfg=cfg,
    )
    imgs = jax.device_put(seq["images"][1:9].astype(np.uint8))
    gts8 = jnp.ones((8,), jnp.float32)
    keys8 = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(0), 8)))
    state, _ = fused.chunk_step(state0, imgs, gts8, keys8, K, cfg)
    np.asarray(state.t)

    keys = jnp.asarray(np.asarray(jax.random.split(jax.random.PRNGKey(7), C)))

    def scan(fn):
        def body(c, key):
            return c + fn(key), 0
        return jax.jit(lambda ks: lax.scan(body, jnp.float32(0), ks)[0])

    # --- pose-stage decomposition (steady-state PnP branch inputs) ---
    src, nxt, m = state.table, state.table, state.map

    def s_base(key):
        return jax.random.uniform(key)

    def s_inputs(key):
        X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, state.R, state.t)
        return jnp.sum(X_std) + jnp.sum(uv) + jnp.sum(mask) + jax.random.uniform(key)

    def s_solve(key):
        X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, state.R, state.t)
        R_d, t_d, inl = pnp.solve_pnp_ransac(
            X_std, uv, mask, K, key, state.R_s, state.t_s,
            n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
        )
        return R_d[0, 0] + t_d[0] + jnp.sum(inl).astype(jnp.float32)

    def s_kill(key):
        X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, state.R, state.t)
        R_d, t_d, inl = pnp.solve_pnp_ransac(
            X_std, uv, mask, K, key, state.R_s, state.t_s,
            n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
        )
        m2 = steps.kill_outlier_landmarks(m, lm_slots, mask, inl)
        Rn, tn, Rs, ts, acc = motion_gate(
            R_d, t_d, state.R, state.t, state.R_s, state.t_s, state.scale
        )
        return Rn[0, 0] + tn[0] + jnp.sum(m2.alive).astype(jnp.float32) + acc

    def s_hist(key):
        # The 8 per-frame history row writes (R/t + 3 table columns x 2 rows).
        k = (jnp.floor(jax.random.uniform(key) * 8).astype(jnp.int32) + 4)
        s2 = state._replace(
            R_hist=state.R_hist.at[k + 1].set(state.R),
            t_hist=state.t_hist.at[k + 1].set(state.t),
            tbl_xy_hist=state.tbl_xy_hist.at[k].set(src.xy).at[k + 1].set(nxt.xy),
            tbl_valid_hist=state.tbl_valid_hist.at[k].set(src.valid).at[k + 1].set(nxt.valid),
            tbl_lm_hist=state.tbl_lm_hist.at[k].set(src.landmark).at[k + 1].set(nxt.landmark),
        )
        return s2.R_hist[0, 0, 0] + s2.t_hist[0, 0] + s2.tbl_xy_hist[0, 0, 0]

    def s_reseed_check(key):
        tracked = state.table.num_valid()
        tbl, blocks = lax.cond(
            tracked < jnp.int32(0),  # never taken, measures cond overhead
            lambda op: op, lambda op: op, (state.table, state.blocks),
        )
        return jnp.sum(tbl.valid).astype(jnp.float32) + jax.random.uniform(key)

    t0 = best_of(scan(s_base), (keys,), lambda o: o)
    ms = lambda t: (t - t0) / C * 1e3
    print(f"scan control            : {t0 / C * 1e3:7.3f} ms/it")
    for name, fn in [
        ("pnp_inputs (map gathers)", s_inputs),
        ("+ solve_pnp_ransac      ", s_solve),
        ("+ kill scatter + gate   ", s_kill),
        ("hist row writes (alone) ", s_hist),
        ("reseed cond (alone)     ", s_reseed_check),
    ]:
        t = best_of(scan(fn), (keys,), lambda o: o)
        print(f"{name}: {ms(t):7.3f} ms/it")

    # --- reseed path (fires when tracked < reseed_tol=300; the suspected
    # unaccounted ~1.3 ms/frame of the frame_step pose stage) ---
    img_f = jnp.asarray(seq["images"][10].astype(np.float32))
    lkmod = steps.lk_module(cfg.lk_impl, cfg.lk_window, cfg.lk_search)

    def s_reseed(key):
        tbl2 = steps.reseed_step(
            state.table._replace(valid=state.table.valid & (jax.random.uniform(key) < 2.0)),
            img_f, cfg.n_per_tile, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            quality=cfg.quality, min_distance=cfg.min_distance,
            response=cfg.response,
        )
        return jnp.sum(tbl2.xy) + jnp.sum(tbl2.valid).astype(jnp.float32)

    def s_reseed_capture(key):
        tbl2 = steps.reseed_step(
            state.table._replace(valid=state.table.valid & (jax.random.uniform(key) < 2.0)),
            img_f, cfg.n_per_tile, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            quality=cfg.quality, min_distance=cfg.min_distance,
            response=cfg.response,
        )
        pyr = tuple(build_pyramid(img_f, cfg.lk_levels))
        blocks2 = lkmod.capture_blocks(
            pyr, tbl2.xy, win=cfg.lk_window,
            search=cfg.lk_search if cfg.lk_search > 0 else None,
        )
        return jnp.sum(tbl2.xy) + blocks2[0][0][0, 0, 0]

    for name, fn in [
        ("reseed_step (per fire)  ", s_reseed),
        ("reseed + block recapture", s_reseed_capture),
    ]:
        t = best_of(scan(fn), (keys,), lambda o: o)
        print(f"{name}: {ms(t):7.3f} ms/it")

    # --- full frame_step vs a manually composed cond-free step: the
    # difference is the lax.cond machinery + the untaken tri branch ---
    imgs32 = jax.device_put(seq["images"][9 : 9 + C].astype(np.uint8))
    gtsC = jnp.ones((C,), jnp.float32)

    @jax.jit
    def scan_frame_step(st, imgs_u8, ks):
        def body(s, xs):
            img, key, gt = xs
            s, _, _ = fused.frame_step(s, img.astype(jnp.float32), gt, key, K, cfg)
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    @jax.jit
    def scan_manual(st, imgs_u8, ks):
        def body(s, xs):
            img, key, gt = xs
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            key_pose, _ = jax.random.split(key)
            X_std, uv, mask, lm_slots = steps.pnp_inputs(s.table, tbl, s.map, s.R, s.t)
            R_d, t_d, inl = pnp.solve_pnp_ransac(
                X_std, uv, mask, K, key_pose, s.R_s, s.t_s,
                n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
            )
            m2 = steps.kill_outlier_landmarks(s.map, lm_slots, mask, inl)
            Rn, tn, Rs, ts, acc = motion_gate(
                R_d, t_d, s.R, s.t, s.R_s, s.t_s, s.scale
            )
            k_new = s.k + 1
            s = s._replace(
                blocks=blocks, table=tbl, map=m2, R=Rn, t=tn, R_s=Rs, t_s=ts,
                k=k_new,
                R_hist=s.R_hist.at[k_new].set(Rn),
                t_hist=s.t_hist.at[k_new].set(tn),
                tbl_xy_hist=s.tbl_xy_hist.at[k_new].set(tbl.xy),
                tbl_valid_hist=s.tbl_valid_hist.at[k_new].set(tbl.valid),
                tbl_lm_hist=s.tbl_lm_hist.at[k_new].set(tbl.landmark),
            )
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    @jax.jit
    def scan_manual_reseed_cond(st, imgs_u8, ks):
        """Manual step + ONLY the reseed lax.cond (pnp unconditional)."""
        def body(s, xs):
            img, key, gt = xs
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            tracked = tbl.num_valid()
            lkmod2 = steps.lk_module(cfg.lk_impl, cfg.lk_window, cfg.lk_search)

            def do_reseed(op):
                t_, _ = op
                t2 = steps.reseed_step(
                    t_, pyr[0], cfg.n_per_tile, tile_h=cfg.tile_h,
                    tile_w=cfg.tile_w, quality=cfg.quality,
                    min_distance=cfg.min_distance, response=cfg.response,
                )
                b2 = lkmod2.capture_blocks(
                    pyr, t2.xy, win=cfg.lk_window,
                    search=cfg.lk_search if cfg.lk_search > 0 else None,
                )
                return t2, b2

            tbl, blocks = lax.cond(
                tracked < 300, do_reseed, lambda op: op, (tbl, blocks)
            )
            key_pose, _ = jax.random.split(key)
            X_std, uv, mask, lm_slots = steps.pnp_inputs(s.table, tbl, s.map, s.R, s.t)
            R_d, t_d, inl = pnp.solve_pnp_ransac(
                X_std, uv, mask, K, key_pose, s.R_s, s.t_s,
                n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
            )
            m2 = steps.kill_outlier_landmarks(s.map, lm_slots, mask, inl)
            Rn, tn, Rs, ts, acc = motion_gate(
                R_d, t_d, s.R, s.t, s.R_s, s.t_s, s.scale
            )
            s = s._replace(blocks=blocks, table=tbl, map=m2, R=Rn, t=tn,
                           R_s=Rs, t_s=ts, k=s.k + 1)
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    @jax.jit
    def scan_manual_tri_cond(st, imgs_u8, ks):
        """Manual step + ONLY the pnp/tri lax.cond (no reseed at all)."""
        def body(s, xs):
            img, key, gt = xs
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            n3d = s.table.count_3d(s.map.alive)
            key_pose, _ = jax.random.split(key)

            def pnp_branch(op):
                src, nxt, m = op
                X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, s.R, s.t)
                R_d, t_d, inl = pnp.solve_pnp_ransac(
                    X_std, uv, mask, K, key_pose, s.R_s, s.t_s,
                    n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
                )
                m2 = steps.kill_outlier_landmarks(m, lm_slots, mask, inl)
                return R_d, t_d, src, nxt, m2, s.scale, jnp.sum(inl)

            def tri_branch(op):
                src, nxt, m = op
                corr = src.valid & nxt.valid
                from pmv_tpu.solvers.five_point import (
                    find_essential_5pt_ransac, ransac_budget)
                from pmv_tpu.solvers import essential
                E, inl = find_essential_5pt_ransac(
                    src.xy, nxt.xy, corr, K, key_pose,
                    n_hypos=ransac_budget(cfg.e_hypos), thresh_px=cfg.e_thresh,
                )
                R_d, t_unit, X_tri, front = essential.recover_pose(
                    E, src.xy, nxt.xy, inl, K)
                t_d = t_unit * gt
                src2, nxt2, m2 = steps.register_triangulated(
                    src, nxt, m, X_tri, inl & front, gt, s.R, s.t)
                return R_d, t_d, src2, nxt2, m2, gt, jnp.sum(inl & front)

            R_d, t_d, src2, nxt2, m2, sc, n_inl = lax.cond(
                n3d >= cfg.tracked_tol, pnp_branch, tri_branch,
                (s.table, tbl, s.map),
            )
            Rn, tn, Rs, ts, acc = motion_gate(
                R_d, t_d, s.R, s.t, s.R_s, s.t_s, sc
            )
            s = s._replace(blocks=blocks, table=nxt2, map=m2, R=Rn, t=tn,
                           R_s=Rs, t_s=ts, scale=sc, k=s.k + 1)
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    @jax.jit
    def scan_manual_dummy_cond(st, imgs_u8, ks):
        """Manual step + a cond whose else-branch is trivial — isolates the
        cond/predicate stall from the branch-body (five-point) size."""
        def body(s, xs):
            img, key, gt = xs
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            n3d = s.table.count_3d(s.map.alive)
            key_pose, _ = jax.random.split(key)

            def pnp_branch(op):
                src, nxt, m = op
                X_std, uv, mask, lm_slots = steps.pnp_inputs(src, nxt, m, s.R, s.t)
                R_d, t_d, inl = pnp.solve_pnp_ransac(
                    X_std, uv, mask, K, key_pose, s.R_s, s.t_s,
                    n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
                )
                m2 = steps.kill_outlier_landmarks(m, lm_slots, mask, inl)
                return R_d, t_d, src, nxt, m2

            def dummy_branch(op):
                src, nxt, m = op
                return s.R_s, s.t_s * gt, src, nxt, m

            R_d, t_d, src2, nxt2, m2 = lax.cond(
                n3d >= cfg.tracked_tol, pnp_branch, dummy_branch,
                (s.table, tbl, s.map),
            )
            Rn, tn, Rs, ts, acc = motion_gate(
                R_d, t_d, s.R, s.t, s.R_s, s.t_s, s.scale
            )
            s = s._replace(blocks=blocks, table=nxt2, map=m2, R=Rn, t=tn,
                           R_s=Rs, t_s=ts, k=s.k + 1)
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    @jax.jit
    def scan_manual_reseed_select(st, imgs_u8, ks):
        """Manual step + ALWAYS-run reseed/recapture with a masked select —
        no cond at all (same semantics as the reseed cond when it fires)."""
        def body(s, xs):
            img, key, gt = xs
            pyr = tuple(build_pyramid(img.astype(jnp.float32), cfg.lk_levels))
            tbl, blocks = steps.track_step_cached(
                s.blocks, list(pyr), s.table,
                win=cfg.lk_window, iters=cfg.lk_iters, search=cfg.lk_search,
                impl=cfg.lk_impl,
            )
            fire = tbl.num_valid() < 300
            lkmod2 = steps.lk_module(cfg.lk_impl, cfg.lk_window, cfg.lk_search)
            tbl2 = steps.reseed_step(
                tbl, pyr[0], cfg.n_per_tile, tile_h=cfg.tile_h,
                tile_w=cfg.tile_w, quality=cfg.quality,
                min_distance=cfg.min_distance, response=cfg.response,
            )
            blocks2 = lkmod2.capture_blocks(
                pyr, tbl2.xy, win=cfg.lk_window,
                search=cfg.lk_search if cfg.lk_search > 0 else None,
            )
            sel = lambda a, b: jnp.where(fire, a, b)  # scalar cond broadcasts
            tbl = jax.tree.map(sel, tbl2, tbl)
            blocks = jax.tree.map(sel, blocks2, blocks)
            key_pose, _ = jax.random.split(key)
            X_std, uv, mask, lm_slots = steps.pnp_inputs(s.table, tbl, s.map, s.R, s.t)
            R_d, t_d, inl = pnp.solve_pnp_ransac(
                X_std, uv, mask, K, key_pose, s.R_s, s.t_s,
                n_hypos=cfg.pnp_hypos, thresh_px=cfg.pnp_thresh,
            )
            m2 = steps.kill_outlier_landmarks(s.map, lm_slots, mask, inl)
            Rn, tn, Rs, ts, acc = motion_gate(
                R_d, t_d, s.R, s.t, s.R_s, s.t_s, s.scale
            )
            s = s._replace(blocks=blocks, table=tbl, map=m2, R=Rn, t=tn,
                           R_s=Rs, t_s=ts, k=s.k + 1)
            return s, 0
        return lax.scan(body, st, (imgs_u8, ks, gtsC))[0]

    for name, fn in [
        ("frame_step (scan, noba) ", scan_frame_step),
        ("manual cond-free step   ", scan_manual),
        ("manual + reseed cond    ", scan_manual_reseed_cond),
        ("manual + tri cond       ", scan_manual_tri_cond),
        ("manual + dummy cond     ", scan_manual_dummy_cond),
        ("manual + reseed select  ", scan_manual_reseed_select),
    ]:
        t = best_of(fn, (state, imgs32, keys), lambda o: o.t)
        print(f"{name}: {(t - t0) / C * 1e3:7.3f} ms/it")

    # --- BA decomposition ---
    P = cfg.bundle_size
    fn_ = state.k + 1
    f_ids = fn_ - P + jnp.arange(P)
    f_safe = jnp.clip(f_ids, 0)
    xy_w = state.tbl_xy_hist[f_safe]
    valid_w = state.tbl_valid_hist[f_safe] & (f_ids >= 0)[:, None]
    lm_w = state.tbl_lm_hist[f_safe]

    def s_ba_assemble_window(key):
        obs_uv, obs_pose, obs_lm, obs_mask = steps.assemble_ba_window(
            xy_w, valid_w, lm_w, state.map
        )
        return jnp.sum(obs_uv) + jnp.sum(obs_mask) + jax.random.uniform(key)

    def s_ba_compact(key):
        obs_uv, obs_pose, obs_lm, obs_mask = steps.assemble_ba_window(
            xy_w, valid_w, lm_w, state.map
        )
        L_win = 2 * N
        big = jnp.int32(state.map.capacity)
        ids = jnp.where(obs_mask, obs_lm, big)
        uniq = jnp.unique(ids, size=L_win, fill_value=big)
        local = jnp.searchsorted(uniq, ids).astype(jnp.int32)
        return jnp.sum(local).astype(jnp.float32) + jax.random.uniform(key)

    def s_ba_full(key):
        s2 = fused.ba_step(state, K, cfg)
        return s2.t[0] + s2.map.xyz[0, 0] + jax.random.uniform(key)

    for name, fn in [
        ("BA window gather        ", s_ba_assemble_window),
        ("BA + unique/searchsorted", s_ba_compact),
        ("BA full call            ", s_ba_full),
    ]:
        t = best_of(scan(fn), (keys,), lambda o: o)
        print(f"{name}: {ms(t):7.3f} ms/it")

    # one LM iteration's assemble vs solve, at window shapes
    L_win = 2 * N
    obs_uv, obs_pose, obs_lm, obs_mask = steps.assemble_ba_window(
        xy_w, valid_w, lm_w, state.map
    )
    big = jnp.int32(state.map.capacity)
    ids = jnp.where(obs_mask, obs_lm, big)
    uniq = jnp.unique(ids, size=L_win, fill_value=big)
    local = jnp.minimum(jnp.searchsorted(uniq, ids).astype(jnp.int32), L_win - 1)
    obs_mask2 = obs_mask & (uniq[local] == ids)
    lm_local = state.map.xyz[jnp.minimum(uniq, state.map.capacity - 1)]
    tr = geo.pose_to_ba_params(state.R_hist[f_safe], state.t_hist[f_safe])
    pose_free = f_ids >= 1

    def s_assemble_once(key):
        U, V, Wc, b_pose, b_lm, has_obs = schur_lm.assemble_blocks(
            tr, lm_local, obs_uv, obs_pose, local, obs_mask2, pose_free, K, 1.0
        )
        return jnp.sum(U) + jnp.sum(b_lm) + jax.random.uniform(key)

    def s_schur_once(key):
        U, V, Wc, b_pose, b_lm, has_obs = schur_lm.assemble_blocks(
            tr, lm_local, obs_uv, obs_pose, local, obs_mask2, pose_free, K, 1.0
        )
        dp, dx = schur_lm.schur_solve(
            U, V, Wc, b_pose, b_lm, has_obs, pose_free, jnp.float32(1e-4)
        )
        return jnp.sum(dp) + jnp.sum(dx) + jax.random.uniform(key)

    def s_cost_once(key):
        prob = schur_lm.BAProblem(
            tr=tr, lm=lm_local, obs_uv=obs_uv, obs_pose=obs_pose,
            obs_lm=local, obs_mask=obs_mask2, pose_free=pose_free, K=K,
        )
        return schur_lm.robust_cost(tr, lm_local, prob) + jax.random.uniform(key)

    for name, fn in [
        ("LM assemble (1 iter)    ", s_assemble_once),
        ("LM assemble+schur (1 it)", s_schur_once),
        ("LM cost eval (1 iter)   ", s_cost_once),
    ]:
        t = best_of(scan(fn), (keys,), lambda o: o)
        print(f"{name}: {ms(t):7.3f} ms/it")


if __name__ == "__main__":
    main()
