"""Global trajectory refinement: distributed multi-window BA + pose-graph
stitching.

The "north star" decomposition (BASELINE.json): a long trajectory is split
into overlapping keyframe windows; all windows are bundle-adjusted
simultaneously on a (dp, lm) mesh (windows over dp, landmark blocks over lm,
reduced camera systems psum-reduced over ICI); window estimates are then
reconciled into one consistent trajectory by the pose-graph layer. The
reference has no counterpart — it only ever runs one sequential sliding
window (CeresBundleAdjustment.cpp) — so this layer is what turns windowed VO
into a scalable offline refinement.

Landmarks are intentionally duplicated per window (each window refines its
own copy); the stitched output is the pose trajectory, which is what the
error metrics consume. Per-frame feature tables come from any run mode: the
fused production loop persists them on device (StepState.tbl_*_hist) and
materializes them post-run, so a chunked run composes directly with this
layer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pmv_tpu.core import geometry as geo
from pmv_tpu.parallel import dist_ba, pose_graph


def build_window_problems(pipe, window: int = 8, overlap: int = 2,
                          pin: int = 0, obs_gate_px: float = 10.0,
                          min_obs_per_pose: int = 12):
    """Slice a finished pipeline run into overlapping BA windows.

    ``pin`` — number of leading poses pinned per window. The alternate-mode
    solver (the refinement default) needs NO pins: the landmark map anchors
    each window's gauge during the pose step. Joint-Schur mode needs pin=2
    (6-DOF gauge + monocular scale), at the price of inheriting those poses'
    errors.

    ``obs_gate_px`` — stale-binding gate. The refinement pairs historical
    feature tables with the END-OF-RUN map, but the ring map recycles slots
    (~30k inserts into 8192 slots over 598 frames), so an early frame's
    landmark id can now hold a DIFFERENT 3D point. Measured at production
    scale: poisoned windows start at ~60+ px mean residual (healthy: ~1.4)
    and the solver drags their poses hundreds of meters toward the wrong
    map (round-5 13 km blow-up). Observations whose initial residual vs
    the window's own (VO-quality) poses exceeds the gate are dropped, and
    poses left with fewer than ``min_obs_per_pose`` observations are
    FROZEN at their VO values (their chain edges then reproduce VO
    relative motion — graceful degradation instead of divergence).

    Returns (frame_ranges, tr (D, P, 6), lm_copies (D, L, 3), obs arrays,
    pose_free (D, P)) as numpy, one row per window.
    """
    n = len(pipe.t)
    step = max(1, window - overlap)
    starts = list(range(0, max(1, n - window + 1), step))
    if starts and starts[-1] + window < n:
        starts.append(n - window)
    ranges = [list(range(s, min(s + window, n))) for s in starts]
    P = window
    map_xyz = np.asarray(pipe.map.xyz)
    map_alive = np.asarray(pipe.map.alive)
    L = map_xyz.shape[0]

    tr_list, obs_list, free_list = [], [], []
    for frames in ranges:
        tr = np.zeros((P, 6), np.float32)
        free = np.zeros(P, bool)
        obs_uv, obs_pose, obs_lm = [], [], []
        for i, f in enumerate(frames):
            tr[i] = np.asarray(
                geo.pose_to_ba_params(
                    jnp.asarray(pipe.R[f], jnp.float32),
                    jnp.asarray(pipe.t[f], jnp.float32),
                )
            )
            # Global frame 0 is always a true anchor; further pins only when
            # the solver mode requires external gauge fixing.
            free[i] = i >= pin and f != 0
            tbl = pipe.tables[f]
            xy = np.asarray(tbl.xy)
            valid = np.asarray(tbl.valid)
            lm = np.asarray(tbl.landmark)
            ok = valid & (lm >= 0)
            ok[ok] &= map_alive[lm[ok]]
            if obs_gate_px > 0 and ok.any():
                # Stale-binding gate (see docstring): residual of each
                # observation against the frame's VO pose + final map.
                pred = np.asarray(
                    geo.project_points(
                        jnp.asarray(map_xyz[lm[ok]], jnp.float32),
                        jnp.asarray(pipe.R[f], jnp.float32),
                        jnp.asarray(pipe.t[f], jnp.float32),
                        jnp.asarray(np.asarray(pipe.K), jnp.float32),
                    )
                )
                r = np.linalg.norm(pred - xy[ok], axis=1)
                keep = r < obs_gate_px
                idx = np.where(ok)[0][~keep]
                ok[idx] = False
            if ok.sum() < min_obs_per_pose:
                free[i] = False  # under-constrained: hold the VO pose
            obs_uv.append(xy[ok])
            obs_pose.append(np.full(ok.sum(), i, np.int32))
            obs_lm.append(lm[ok].astype(np.int32))
        tr_list.append(tr)
        free_list.append(free)
        obs_list.append(
            (
                np.concatenate(obs_uv).astype(np.float32),
                np.concatenate(obs_pose),
                np.concatenate(obs_lm),
            )
        )
    return ranges, tr_list, free_list, obs_list, map_xyz, L


def global_bundle_adjust(
    pipe,
    mesh: Mesh,
    window: int = 8,
    overlap: int = 2,
    iters: int = 5,
    mode: str = "alternate",
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Refine the whole trajectory with mesh-parallel windowed BA + pose
    graph. Returns (R_list, t_list); also updates pipe.R / pipe.t.

    ``mode="alternate"`` (default) alternates map-anchored pose steps with
    local landmark steps — gauge-free per window, so a drifted trajectory is
    pulled back toward the map instead of the window sliding to fit its own
    noise (which joint Schur with pinned noisy poses does)."""
    n_lm_shards = mesh.shape["lm"]
    dp = mesh.shape["dp"]
    ranges, tr_list, free_list, obs_list, map_xyz, L = build_window_problems(
        pipe, window, overlap, pin=0 if mode == "alternate" else 2
    )
    D = len(ranges)

    # Partition each window's observations by landmark shard; align O_s.
    parts = []
    for obs_uv, obs_pose, obs_lm in obs_list:
        mask = np.ones(len(obs_uv), bool)
        parts.append(
            dist_ba.partition_obs_by_landmark(
                obs_uv, obs_pose, obs_lm, mask, L, n_lm_shards
            )
        )
    O_s = max(p[4] for p in parts)
    Ls = parts[0][5]
    L_pad = Ls * n_lm_shards

    def repad(p):
        uv, pose, lml, msk, o_s, _ = p
        uv = uv.reshape(n_lm_shards, o_s, 2)
        pose = pose.reshape(n_lm_shards, o_s)
        lml = lml.reshape(n_lm_shards, o_s)
        msk = msk.reshape(n_lm_shards, o_s)
        pad = O_s - o_s
        if pad:
            uv = np.pad(uv, ((0, 0), (0, pad), (0, 0)))
            pose = np.pad(pose, ((0, 0), (0, pad)))
            lml = np.pad(lml, ((0, 0), (0, pad)))
            msk = np.pad(msk, ((0, 0), (0, pad)))
        return uv.reshape(-1, 2), pose.reshape(-1), lml.reshape(-1), msk.reshape(-1)

    lm_pad = np.zeros((L_pad, 3), np.float32)
    lm_pad[:L] = map_xyz

    solver = dist_ba.make_distributed_ba(mesh, iters=iters, mode=mode)
    window_R: list[np.ndarray] = [None] * D
    window_t: list[np.ndarray] = [None] * D

    # Process D windows in dp-sized batches (pad the last batch by repeats).
    for b0 in range(0, D, dp):
        idx = list(range(b0, min(b0 + dp, D)))
        while len(idx) < dp:
            idx.append(idx[-1])
        rep = [repad(parts[i]) for i in idx]
        tr_out, _, _, _ = solver(
            jnp.stack([jnp.asarray(tr_list[i]) for i in idx]),
            jnp.stack([jnp.asarray(lm_pad)] * dp),
            jnp.stack([jnp.asarray(r[0]) for r in rep]),
            jnp.stack([jnp.asarray(r[1], dtype=jnp.int32) for r in rep]),
            jnp.stack([jnp.asarray(r[2], dtype=jnp.int32) for r in rep]),
            jnp.stack([jnp.asarray(r[3]) for r in rep]),
            jnp.stack([jnp.asarray(free_list[i]) for i in idx]),
            jnp.asarray(np.asarray(pipe.K), jnp.float32),
        )
        tr_np = np.asarray(tr_out)
        for slot, i in enumerate(idx[: len(set(idx))]):
            if window_R[i] is None:
                R_w, t_w = geo.ba_params_to_pose(jnp.asarray(tr_np[slot]))
                window_R[i] = np.asarray(R_w)
                window_t[i] = np.asarray(t_w)

    # Pose-graph stitch: edges from every window's consecutive pairs.
    E_idx, E_R, E_t = pose_graph.window_edges(
        [r for r in ranges],
        [window_R[i][: len(ranges[i])] for i in range(D)],
        [window_t[i][: len(ranges[i])] for i in range(D)],
    )
    n = len(pipe.t)
    if len(E_idx) and (E_idx[:, 1] - E_idx[:, 0] == 1).all():
        # Window edges form a pure chain: use the exact f64 closed form —
        # the dense f32 GN solve NaNs past ~600 nodes (chain-Laplacian
        # conditioning; see pose_graph.stitch_chain).
        R_out, t_out = pose_graph.stitch_chain(
            n, E_idx, E_R, E_t, np.asarray(pipe.R[0]), np.asarray(pipe.t[0])
        )
    else:
        anchored = np.zeros(n, bool)
        anchored[0] = True
        R0 = np.stack(pipe.R).astype(np.float64)
        t0 = np.stack(pipe.t).astype(np.float64)
        R_out, t_out = pose_graph.optimize(
            jnp.asarray(R0),
            jnp.asarray(t0),
            jnp.asarray(E_idx),
            jnp.asarray(E_R.astype(np.float64)),
            jnp.asarray(E_t.astype(np.float64)),
            jnp.ones(len(E_idx)),
            jnp.asarray(anchored),
            iters=10,
        )
    pipe.R = [np.asarray(R_out[i]) for i in range(n)]
    pipe.t = [np.asarray(t_out[i]) for i in range(n)]
    return pipe.R, pipe.t
