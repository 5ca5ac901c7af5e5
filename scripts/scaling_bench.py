"""Multi-device scaling measurement on the virtual CPU mesh.

One-command repro for the BASELINE.md scaling evidence
(``python scripts/scaling_bench.py``):

1. **dist_ba weak scaling over the lm axis** — per-shard landmark work held
   fixed (Ls landmarks, O_s observations per shard) while shards grow
   1 -> 8. A perfectly scaling solver keeps seconds/call constant
   (efficiency = T1/Tn).
2. **multi_seq weak scaling over the dp axis** — B = dp independent
   sequences per batched chunk step; aggregate frames/s should grow
   linearly (efficiency = fps_n / (n * fps_1)).
3. **Per-iteration collective payload** extracted from the compiled HLO —
   the communication side of the efficiency argument (constant in L; a few
   KB per LM iteration).

Interpretation caveat (report alongside the numbers): the virtual devices
of an ``xla_force_host_platform_device_count`` mesh share this host's
physical cores (2 here), so wall-clock efficiency is bounded by core
count, NOT by the algorithm — per-shard work is genuinely independent
(the HLO contains only the psum-reduced camera system as cross-shard
traffic). On real v5e ICI the collective is ~us-scale for these payloads;
see PERFORMANCE.md's cost model.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DEV = int(os.environ.get("SCALING_DEVICES", "8"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pmv_tpu.parallel import dist_ba, mesh as mesh_lib


def make_weak_problem(n_shards: int, Ls: int = 512, P: int = 5, seed: int = 0):
    """One BA window whose landmarks/observations are exactly Ls per shard
    (every landmark observed by every pose): total L = n_shards * Ls grows
    with the mesh while per-shard work stays fixed."""
    from pmv_tpu.core import geometry as geo

    rng = np.random.default_rng(seed)
    L = n_shards * Ls
    K = np.array([[200.0, 0, 96.0], [0, 200.0, 64.0], [0, 0, 1.0]], np.float32)
    Rs = np.stack([np.eye(3)] * P).astype(np.float32)
    ts = np.stack([[0.0, 0.0, -float(i)] for i in range(P)]).astype(np.float32)
    X = np.stack(
        [rng.uniform(-10, 10, L), rng.uniform(-5, 5, L), rng.uniform(-40, -15, L)],
        -1,
    ).astype(np.float32)
    tr = np.stack(
        [
            np.asarray(geo.pose_to_ba_params(jnp.asarray(Rs[i]), jnp.asarray(ts[i])))
            for i in range(P)
        ]
    ).astype(np.float32)
    obs_uv, obs_pose, obs_lm = [], [], []
    for i in range(P):
        uv = np.asarray(
            geo.project_points(jnp.asarray(X), jnp.asarray(Rs[i]), jnp.asarray(ts[i]), jnp.asarray(K))
        )
        obs_uv.append(uv)
        obs_pose.append(np.full(L, i, np.int32))
        obs_lm.append(np.arange(L, dtype=np.int32))
    tr_noisy = tr + rng.normal(0, 0.01, tr.shape).astype(np.float32)
    tr_noisy[:2] = tr[:2]
    X_noisy = X + rng.normal(0, 0.1, X.shape).astype(np.float32)
    pose_free = np.array([False, False] + [True] * (P - 2))
    uv, pose, lml, mask, O_s, _ = dist_ba.partition_obs_by_landmark(
        np.concatenate(obs_uv).astype(np.float32),
        np.concatenate(obs_pose),
        np.concatenate(obs_lm),
        np.ones(P * L, bool),
        L,
        n_shards,
    )
    return (
        jnp.asarray(tr_noisy)[None],
        jnp.asarray(X_noisy)[None],
        jnp.asarray(uv)[None],
        jnp.asarray(pose, dtype=jnp.int32)[None],
        jnp.asarray(lml, dtype=jnp.int32)[None],
        jnp.asarray(mask)[None],
        jnp.asarray(pose_free)[None],
        jnp.asarray(K),
    ), O_s


def time_call(fn, args, repeats: int = 5) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def collective_payload_bytes(fn, args) -> tuple[int, int]:
    """(num collectives, total result bytes) in the compiled HLO."""
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    op_re = re.compile(
        r"=\s*(\(?[^=]*?\)?)\s*(all-reduce|all-gather|reduce-scatter|"
        r"collective-permute|all-to-all)(-start)?\("
    )
    shape_re = re.compile(r"(f64|f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
    width = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
             "s8": 1, "u8": 1, "pred": 1}
    n = 0
    total = 0
    for ln in hlo.splitlines():
        m = op_re.search(ln)
        if not m:
            continue
        n += 1
        for sm in shape_re.finditer(m.group(1)):
            dims = [int(d) for d in sm.group(2).split(",") if d]
            sz = width[sm.group(1)]
            for d in dims:
                sz *= d
            total += sz
    return n, total


def bench_dist_ba(iters: int = 10, Ls: int = 512) -> list[dict]:
    rows = []
    base = None
    for n in (1, 2, 4, 8):
        if n > N_DEV:
            break
        mesh = mesh_lib.make_mesh(dp=1, lm=n, devices=jax.devices()[:n])
        solver = dist_ba.make_distributed_ba(mesh, iters=iters)
        args, O_s = make_weak_problem(n, Ls=Ls)
        sec = time_call(solver, args)
        ncoll, payload = collective_payload_bytes(solver, args)
        iters_per_sec = iters / sec
        if base is None:
            base = sec
        rows.append(
            {
                "lm_shards": n,
                "landmarks_total": n * Ls,
                "obs_per_shard": O_s,
                "sec_per_call": round(sec, 4),
                "ba_iters_per_sec": round(iters_per_sec, 1),
                "weak_efficiency": round(base / sec, 3),
                "collectives": ncoll,
                "collective_bytes": payload,
            }
        )
    return rows


def _single_core_baseline(kind: str, param: int, iters: int = 10) -> float:
    """Measure the 1-device baseline in a subprocess PINNED TO ONE CORE.

    Without pinning, the 1-device XLA CPU executable spreads its intra-op
    work over every host core — the 'baseline' would already be a
    multi-core measurement and weak efficiency would be confounded (this is
    exactly how a virtual-device mesh misrepresents real hardware, where
    the baseline device does not get the whole machine).
    """
    import subprocess

    proc = subprocess.run(
        ["taskset", "-c", "0", sys.executable, os.path.abspath(__file__),
         "--time-one", kind, str(param), str(iters)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for ln in reversed(proc.stdout.splitlines()):
        if ln.startswith("TIME_ONE "):
            return float(ln.split()[1])
    raise RuntimeError(f"baseline subprocess failed: {proc.stderr[-400:]}")


def _time_one_main(kind: str, param: int, iters: int) -> None:
    """Subprocess entry: print one pinned 1-device timing."""
    if kind == "ba":
        mesh1 = mesh_lib.make_mesh(dp=1, lm=1, devices=jax.devices()[:1])
        s1 = dist_ba.make_distributed_ba(mesh1, iters=iters)
        a1, _ = make_weak_problem(1, Ls=param)
        print(f"TIME_ONE {time_call(s1, a1)}")
    elif kind == "seq":
        rows = bench_multi_seq(only_B=1)
        print(f"TIME_ONE {rows[0]['sec']}")
    else:
        raise ValueError(kind)


def bench_dist_ba_worksweep(iters: int = 10) -> list[dict]:
    """Weak efficiency at lm=2 (== physical cores on this host, the only
    configuration where virtual devices map 1:1 onto real parallel hardware)
    as per-shard work grows: comm is constant (~4.6 KB/iter), so efficiency
    must rise with Ls — the measurable CPU-mesh proxy of the ICI model.
    Baselines are single-core-pinned (see _single_core_baseline)."""
    rows = []
    for Ls in (512, 2048, 8192):
        mesh2 = mesh_lib.make_mesh(dp=1, lm=2, devices=jax.devices()[:2])
        s2 = dist_ba.make_distributed_ba(mesh2, iters=iters)
        a2, _ = make_weak_problem(2, Ls=Ls)
        t1 = _single_core_baseline("ba", Ls, iters)
        t2 = time_call(s2, a2)
        rows.append(
            {
                "Ls_per_shard": Ls,
                "sec_1shard_pinned": round(t1, 4),
                "sec_2shards_2x_work": round(t2, 4),
                "weak_efficiency_at_2": round(t1 / t2, 3),
            }
        )
    return rows


def bench_multi_seq(chunks: int = 3, C: int = 4, only_B: int | None = None) -> list[dict]:
    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.io import synthetic
    from pmv_tpu.parallel import multi_seq
    from pmv_tpu.pipeline import fused

    H, W, N, M = 96, 160, 128, 512
    cfg = fused.StepConfig(
        lk_levels=3, lk_window=15, lk_iters=5, tile_h=H, tile_w=W,
        n_per_tile=N, tracked_tol=32, e_hypos=64, pnp_hypos=64,
        bundle_size=4, ba_iters=3, traj_cap=32, response="min_eig_xla",
    )
    K = jnp.asarray(
        np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    )
    rows = []
    base = None
    n_frames = chunks * C + 1
    for B in (1, 2, 4, 8) if only_B is None else (only_B,):
        if B > N_DEV:
            break
        mesh = mesh_lib.make_mesh(dp=B, lm=1, devices=jax.devices()[:B])
        states, img_batches = [], []
        for b in range(B):
            seq = synthetic.make_sequence(n_frames=n_frames, shape=(H, W), density=30, seed=b)
            img0 = jnp.asarray(seq["images"][0])
            from pmv_tpu.frontend.corners import grid_extract, select_top

            xy, sc, va = grid_extract(img0, N, tile_h=H, tile_w=W, response="min_eig_xla")
            txy, tsc, tva = select_top(xy, sc, va, N)
            table = FeatureTable(
                xy=txy, valid=tva, landmark=jnp.full((N,), -1, jnp.int32), score=tsc
            )
            states.append(
                fused.init_state(
                    pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
                    table=table, map_state=MapState.empty(M), cfg=cfg,
                )
            )
            img_batches.append(seq["images"][1:].astype(np.uint8))
        state = multi_seq.batch_states(states)
        step = multi_seq.make_batched_chunk_step(mesh, cfg)
        imgs = jnp.asarray(np.stack(img_batches))  # (B, chunks*C, H, W)
        keys = jnp.asarray(
            np.stack(
                [np.asarray(jax.random.split(jax.random.PRNGKey(b), chunks * C)) for b in range(B)]
            )
        )
        gts = jnp.ones((B, chunks * C), jnp.float32)

        def run_all(state):
            for c in range(chunks):
                sl = slice(c * C, (c + 1) * C)
                state, _ = step(state, imgs[:, sl], gts[:, sl], keys[:, sl], K)
            return state

        out = run_all(state)  # warmup (compile)
        jax.block_until_ready(out.t)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_all(state)
            jax.block_until_ready(out.t)
            best = min(best, time.perf_counter() - t0)
        fps = B * chunks * C / best
        if base is None:
            base = fps
        rows.append(
            {
                "dp": B,
                "frames_per_sec": round(fps, 2),
                "sec": round(best, 3),
                "weak_efficiency": round(fps / (B * base), 3),
            }
        )
    return rows


def main() -> None:
    import multiprocessing

    if len(sys.argv) > 1 and sys.argv[1] == "--time-one":
        _time_one_main(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    cores = multiprocessing.cpu_count()
    print(f"# host: {cores} physical cores, {N_DEV} virtual devices "
          f"(wall-clock efficiency is bounded by cores/devices = "
          f"{min(1.0, cores / N_DEV):.2f} on this host)")
    print("\n## dist_ba weak scaling (lm axis, fixed per-shard work)")
    ba_rows = bench_dist_ba()
    for r in ba_rows:
        print(json.dumps(r))
    print("\n## dist_ba per-shard-work sweep at lm=2 (== physical cores)")
    sweep_rows = bench_dist_ba_worksweep()
    for r in sweep_rows:
        print(json.dumps(r))
    print("\n## multi_seq weak scaling (dp axis, B sequences)")
    seq_rows = bench_multi_seq()
    # pinned single-core baseline (12 frames / t1)
    t1 = _single_core_baseline("seq", 0)
    fps1_pinned = 12.0 / t1
    for r in seq_rows:
        r["weak_efficiency_vs_pinned_core"] = round(
            r["frames_per_sec"] / (r["dp"] * fps1_pinned), 3
        )
        print(json.dumps(r))
    out = {
        "cores": cores,
        "devices": N_DEV,
        "dist_ba": ba_rows,
        "dist_ba_worksweep": sweep_rows,
        "multi_seq": seq_rows,
    }
    Path("/tmp/pmv_scaling.json").write_text(json.dumps(out, indent=1))
    print("\nwrote /tmp/pmv_scaling.json")


if __name__ == "__main__":
    main()
