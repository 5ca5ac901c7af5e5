"""Distributed BA tests on the virtual 8-device CPU mesh: the sharded
solver must agree with the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmv_tpu.ba.schur_lm import ba_solve
from pmv_tpu.parallel import dist_ba, mesh as mesh_lib
from test_ba import make_window


@pytest.fixture(scope="module")
def mesh42():
    return mesh_lib.make_mesh(dp=2, lm=4)


def shard_problem(prob, n_shards):
    """Lay one BAProblem out for the lm-sharded solver."""
    uv, pose, lml, mask, O_s, Ls = dist_ba.partition_obs_by_landmark(
        np.asarray(prob.obs_uv),
        np.asarray(prob.obs_pose),
        np.asarray(prob.obs_lm),
        np.asarray(prob.obs_mask),
        n_landmarks=prob.lm.shape[0],
        n_shards=n_shards,
    )
    L_pad = Ls * n_shards
    lm_pad = np.zeros((L_pad, 3), np.asarray(prob.lm).dtype)
    lm_pad[: prob.lm.shape[0]] = np.asarray(prob.lm)
    return uv, pose, lml, mask, lm_pad, Ls


class TestDistributedBA:
    def test_matches_single_device(self, mesh42):
        rng = np.random.default_rng(0)
        # two independent windows (one per dp shard)
        probs = [make_window(rng, P=5, L=64, noise=0.3)[0] for _ in range(2)]
        n_lm_shards = 4

        # single-device reference solutions
        ref = [ba_solve(p, iters=6) for p in probs]

        # build the (D, ...) global arrays
        parts = [shard_problem(p, n_lm_shards) for p in probs]
        D = 2
        tr = jnp.stack([p.tr for p in probs])
        lm = jnp.stack([jnp.asarray(part[4]) for part in parts])
        obs_uv = jnp.stack([jnp.asarray(part[0]) for part in parts])
        obs_pose = jnp.stack([jnp.asarray(part[1], dtype=jnp.int32) for part in parts])
        obs_lm = jnp.stack([jnp.asarray(part[2], dtype=jnp.int32) for part in parts])
        obs_mask = jnp.stack([jnp.asarray(part[3]) for part in parts])
        pose_free = jnp.stack([p.pose_free for p in probs])
        K = probs[0].K

        solver = dist_ba.make_distributed_ba(mesh42, iters=6)
        tr_out, lm_out, cost0, cost = solver(
            tr, lm, obs_uv, obs_pose, obs_lm, obs_mask, pose_free, K
        )
        for d in range(D):
            tr_ref, lm_ref, stats = ref[d]
            np.testing.assert_allclose(
                np.asarray(tr_out[d]), np.asarray(tr_ref), atol=1e-5
            )
            L = probs[d].lm.shape[0]
            # atol admits f32 reduction-order noise: the sharded path psums
            # partial U blocks, and both lam*diag(U) and the scale-aware
            # Tikhonov term (schur_solve muP) inherit the ordering jitter,
            # amplified over 6 LM iterations.
            np.testing.assert_allclose(
                np.asarray(lm_out[d][:L]), np.asarray(lm_ref),
                rtol=1e-3, atol=5e-4,
            )
            # costs agree too
            np.testing.assert_allclose(
                float(cost[d]), float(stats["cost"]), rtol=1e-6, atol=1e-8
            )

    def test_communication_is_constant_in_landmark_count(self, mesh42):
        """The scaling contract of the lm-sharded solver: cross-shard traffic
        per LM iteration is the psum-reduced camera system + scalars — its
        COUNT and PAYLOAD in the compiled HLO must not grow with the number
        of landmarks (the sharded axis). This is what makes the design
        ICI-friendly at scale (BASELINE.md's >=70% efficiency target)."""
        rng = np.random.default_rng(2)

        def hlo_for(L):
            prob, _, _ = make_window(rng, P=5, L=L, noise=0.2)
            part = shard_problem(prob, 4)
            args = (
                prob.tr[None].repeat(2, 0),
                jnp.asarray(part[4])[None].repeat(2, 0),
                jnp.asarray(part[0])[None].repeat(2, 0),
                jnp.asarray(part[1], dtype=jnp.int32)[None].repeat(2, 0),
                jnp.asarray(part[2], dtype=jnp.int32)[None].repeat(2, 0),
                jnp.asarray(part[3])[None].repeat(2, 0),
                prob.pose_free[None].repeat(2, 0),
                prob.K,
            )
            solver = dist_ba.make_distributed_ba(mesh42, iters=5)
            return jax.jit(solver).lower(*args).compile().as_text()

        def comm_profile(hlo):
            """(count, total result elements) over EVERY collective op —
            all-reduce, all-gather, reduce-scatter, collective-permute,
            all-to-all (and their async -start forms). Result shapes are the
            text between '=' and the op name; tuple-shaped results sum all
            members (re.findall, not a single re.search)."""
            import re

            op_re = re.compile(
                r"=\s*(\(?[^=]*?\)?)\s*"
                r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
                r"all-to-all)(-start)?\("
            )
            shape_re = re.compile(
                r"(?:f64|f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]"
            )
            n = 0
            elems = 0
            for ln in hlo.splitlines():
                m = op_re.search(ln)
                if not m:
                    continue
                n += 1
                for sm in shape_re.finditer(m.group(1)):
                    dims = [int(d) for d in sm.group(1).split(",") if d]
                    sz = 1
                    for d in dims:
                        sz *= d
                    elems += sz
            return n, elems

        n64, elems64 = comm_profile(hlo_for(64))
        n256, elems256 = comm_profile(hlo_for(256))
        assert n64 > 0, "expected collectives in the sharded solver"
        assert n256 == n64, f"collective count grew with L: {n64} -> {n256}"
        assert elems256 == elems64, (
            f"collective payload grew with L: {elems64} -> {elems256}"
        )

    def test_runs_on_8_lm_shards(self):
        rng = np.random.default_rng(1)
        prob, tr_gt, X_gt = make_window(rng, P=5, L=64, noise=0.1)
        m = mesh_lib.make_mesh(dp=1, lm=8)
        part = shard_problem(prob, 8)
        solver = dist_ba.make_distributed_ba(m, iters=5)
        tr_out, lm_out, cost0, cost = solver(
            prob.tr[None],
            jnp.asarray(part[4])[None],
            jnp.asarray(part[0])[None],
            jnp.asarray(part[1], dtype=jnp.int32)[None],
            jnp.asarray(part[2], dtype=jnp.int32)[None],
            jnp.asarray(part[3])[None],
            prob.pose_free[None],
            prob.K,
        )
        assert float(cost[0]) < float(cost0[0])
        err = np.abs(np.asarray(tr_out[0]) - tr_gt).max()
        assert err < 0.02, f"pose error {err}"
