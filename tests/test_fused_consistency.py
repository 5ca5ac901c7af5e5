"""The chunked scan path must be bit-identical to the per-frame path."""

import jax
import jax.numpy as jnp
import numpy as np

from pmv_tpu.core.state import FeatureTable, MapState
from pmv_tpu.frontend.corners import grid_extract, select_top
from pmv_tpu.frontend.image import build_pyramid
from pmv_tpu.io import synthetic
from pmv_tpu.pipeline import fused


def test_chunk_equals_per_frame():
    H, W, N, M, C = 96, 160, 128, 512, 6
    seq = synthetic.make_sequence(n_frames=C + 1, shape=(H, W), density=40, seed=3)
    cfg = fused.StepConfig(
        lk_levels=2, lk_window=15, lk_iters=6, tile_h=H, tile_w=W,
        n_per_tile=64, tracked_tol=48, e_hypos=64, pnp_hypos=64,
        bundle_size=3, ba_iters=3, traj_cap=16,
    )
    img0 = jnp.asarray(seq["images"][0])
    xy, sc, va = grid_extract(img0, 64, tile_h=H, tile_w=W)
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(
        xy=txy, valid=tva, landmark=jnp.full((N,), -1, jnp.int32), score=tsc
    )

    def fresh():
        return fused.init_state(
            pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
            table=table, map_state=MapState.empty(M), cfg=cfg,
        )

    K = jnp.asarray(seq["K"], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    gts = jnp.ones(C, jnp.float32)
    imgs_u8 = jnp.asarray(seq["images"][1:].astype(np.uint8))

    s = fresh()
    cadence = max(1, cfg.bundle_size // 3 * 2)
    for i in range(C):
        s, _, _ = fused.frame_step(
            s, imgs_u8[i].astype(jnp.float32), gts[i], keys[i], K, cfg
        )
        j = int(s.k) - 1
        if cfg.bundle_size and j > 0 and j % cadence == 0:
            s = fused.ba_step(s, K, cfg)

    s2, stats = fused.chunk_step(fresh(), imgs_u8, gts, keys, K, cfg)

    np.testing.assert_array_equal(np.asarray(s.t), np.asarray(s2.t))
    np.testing.assert_array_equal(np.asarray(s.R), np.asarray(s2.R))
    np.testing.assert_array_equal(np.asarray(s.map.xyz), np.asarray(s2.map.xyz))
    np.testing.assert_array_equal(np.asarray(s.t_hist), np.asarray(s2.t_hist))
    np.testing.assert_array_equal(
        np.asarray(s.table.valid), np.asarray(s2.table.valid)
    )
