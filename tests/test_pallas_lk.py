"""Pallas pyramidal-LK kernel vs the XLA tap-matrix tracker.

Interpreter mode on the CPU mesh; the identical kernel compiles natively
on TPU (where it replaces ~10 ms/frame of ~3%-utilization MXU matmuls
with lane-parallel VPU work)."""

import jax.numpy as jnp
import numpy as np

from pmv_tpu.frontend import corners, image, lucas_kanade as lk, pallas_lk
from pmv_tpu.io import synthetic


def _setup(n_frames=3, seed=2, n_per_tile=48):
    seq = synthetic.make_sequence(
        n_frames=n_frames, shape=(128, 192), density=30, seed=seed
    )
    imgs = [jnp.asarray(f) for f in seq["images"]]
    xy, score, valid = corners.grid_extract(
        imgs[0], n_per_tile=n_per_tile, tile_h=128, tile_w=192
    )
    pyrs = [image.build_pyramid(im, 3) for im in imgs]
    return imgs, xy, valid, pyrs


class TestPallasLK:
    def test_matches_xla_tracker(self):
        imgs, xy, valid, pyrs = _setup()
        win = 15

        ref_blocks = lk.capture_blocks(tuple(pyrs[0]), xy, win=win)
        pal_blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy, win=win)
        ref_xy, ref_st, ref_blocks = lk.track_cached(
            ref_blocks, pyrs[1], xy, valid, win=win
        )
        pal_xy, pal_st, pal_blocks = pallas_lk.track_cached(
            pal_blocks, pyrs[1], xy, valid, win=win
        )
        both = np.asarray(ref_st) & np.asarray(pal_st)
        assert both.sum() >= int(np.asarray(ref_st).sum()) * 0.95
        np.testing.assert_allclose(
            np.asarray(pal_xy)[both], np.asarray(ref_xy)[both], atol=5e-3
        )

        # second hop: templates come from blocks captured DURING tracking,
        # exercising the (Rg, Rg, N) block threading
        ref2_xy, ref2_st, _ = lk.track_cached(
            ref_blocks, pyrs[2], ref_xy, ref_st, win=win
        )
        pal2_xy, pal2_st, _ = pallas_lk.track_cached(
            pal_blocks, pyrs[2], pal_xy, pal_st, win=win
        )
        both2 = np.asarray(ref2_st) & np.asarray(pal2_st)
        assert both2.sum() >= int(np.asarray(ref2_st).sum()) * 0.9
        np.testing.assert_allclose(
            np.asarray(pal2_xy)[both2], np.asarray(ref2_xy)[both2], atol=2e-2
        )

    def test_block_layout_is_feature_lanes(self):
        _, xy, valid, pyrs = _setup(n_frames=2)
        blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy, win=15)
        N = xy.shape[0]
        blk, r0, c0 = blocks[0]
        Rg = lk.region_size(15, lk._resolve_search(15, None))
        assert blk.shape == (Rg, Rg, N)
        assert r0.shape == (N,)

    def test_non_multiple_of_128_features(self):
        """N not divisible by the 128-lane program width must pad cleanly."""
        imgs, xy, valid, pyrs = _setup()
        n = 33
        xy33, valid33 = xy[:n], valid[:n]
        blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy33, win=15)
        pal_xy, pal_st, _ = pallas_lk.track_cached(
            blocks, pyrs[1], xy33, valid33, win=15
        )
        ref_blocks = lk.capture_blocks(tuple(pyrs[0]), xy33, win=15)
        ref_xy, ref_st, _ = lk.track_cached(ref_blocks, pyrs[1], xy33, valid33, win=15)
        both = np.asarray(ref_st) & np.asarray(pal_st)
        assert both.sum() >= 1
        np.testing.assert_allclose(
            np.asarray(pal_xy)[both], np.asarray(ref_xy)[both], atol=5e-3
        )

    def test_invalid_slots_stay_invalid(self):
        imgs, xy, valid, pyrs = _setup(n_frames=2)
        valid1 = jnp.zeros_like(valid).at[0].set(valid[0])
        blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy, win=15)
        _, st, _ = pallas_lk.track_cached(blocks, pyrs[1], xy, valid1, win=15)
        assert not bool(st[1:].any())


def test_fused_pipeline_with_pallas_lk():
    """chunk_step with lk_impl='pallas' (interpret mode on CPU) must stay
    close to the tap-matrix path over a short fused run."""
    import jax

    from pmv_tpu.core.state import FeatureTable, MapState
    from pmv_tpu.frontend.corners import grid_extract, select_top
    from pmv_tpu.frontend.image import build_pyramid
    from pmv_tpu.pipeline import fused

    H, W, N, M, C = 96, 160, 128, 512, 4
    seq = synthetic.make_sequence(n_frames=C + 1, shape=(H, W), density=40, seed=3)
    img0 = jnp.asarray(seq["images"][0])
    xy, sc, va = grid_extract(img0, 64, tile_h=H, tile_w=W)
    txy, tsc, tva = select_top(xy, sc, va, N)
    table = FeatureTable(
        xy=txy, valid=tva, landmark=jnp.full((N,), -1, jnp.int32), score=tsc
    )
    K = jnp.asarray(seq["K"], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    gts = jnp.ones(C, jnp.float32)
    imgs_u8 = jnp.asarray(seq["images"][1:].astype(np.uint8))

    outs = {}
    for impl in ("tap", "pallas"):
        cfg = fused.StepConfig(
            lk_levels=2, lk_window=15, lk_iters=6, tile_h=H, tile_w=W,
            n_per_tile=64, tracked_tol=48, e_hypos=64, pnp_hypos=64,
            bundle_size=3, ba_iters=3, traj_cap=16, lk_impl=impl,
        )
        state = fused.init_state(
            pyr=tuple(build_pyramid(img0, cfg.lk_levels)),
            table=table, map_state=MapState.empty(M), cfg=cfg,
        )
        s, _ = fused.chunk_step(state, imgs_u8, gts, keys, K, cfg)
        outs[impl] = np.asarray(s.t_hist[: C + 1])

    # trackers agree to ~1e-2 px -> trajectories agree to small tolerance
    np.testing.assert_allclose(outs["pallas"], outs["tap"], atol=0.05)


class TestLargeRegion:
    """Large regions (the reference-default win=32, Rg=84) run one
    single-buffered pallas_call per lane group — pallas's grid pipelining
    double-buffers block I/O past Mosaic's scoped-VMEM stack there."""

    def test_win32_uses_per_group_and_matches_tap(self):
        assert not pallas_lk._grid_pipelines(lk.region_size(32, 16))
        assert pallas_lk.fits_vmem(lk.region_size(32, 16))
        assert pallas_lk._grid_pipelines(lk.region_size(21, 10))
        imgs, xy, valid, pyrs = _setup()
        win = 32

        ref_blocks = lk.capture_blocks(tuple(pyrs[0]), xy, win=win)
        pal_blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy, win=win)
        ref_xy, ref_st, _ = lk.track_cached(ref_blocks, pyrs[1], xy, valid, win=win)
        pal_xy, pal_st, _ = pallas_lk.track_cached(
            pal_blocks, pyrs[1], xy, valid, win=win
        )
        both = np.asarray(ref_st) & np.asarray(pal_st)
        assert both.sum() >= int(np.asarray(ref_st).sum()) * 0.95
        np.testing.assert_allclose(
            np.asarray(pal_xy)[both], np.asarray(ref_xy)[both], atol=5e-3
        )

    def test_per_group_path_matches_pipelined_in_interpret(self):
        """The per-lane-group single-buffered branch (what win=32 actually
        runs on chip) must produce bit-identical output to the pipelined
        branch — force_groups exercises its slicing and re-assembly in
        interpret mode, where it would otherwise be unreachable."""
        # >128 features so the per-group path runs >1 lane group (the
        # concat re-assembly is what needs coverage).
        imgs, xy, valid, pyrs = _setup(n_frames=2, n_per_tile=160)
        win = 32
        blocks = pallas_lk.capture_blocks(tuple(pyrs[0]), xy, win=win)
        pipe_xy, pipe_st, _ = pallas_lk.track_cached(
            blocks, pyrs[1], xy, valid, win=win
        )
        grp_xy, grp_st, _ = pallas_lk.track_cached(
            blocks, pyrs[1], xy, valid, win=win, force_groups=True
        )
        np.testing.assert_array_equal(np.asarray(grp_st), np.asarray(pipe_st))
        np.testing.assert_array_equal(np.asarray(grp_xy), np.asarray(pipe_xy))

    def test_shift_equals_reference_select(self):
        rng = np.random.default_rng(0)
        buf = jnp.asarray(rng.normal(size=(30, 30, 8)).astype(np.float32))
        k0 = np.asarray(rng.integers(0, 9, (1, 1, 8)), np.int32)
        for axis in (0, 1):
            got = np.asarray(
                pallas_lk._select_shift(jnp.asarray(buf), jnp.asarray(k0), 21, 9, axis=axis)
            )
            for lane in range(8):
                k = int(k0[0, 0, lane])
                want = (
                    np.asarray(buf)[k : k + 21, :, lane]
                    if axis == 0
                    else np.asarray(buf)[:, k : k + 21, lane]
                )
                np.testing.assert_array_equal(got[..., lane], want)
