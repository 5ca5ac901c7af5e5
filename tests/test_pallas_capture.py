"""Pallas LK block-capture kernel vs the XLA dynamic-slice gather.

The kernel replaces the production tracker's per-level search-region
gather (lucas_kanade._capture_region — the TPU stand-in for the window
reads inside ``cv::calcOpticalFlowPyrLK``, OpenCVLucasKanadeFM.cpp:15).
Capture is pure block extraction with no arithmetic, so the two paths
must agree BIT-exactly; interpret mode lets the CPU mesh assert that for
the exact kernel that runs on TPU.
"""

import jax.numpy as jnp
import numpy as np

from pmv_tpu.frontend import image, lucas_kanade as lk, pallas_capture


def _pyr_and_pts(seed=0, shape=(120, 180), n=70, levels=3):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    pyr = tuple(image.build_pyramid(img, levels))
    H, W = shape
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(0, W - 1, n), rng.uniform(0, H - 1, n)], -1
        ).astype(np.float32)
    )
    return pyr, pts


class TestPallasCapture:
    def test_bit_equal_to_xla_gather(self):
        pyr, pts = _pyr_and_pts()
        win, search = 21, 10
        PAD = lk._pad_for(win, search)
        for lvl, img in enumerate(pyr):
            img_p = jnp.pad(img, PAD, mode="edge")
            ctr = pts / (2.0 ** lvl) + PAD
            ref, rr, rc = lk._capture_region(img_p, ctr, win, search)
            blk, r0, c0 = pallas_capture.capture_level(
                img_p, ctr, win, search, interpret=True
            )
            assert np.array_equal(np.asarray(r0), np.asarray(rr))
            assert np.array_equal(np.asarray(c0), np.asarray(rc))
            assert np.array_equal(np.asarray(blk), np.asarray(ref))

    def test_edge_positions_and_padding_ragged_n(self):
        # Feature count not a multiple of F_PER + positions pinned to the
        # image corners (origin clipping paths).
        pyr, _ = _pyr_and_pts(seed=3, n=5)
        win, search = 15, 6
        PAD = lk._pad_for(win, search)
        img_p = jnp.pad(pyr[0], PAD, mode="edge")
        H, W = pyr[0].shape
        pts = jnp.asarray(
            [[0.0, 0.0], [W - 1.0, 0.0], [0.0, H - 1.0],
             [W - 1.0, H - 1.0], [W / 2.0, H / 2.0]], jnp.float32
        )
        ref, rr, rc = lk._capture_region(img_p, pts + PAD, win, search)
        blk, r0, c0 = pallas_capture.capture_level(
            img_p, pts + PAD, win, search, interpret=True
        )
        assert np.array_equal(np.asarray(blk), np.asarray(ref))

    def test_all_level_wrappers_match_tap_and_lanes_layouts(self):
        pyr, pts = _pyr_and_pts(seed=1, n=40)
        win = 15
        ref_blocks = lk.capture_blocks(pyr, pts, win=win)
        fm = pallas_capture.capture_feature_major(pyr, pts, win=win, interpret=True)
        lanes = pallas_capture.capture_lanes(pyr, pts, win=win, interpret=True)
        for (rb, rr, rc), (fb, fr, fc), (tb, tr, tc) in zip(ref_blocks, fm, lanes):
            assert np.array_equal(np.asarray(fb), np.asarray(rb))
            assert np.array_equal(np.asarray(tb), np.asarray(jnp.transpose(rb, (1, 2, 0))))
            assert np.array_equal(np.asarray(fr), np.asarray(rr))
            assert np.array_equal(np.asarray(tc), np.asarray(rc))
