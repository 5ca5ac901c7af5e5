"""Pallas kernel tests (interpreter mode on the CPU mesh; the same code
compiles natively on TPU)."""

import jax.numpy as jnp
import numpy as np

from pmv_tpu.frontend import image, pallas_kernels
from tests_helpers_blob import blob_image


class TestMinEigPallas:
    def test_matches_xla_interior(self, rng):
        img = jnp.asarray(rng.random((96, 128)).astype(np.float32) * 100)
        ref = np.asarray(image.min_eig_response(img))
        got = np.asarray(pallas_kernels.min_eig_response(img, tile_rows=32))
        # interiors must agree (borders differ by halo convention)
        np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-3)

    def test_nonsquare_and_odd_sizes(self, rng):
        img = jnp.asarray(rng.random((37, 53)).astype(np.float32))
        got = pallas_kernels.min_eig_response(img, tile_rows=16)
        assert got.shape == (37, 53)

    def test_corner_peak(self):
        img = jnp.asarray(blob_image((64, 64), [(32, 32)]))
        resp = np.asarray(pallas_kernels.min_eig_response(img, tile_rows=32))
        r, c = np.unravel_index(resp.argmax(), resp.shape)
        assert abs(r - 32) <= 1 and abs(c - 32) <= 1
