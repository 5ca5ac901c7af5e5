"""Native C++ frame loader vs the pure-Python codec (skipped when the
shared library is not built; CI builds it via `make -C native`)."""

import numpy as np
import pytest

from pmv_tpu.io import native, png


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native frame loader not built (make -C native)")


class TestNativeLoader:
    def test_gray_matches_python(self, built, tmp_path, rng):
        img = rng.integers(0, 256, (37, 53), np.uint8)
        p = tmp_path / "g.png"
        png.write_png(p, img)
        a = native.load_grayscale(p)
        b = png.load_grayscale(p)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_rgb_matches_python(self, built, tmp_path, rng):
        img = rng.integers(0, 256, (21, 33, 3), np.uint8)
        p = tmp_path / "c.png"
        png.write_png(p, img)
        a = native.load_grayscale(p)
        b = png.load_grayscale(p)
        np.testing.assert_allclose(a, b, atol=0.51)  # float vs float rounding

    def test_missing_file(self, built):
        with pytest.raises(ValueError):
            native.load_grayscale("/nonexistent.png")

    def test_corrupt_file(self, built, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"not a png at all")
        with pytest.raises(ValueError):
            native.load_grayscale(p)
