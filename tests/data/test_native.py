"""Native C++ decoder parity tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest

from densematchingbenchmark_tpu import native
from densematchingbenchmark_tpu.data import io as pio

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_pfm_parity(tmp_path):
    d = np.random.RandomState(0).rand(17, 23).astype(np.float32) * 100
    path = str(tmp_path / "d.pfm")
    pio.save_pfm(path, d)
    np.testing.assert_allclose(native.decode_pfm(path), d, atol=1e-6)


def test_png_rgb_parity(tmp_path):
    from imageio.v2 import imwrite
    img = (np.random.RandomState(1).rand(16, 20, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "i.png")
    imwrite(path, img)
    np.testing.assert_allclose(native.decode_png_rgb(path),
                               img.astype(np.float32), atol=0.5)


def test_disp16_parity(tmp_path):
    d = np.random.RandomState(2).rand(16, 20).astype(np.float32) * 100
    path = str(tmp_path / "k.png")
    pio.save_kitti_disp(path, d)
    got = native.decode_png_disp16(path)
    # python fallback reader must agree exactly
    from imageio.v2 import imread
    want = np.asarray(imread(path), np.float32) / 256.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_normalize_crop_fused():
    img = np.random.RandomState(3).rand(12, 14, 3).astype(np.float32) * 255
    out = native.normalize_crop(img, 2, 3, 8, 10, [100.] * 3, [50.] * 3)
    np.testing.assert_allclose(out, (img[2:10, 3:13] - 100.) / 50.,
                               atol=1e-6)
