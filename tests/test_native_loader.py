"""Native C++ loader parity against cv2."""

import os

import numpy as np
import pytest

from snvc_tpu.data import native_loader


@pytest.fixture(scope="module")
def png_files(tmp_path_factory, ):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("pngs")
    paths = []
    for i, (h, w) in enumerate([(37, 53), (375, 1242), (16, 16)]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(d / f"{i}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append((p, img))
    return paths


class TestNativeLoader:
    def test_available(self):
        assert native_loader.available(), "native loader failed to build"

    def test_single_decode_matches_cv2(self, png_files):
        for p, img in png_files:
            H, W = img.shape[:2]
            out = native_loader.decode_png_padded(p, (H, W))
            np.testing.assert_array_equal(out, img)

    def test_padding_and_crop(self, png_files):
        p, img = png_files[0]  # 37 x 53
        out = native_loader.decode_png_padded(p, (64, 64))
        np.testing.assert_array_equal(out[:37, :53], img)
        assert (out[37:] == 0).all() and (out[:, 53:] == 0).all()
        crop = native_loader.decode_png_padded(p, (20, 20))
        np.testing.assert_array_equal(crop, img[:20, :20])

    def test_batch_decode(self, png_files):
        paths = [p for p, _ in png_files]
        out = native_loader.decode_batch_padded(paths, (400, 1280), n_threads=3)
        assert out.shape == (3, 400, 1280, 3)
        for i, (_, img) in enumerate(png_files):
            h, w = img.shape[:2]
            np.testing.assert_array_equal(out[i, :h, :w], img)

    def test_velodyne(self, tmp_path, rng):
        pts = rng.standard_normal((100, 4)).astype(np.float32)
        p = str(tmp_path / "v.bin")
        pts.tofile(p)
        out = native_loader.load_velodyne(p)
        np.testing.assert_array_equal(out, pts)

    def test_missing_file(self):
        assert native_loader.decode_png_padded("/nonexistent.png", (8, 8)) is None
