"""Parity tests: grid sampling vs torch.grid_sample, affine warp vs cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from snvc_tpu.ops.grid_sample import grid_sample_2d, sample_stereo_voxel
from snvc_tpu.ops.warp import affine_resample, invert_affine_jnp
from snvc_tpu.geometry import imgproc


class TestGridSampleTorchParity:
    def _torch_ref(self, feat_nhwc, grid):
        import torch
        import torch.nn.functional as F

        t_feat = torch.from_numpy(np.transpose(feat_nhwc, (0, 3, 1, 2)))
        # torch wants [N, Hg, Wg, 2]; use Hg=1
        t_grid = torch.from_numpy(grid[:, None, :, :])
        out = F.grid_sample(t_feat, t_grid, align_corners=False)  # default zeros
        return np.transpose(out.numpy()[:, :, 0, :], (0, 2, 1))  # [N, P, C]

    def test_matches_torch_interior(self, rng):
        feat = rng.standard_normal((2, 9, 13, 5)).astype(np.float32)
        grid = rng.uniform(-0.9, 0.9, size=(2, 64, 2)).astype(np.float32)
        got = np.asarray(grid_sample_2d(jnp.array(feat), jnp.array(grid)))
        want = self._torch_ref(feat, grid)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matches_torch_out_of_range(self, rng):
        """The reference does NOT mask out-of-view points; zero padding must
        match torch exactly including the border blend region."""
        feat = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        grid = rng.uniform(-1.8, 1.8, size=(1, 256, 2)).astype(np.float32)
        got = np.asarray(grid_sample_2d(jnp.array(feat), jnp.array(grid)))
        want = self._torch_ref(feat, grid)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_exact_at_pixel_centers(self, rng):
        feat = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        # normalized coord of pixel (i, j): g = (2p + 1)/S - 1
        px, py = 2, 1
        gx = (2 * px + 1) / 4 - 1
        gy = (2 * py + 1) / 4 - 1
        grid = np.array([[[gx, gy]]], dtype=np.float32)
        got = np.asarray(grid_sample_2d(jnp.array(feat), jnp.array(grid)))
        np.testing.assert_allclose(got[0, 0], feat[0, py, px], atol=1e-6)

    def test_stereo_voxel_shapes_and_convention(self, rng):
        """Voxel feature at (i,j,k) must equal the direct lookup of the 2D
        feature at the projected point — the reference's embedded self-test
        (vernier.py:479-519)."""
        N, Hf, Wf, C = 2, 16, 16, 4
        nh, nw, nl = 3, 4, 5
        roi_hw = (64, 64)  # stride-4 backbone
        left = rng.standard_normal((N, Hf, Wf, C)).astype(np.float32)
        right = rng.standard_normal((N, Hf, Wf, C)).astype(np.float32)
        P = nh * nw * nl
        proj_l = rng.uniform(8, 56, size=(N, P, 2)).astype(np.float32)
        proj_r = rng.uniform(8, 56, size=(N, P, 2)).astype(np.float32)
        vox = np.asarray(
            sample_stereo_voxel(
                jnp.array(left), jnp.array(right), jnp.array(proj_l),
                jnp.array(proj_r), roi_hw, (nh, nw, nl),
            )
        )
        assert vox.shape == (N, nh, nw, nl, 2 * C)
        # check one voxel against direct bilinear lookup through torch
        i, j, k = 1, 2, 3
        p = (i * nw + j) * nl + k
        grid_n = proj_l[:, p : p + 1, :] / np.array([32.0, 32.0]) - 1.0
        want = TestGridSampleTorchParity._torch_ref(self, left, grid_n.astype(np.float32))
        np.testing.assert_allclose(vox[:, i, j, k, :C], want[:, 0], atol=1e-5)

    def test_concat_atten(self, rng):
        N, Hf, Wf, C = 1, 8, 8, 3
        left = rng.standard_normal((N, Hf, Wf, C)).astype(np.float32)
        vox = np.asarray(
            sample_stereo_voxel(
                jnp.array(left), jnp.array(left),
                jnp.array(np.full((N, 8, 2), 16.0, np.float32)),
                jnp.array(np.full((N, 8, 2), 16.0, np.float32)),
                (32, 32), (2, 2, 2), aggregate="concat-atten",
            )
        )
        # identical views -> cosine similarity 1 -> gating is a no-op
        np.testing.assert_allclose(vox[..., :C], vox[..., C:], atol=1e-6)


class TestAffineResample:
    def test_invert_affine_jnp(self, rng):
        t = np.array([[[1.7, 0.0, -3.0], [0.0, 1.7, 5.0]]])
        ti = np.asarray(invert_affine_jnp(jnp.array(t)))[0]
        want = imgproc.invert_affine(t[0])
        np.testing.assert_allclose(ti, want, atol=1e-6)

    def test_matches_cv2_warp(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.random((37, 53, 3)).astype(np.float32)
        kpts = np.array([[10.0, 5.0], [40.0, 30.0], [25.0, 12.0]])
        t = imgproc.roi_crop_transform(kpts, (32, 32), enlarge=1.1)
        want = cv2.warpAffine(img, t, (32, 32), flags=cv2.INTER_LINEAR)
        got = np.asarray(
            affine_resample(jnp.array(img), jnp.array(t[None]), (32, 32))
        )[0]
        # cv2 uses fixed-point bilinear (5-bit weights): small tolerance
        np.testing.assert_allclose(got, want, atol=2e-2)

    def test_identity_warp(self, rng):
        img = rng.random((16, 16, 2)).astype(np.float32)
        t = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        got = np.asarray(affine_resample(jnp.array(img), jnp.array(t[None]), (16, 16)))[0]
        np.testing.assert_allclose(got, img, atol=1e-6)

    def test_crop_scales_correctly(self, rng):
        # constant image stays constant under interior crop
        img = np.full((64, 64, 1), 3.25, np.float32)
        t = imgproc.crop_affine(np.array([32.0, 32.0]), np.array([20.0, 20.0]), (16, 16))
        got = np.asarray(affine_resample(jnp.array(img), jnp.array(t[None]), (16, 16)))[0]
        np.testing.assert_allclose(got, 3.25, atol=1e-6)


class TestSeparableWarp:
    def test_matches_gather_path(self, rng):
        from snvc_tpu.ops.warp import affine_resample

        img = rng.random((64, 96, 3)).astype(np.float32)
        t = imgproc.crop_affine(np.array([40.0, 30.0]), np.array([50.0, 50.0]), (32, 32))
        a = np.asarray(affine_resample(jnp.array(img), jnp.array(t[None]), (32, 32),
                                       separable=True))
        b = np.asarray(affine_resample(jnp.array(img), jnp.array(t[None]), (32, 32),
                                       separable=False))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_separable_out_of_range_zero(self, rng):
        from snvc_tpu.ops.warp import affine_resample

        img = np.ones((16, 16, 2), np.float32)
        # crop box hanging off the top-left corner -> zero padding
        t = imgproc.crop_affine(np.array([0.0, 0.0]), np.array([16.0, 16.0]), (8, 8))
        out = np.asarray(affine_resample(jnp.array(img), jnp.array(t[None]), (8, 8)))
        assert out[0, 0, 0, 0] == 0.0  # above/left of the image
        assert out[0, -1, -1, 0] == 1.0  # inside


class TestPallasSamplerInterpret:
    def test_stereo_sampler_kernel_matches_xla(self, rng):
        """The MXU stereo-sampling Pallas kernel (interpret mode on CPU)
        equals sample_stereo_voxel on random features and projections,
        including out-of-view points (zeros padding)."""
        from snvc_tpu.ops.grid_sample_pallas import _sample_stereo_voxel_impl

        N, Hf, Wf, C = 2, 16, 16, 8
        roi_hw = (64, 64)
        grid_res = (4, 8, 8)
        P = 4 * 8 * 8
        lf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        rf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        # ROI-pixel coords spanning in-range and out-of-view
        gl = jnp.asarray(rng.uniform(-10, 74, (N, P, 2)), jnp.float32)
        gr = jnp.asarray(rng.uniform(-10, 74, (N, P, 2)), jnp.float32)
        got = np.asarray(
            _sample_stereo_voxel_impl(lf, rf, gl, gr, roi_hw, grid_res,
                                      interpret=True)
        )
        want = np.asarray(
            sample_stereo_voxel(lf, rf, gl, gr, roi_hw, grid_res)
        )
        assert got.shape == want.shape == (N, 4, 8, 8, 2 * C)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def _banded_case(self, rng, N=1, Hf=32, Wf=32, C=8, tight=True):
        """Features + projections whose per-block row span fits (or
        violates, tight=False) the 2x16-row banded window."""
        from snvc_tpu.ops.grid_sample_pallas import _BLOCK

        roi_hw = (128, 128)  # stride 4 -> feature rows = roi/4
        grid_res = (2, 32, 32)  # P = 2048 = 2 blocks
        P = 2 * 32 * 32
        lf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        rf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        gl = np.empty((N, P, 2), np.float32)
        gr = np.empty((N, P, 2), np.float32)
        for g in (gl, gr):
            g[..., 0] = rng.uniform(-10, 138, (N, P))  # x: anywhere
            for b in range(P // _BLOCK):
                sl = slice(b * _BLOCK, (b + 1) * _BLOCK)
                if tight:
                    # rows within a ~9-row feature window, arbitrary start
                    r0 = rng.uniform(0, Hf - 10)
                    g[:, sl, 1] = rng.uniform(
                        r0 * 4, (r0 + 9) * 4, (N, _BLOCK)
                    )
                else:
                    g[:, sl, 1] = rng.uniform(-10, 138, (N, _BLOCK))
        # sprinkle out-of-view points (must not affect the band choice)
        gl[:, ::97, 1] = -50.0
        gr[:, ::89, 1] = 200.0
        return lf, rf, jnp.asarray(gl), jnp.asarray(gr), roi_hw, grid_res

    def test_banded_kernel_matches_xla(self, rng, monkeypatch):
        """Forced banded path (SNVC_SAMPLE_BAND=always) on band-fitting
        projections equals the XLA sampler — the exactness contract of the
        row-banded windows."""
        from snvc_tpu.ops.grid_sample_pallas import _sample_stereo_voxel_impl

        monkeypatch.setenv("SNVC_SAMPLE_BAND", "always")
        lf, rf, gl, gr, roi_hw, grid_res = self._banded_case(rng)
        got = np.asarray(
            _sample_stereo_voxel_impl(lf, rf, gl, gr, roi_hw, grid_res,
                                      interpret=True)
        )
        want = np.asarray(sample_stereo_voxel(lf, rf, gl, gr, roi_hw, grid_res))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_banded_auto_falls_back_when_span_too_wide(self, rng, monkeypatch):
        """auto mode on projections whose row span exceeds the window must
        still be exact (the per-call fit check dispatches the full kernel)."""
        from snvc_tpu.ops.grid_sample_pallas import _sample_stereo_voxel_impl

        monkeypatch.setenv("SNVC_SAMPLE_BAND", "auto")
        lf, rf, gl, gr, roi_hw, grid_res = self._banded_case(rng, tight=False)
        got = np.asarray(
            _sample_stereo_voxel_impl(lf, rf, gl, gr, roi_hw, grid_res,
                                      interpret=True)
        )
        want = np.asarray(sample_stereo_voxel(lf, rf, gl, gr, roi_hw, grid_res))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_banded_auto_exact_on_tight_spans(self, rng, monkeypatch):
        """auto mode on band-fitting projections (the banded branch of the
        cond) is exact too."""
        from snvc_tpu.ops.grid_sample_pallas import (
            _band_indices, _sample_stereo_voxel_impl,
        )

        monkeypatch.setenv("SNVC_SAMPLE_BAND", "auto")
        lf, rf, gl, gr, roi_hw, grid_res = self._banded_case(rng)
        # the fit check must actually select the banded branch here
        Hf = lf.shape[1]
        _, ok = _band_indices(gl, Hf, Hf / roi_hw[0], gl.shape[1] // 1024)
        assert bool(np.asarray(ok).all())
        got = np.asarray(
            _sample_stereo_voxel_impl(lf, rf, gl, gr, roi_hw, grid_res,
                                      interpret=True)
        )
        want = np.asarray(sample_stereo_voxel(lf, rf, gl, gr, roi_hw, grid_res))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_pallas_sampler_custom_vjp_matches_xla(self, rng):
        """The custom_vjp backward (_sample_bwd, the XLA twin's VJP)
        produces the same cotangents as differentiating the XLA sampler
        directly — pinning the rule that makes TPU training possible."""
        import jax

        from snvc_tpu.ops.grid_sample_pallas import _sample_bwd

        N, Hf, Wf, C = 1, 8, 8, 4
        roi_hw = (32, 32)
        grid_res = (2, 4, 4)
        P = 2 * 4 * 4
        lf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        rf = jnp.asarray(rng.standard_normal((N, Hf, Wf, C)), jnp.float32)
        gl = jnp.asarray(rng.uniform(0, 32, (N, P, 2)), jnp.float32)
        gr = jnp.asarray(rng.uniform(0, 32, (N, P, 2)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((N, 2, 4, 4, 2 * C)), jnp.float32)

        got = _sample_bwd(roi_hw, grid_res, (lf, rf, gl, gr), g)
        _, vjp = jax.vjp(
            lambda a, b, c, d: sample_stereo_voxel(a, b, c, d, roi_hw, grid_res),
            lf, rf, gl, gr,
        )
        want = vjp(g)
        for x, y in zip(got, want):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
