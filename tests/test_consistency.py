"""End-to-end feature-sampling consistency check.

Port of the reference's embedded self-test (vernier.py:479-519): pick a
random grid point, project it through the real calibration + crop affine,
and verify (a) the on-device grid projection matches the host-side
geometry and (b) the sampled voxel feature equals the direct bilinear
lookup of the 2D feature map at that point.  This validates the entire
assemble chain: box -> ROI affine -> device projection -> grid sample.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.config import tiny_vernier_config
from snvc_tpu.data.pipeline import crop_transforms
from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry import imgproc
from snvc_tpu.geometry.calib import Calibration
from snvc_tpu.ops.assemble import grid_projections, make_grid_local
from snvc_tpu.ops.grid_sample import grid_sample_2d, sample_stereo_voxel


@pytest.fixture(scope="module")
def setup(  ):
    rng = np.random.default_rng(5)
    cfg = tiny_vernier_config(max_instances=1)
    cl, cr = Calibration.default(), Calibration.default_right()
    sample = np.array([1.5, 1.7, 4.0, 1.0, 1.65, 18.0, 0.7], np.float32)
    tl, tr = crop_transforms(sample, cl, cr, cfg)
    grid_local = make_grid_local(cfg)
    return rng, cfg, cl, cr, sample, tl, tr, grid_local


class TestProjectionConsistency:
    def test_device_projection_matches_host_geometry(self, setup):
        rng, cfg, cl, cr, sample, tl, tr, grid_local = setup
        # device path
        gp = np.asarray(
            grid_projections(
                jnp.asarray(sample), jnp.asarray(cl.as_array()),
                jnp.asarray(tl), jnp.asarray(grid_local),
            )
        )
        # host path: grid -> camera -> image -> crop affine
        cam = gbox.grid_to_cam(grid_local.astype(np.float64), sample)
        uv = cl.rect_to_image(cam)
        want = imgproc.apply_affine(uv, tl)
        np.testing.assert_allclose(gp, want, atol=2e-2)

    def test_voxel_equals_direct_lookup(self, setup):
        """The reference's residual check: |voxel[i,j,k] - feat(proj)|."""
        rng, cfg, cl, cr, sample, tl, tr, grid_local = setup
        nh, nw, nl = cfg.grid_resolution
        H, W = cfg.resolution
        C = 6
        Hf, Wf = H // 4, W // 4
        left_feat = rng.standard_normal((1, Hf, Wf, C)).astype(np.float32)
        right_feat = rng.standard_normal((1, Hf, Wf, C)).astype(np.float32)
        gpl = np.asarray(
            grid_projections(jnp.asarray(sample), jnp.asarray(cl.as_array()),
                             jnp.asarray(tl), jnp.asarray(grid_local))
        )[None]
        gpr = np.asarray(
            grid_projections(jnp.asarray(sample), jnp.asarray(cr.as_array()),
                             jnp.asarray(tr), jnp.asarray(grid_local))
        )[None]
        vox = np.asarray(
            sample_stereo_voxel(
                jnp.asarray(left_feat), jnp.asarray(right_feat),
                jnp.asarray(gpl), jnp.asarray(gpr), cfg.resolution,
                cfg.grid_resolution,
            )
        )
        for _ in range(5):
            i = rng.integers(0, nh)
            j = rng.integers(0, nw)
            k = rng.integers(0, nl)
            p = (i * nw + j) * nl + k
            # direct bilinear lookup at the projected point (both views)
            for feat, gp, off in ((left_feat, gpl, 0), (right_feat, gpr, C)):
                g = gp[0, p] / np.array([W, H]) * 2 - 1
                direct = np.asarray(
                    grid_sample_2d(jnp.asarray(feat), jnp.asarray(g[None, None]))
                )[0, 0]
                np.testing.assert_allclose(
                    vox[0, i, j, k, off : off + C], direct, atol=1e-5
                )

    def test_grid_points_project_into_roi(self, setup):
        """The crop box is built around the refinement space, so most grid
        projections should land inside the ROI."""
        rng, cfg, cl, cr, sample, tl, tr, grid_local = setup
        gp = np.asarray(
            grid_projections(jnp.asarray(sample), jnp.asarray(cl.as_array()),
                             jnp.asarray(tl), jnp.asarray(grid_local))
        )
        H, W = cfg.resolution
        inside = (
            (gp[:, 0] >= 0) & (gp[:, 0] < W) & (gp[:, 1] >= 0) & (gp[:, 1] < H)
        )
        assert inside.mean() > 0.9
