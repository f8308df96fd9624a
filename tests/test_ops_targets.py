"""Tests: on-device target generation, point predicates, pose update."""

import numpy as np
import jax.numpy as jnp

from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry import imgproc, transforms
from snvc_tpu.ops.heatmaps import bev_part_heatmaps, hard_argmax_2d, soft_argmax_2d
from snvc_tpu.ops.points_in_boxes import (
    grid_to_cam_jnp,
    occupancy_targets,
    points_in_cuboid_jnp,
    roiaware_pool3d,
)
from snvc_tpu.ops.registration import ncf_to_update, rigid_transform_2d_batch


def random_box(rng):
    return np.array(
        [
            1.4 + rng.random(),
            1.5 + rng.random(),
            3.0 + rng.random(),
            rng.normal() * 10,
            1.5 + rng.normal() * 0.2,
            15 + rng.random() * 30,
            rng.uniform(-np.pi, np.pi),
        ],
        dtype=np.float32,
    )


class TestHeatmaps:
    def test_matches_numpy_reference(self, rng):
        centers = rng.integers(0, 16, size=(2, 9, 2)).astype(np.float32)
        hm = np.asarray(bev_part_heatmaps(jnp.array(centers), (16, 24), sigma=2))
        assert hm.shape == (2, 9, 24, 16)
        for n in range(2):
            for p in range(9):
                want = imgproc.gaussian_heatmap_2d((24, 16), centers[n, p], 2.0)
                np.testing.assert_allclose(hm[n, p], want, atol=1e-5)

    def test_hard_argmax_roundtrip(self, rng):
        centers = rng.integers(2, 14, size=(3, 9, 2)).astype(np.float32)
        hm = bev_part_heatmaps(jnp.array(centers), (16, 16), sigma=1)
        xy, val = hard_argmax_2d(hm)
        np.testing.assert_allclose(np.asarray(xy), centers, atol=0)
        np.testing.assert_allclose(np.asarray(val), 1.0, atol=1e-6)

    def test_soft_argmax_near_hard(self, rng):
        centers = rng.integers(4, 12, size=(1, 3, 2)).astype(np.float32)
        hm = bev_part_heatmaps(jnp.array(centers), (16, 16), sigma=1)
        xy, _ = soft_argmax_2d(hm, temperature=30.0)
        np.testing.assert_allclose(np.asarray(xy), centers, atol=0.1)


class TestPointsInBoxes:
    def test_predicate_matches_numpy(self, rng):
        for _ in range(5):
            b = random_box(rng)
            pts = (b[3:6] + rng.normal(size=(200, 3)) * 2).astype(np.float32)
            got = np.asarray(points_in_cuboid_jnp(jnp.array(pts), jnp.array(b)))
            want = gbox.points_in_box3d(pts, b)
            boundary = gbox.points_in_box3d(pts, b, tol=1e-4) & ~gbox.points_in_box3d(
                pts, b, tol=-1e-4
            )
            assert np.array_equal(got[~boundary], want[~boundary])

    def test_grid_to_cam_matches_numpy(self, rng):
        b = random_box(rng)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        got = np.asarray(grid_to_cam_jnp(jnp.array(pts), jnp.array(b)))
        want = gbox.grid_to_cam(pts, b)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_occupancy_semantics(self, rng):
        """fg points inside gt -> 1; grid voxels outside gt -> 0 (overrides);
        inside gt but unobserved -> -1."""
        b = random_box(rng)
        gt = b.copy()
        re = (8, 12, 12)
        grange = (2.0, 3.0, 3.0)
        # local grid points, h-major ravel
        ys = np.linspace(-1, 1, re[0])
        xs = np.linspace(-1.5, 1.5, re[1])
        zs = np.linspace(-1.5, 1.5, re[2])
        gy, gx, gz = np.meshgrid(ys, xs, zs, indexing="ij")
        grid_local = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
        # points: a cluster at the box center (inside gt)
        center = b[3:6] - np.array([0, b[0] / 2, 0])
        pts = np.concatenate(
            [
                center + rng.normal(size=(50, 3)).astype(np.float64) * 0.1,
                center + np.array([[50.0, 0, 0]]),  # far away (padding-ish)
            ]
        ).astype(np.float32)
        valid = np.ones(len(pts), bool)
        occ = np.asarray(
            occupancy_targets(
                jnp.array(pts), jnp.array(valid), jnp.array(b), jnp.array(gt),
                jnp.array(grid_local), re, grange,
            )
        )
        assert occ.shape == re
        assert (occ == 1).sum() > 0
        assert (occ == 0).sum() > 0
        # voxels outside the gt box must be 0 even if points landed there
        in_gt = np.asarray(
            points_in_cuboid_jnp(grid_to_cam_jnp(jnp.array(grid_local), jnp.array(b)), jnp.array(gt))
        ).reshape(re)
        assert np.all(occ[~in_gt] == 0)
        # fg voxels are a subset of in-gt voxels
        assert np.all(in_gt[occ == 1])

    def test_occupancy_invalid_points_ignored(self, rng):
        b = random_box(rng)
        re, grange = (4, 6, 6), (2.0, 3.0, 3.0)
        grid_local = np.zeros((np.prod(re), 3), np.float32)
        center = b[3:6] - np.array([0, b[0] / 2, 0])
        pts = (center + rng.normal(size=(20, 3)) * 0.1).astype(np.float32)
        occ_v = np.asarray(
            occupancy_targets(
                jnp.array(pts), jnp.array(np.zeros(20, bool)), jnp.array(b),
                jnp.array(b), jnp.array(grid_local), re, grange,
            )
        )
        assert (occ_v == 1).sum() == 0  # no valid points -> no foreground

    def test_roiaware_pool(self, rng):
        b = random_box(rng)
        center = b[3:6] - np.array([0, b[0] / 2, 0])
        pts = (center + rng.normal(size=(100, 3)) * 0.3).astype(np.float32)
        feats = rng.standard_normal((100, 4)).astype(np.float32)
        inside = gbox.points_in_box3d(pts, b)
        pooled = np.asarray(
            roiaware_pool3d(
                jnp.array(pts), jnp.array(feats), jnp.array(np.ones(100, bool)),
                jnp.array(b[None]), (4, 4, 4), mode="max",
            )
        )
        assert pooled.shape == (1, 4, 4, 4, 4)
        # global max of pooled equals max over contained points
        if inside.sum() > 0:
            np.testing.assert_allclose(
                pooled.max(), feats[inside].max(), atol=1e-6
            )
        # avg mode produces finite values
        pooled_avg = np.asarray(
            roiaware_pool3d(
                jnp.array(pts), jnp.array(feats), jnp.array(np.ones(100, bool)),
                jnp.array(b[None]), (4, 4, 4), mode="avg",
            )
        )
        assert np.all(np.isfinite(pooled_avg))


class TestRegistration:
    def test_batched_rigid_matches_numpy(self, rng):
        src = rng.standard_normal((4, 2, 9)).astype(np.float32)
        dst = rng.standard_normal((4, 2, 9)).astype(np.float32)
        w = rng.random((4, 9)).astype(np.float32)
        R, t = rigid_transform_2d_batch(jnp.array(src), jnp.array(dst), jnp.array(w))
        for i in range(4):
            Rn, tn = transforms.rigid_transform_2d(src[i], dst[i], w[i])
            np.testing.assert_allclose(np.asarray(R)[i], Rn, atol=1e-5)
            np.testing.assert_allclose(np.asarray(t)[i], tn, atol=1e-4)

    def test_ncf_update_recovers_true_pose(self, rng):
        """Place heatmap peaks at the voxel positions of a ground-truth box's
        parts; the all_parts update must recover the GT pose."""
        nw = nl = 33
        x_range = z_range = (-1.6, 1.6)
        # all parts of the perturbed box must stay inside the refinement
        # range, else their heatmap peaks clip at the grid edge (a real
        # effect shared with the reference's out-of-range gaussian dots)
        sample = random_box(rng)
        sample[1], sample[2] = 1.3, 2.2  # w, l small enough
        gt = sample.copy()
        gt[3] += 0.3  # shift x
        gt[5] -= 0.2  # shift z
        gt[6] += 0.1  # rotate
        # part offsets of gt relative to sample center, in the object frame
        parts_gt = gbox.box_parts_cam(gt)
        center = sample[3:6] - np.array([0, sample[0] / 2, 0])
        basis = gbox.object_basis(sample)
        local = (parts_gt - center) @ basis  # [9, 3] (w, h, l)
        # voxel indices (x = w axis, z = l axis)
        jx = (local[:, 0] - x_range[0]) / (x_range[1] - x_range[0]) * (nw - 1)
        kz = (local[:, 2] - z_range[0]) / (z_range[1] - z_range[0]) * (nl - 1)
        centers = np.stack([jx, kz], axis=-1)[None]  # [1, 9, 2]
        ncf = bev_part_heatmaps(jnp.array(np.round(centers)), (nw, nl), sigma=2)
        upd = ncf_to_update(ncf, jnp.array(sample[None]), x_range, z_range)
        got = np.asarray(upd.all_parts)[0]
        # voxel pitch is 0.1m; recovered pose within half a voxel
        np.testing.assert_allclose(got[3], gt[3], atol=0.15)
        np.testing.assert_allclose(got[5], gt[5], atol=0.15)
        d_ang = (got[6] - gt[6] + np.pi) % (2 * np.pi) - np.pi
        assert abs(d_ang) < 0.05
        assert bool(np.asarray(upd.keep)[0])
        # one_part moves the center only; orientation unchanged
        one = np.asarray(upd.one_part)[0]
        assert one[6] == sample[6]
        np.testing.assert_allclose(one[3], gt[3], atol=0.15)

    def test_ncf_update_filter_rejects(self, rng):
        sample = random_box(rng)
        ncf = jnp.full((1, 9, 8, 8), 5.0)  # out of the [-1, 2] gate
        upd = ncf_to_update(ncf, jnp.array(sample[None]), (-1.6, 1.6), (-1.6, 1.6))
        assert not bool(np.asarray(upd.keep)[0])
        np.testing.assert_allclose(np.asarray(upd.all_parts)[0], sample, atol=0)

    def test_decode_source_precedence(self, rng):
        """cfg.ncf_decode picks the part-position source: "coordinates"
        (reference CLI behavior, inference_agnostic.py:396-402) uses the
        coord head when given; "argmax"/"soft-argmax" force the heatmap
        decode even when a coord head output is present — the hatch for
        regimes where a small-noise regression head collapses to the
        mean while the NCF peaks stay informative."""
        nw = nl = 33
        x_range = z_range = (-1.6, 1.6)
        centers = rng.integers(4, 28, size=(1, 9, 2)).astype(np.float32)
        ncf = bev_part_heatmaps(jnp.array(centers), (nw, nl), sigma=1)
        sample = random_box(rng)[None]
        # a coord head output pinned to the grid center (normalized 0.5)
        coords = jnp.full((1, 9, 2), 0.5)
        upd_coord = ncf_to_update(
            ncf, jnp.array(sample), x_range, z_range,
            coordinates=coords, decode="coordinates",
        )
        upd_forced = ncf_to_update(
            ncf, jnp.array(sample), x_range, z_range,
            coordinates=coords, decode="argmax",
        )
        upd_heat = ncf_to_update(ncf, jnp.array(sample), x_range, z_range)
        # forced argmax ignores the coord head entirely
        np.testing.assert_allclose(
            np.asarray(upd_forced.all_parts), np.asarray(upd_heat.all_parts),
            atol=0,
        )
        # "coordinates" uses it: all parts at grid center => zero offsets
        # => one_part keeps the (x, z) center exactly
        one = np.asarray(upd_coord.one_part)[0]
        np.testing.assert_allclose(one[[3, 5]], sample[0][[3, 5]], atol=1e-5)
        # and they genuinely differ from the heatmap decode here
        assert not np.allclose(
            np.asarray(upd_coord.all_parts), np.asarray(upd_heat.all_parts)
        )

    def test_soft_argmax_decode_matches_argmax_at_sharp_peaks(self, rng):
        """cfg.ncf_decode='soft-argmax' (reference img_proc.soft_arg_max)
        must agree with the hard decode when the heatmap peaks are sharp —
        the exp(relu(h-0.01))-1 weighting zeroes everything at/below the
        floor, so a narrow gaussian decodes to (nearly) its mode."""
        from snvc_tpu.ops.heatmaps import soft_argmax_2d_ref

        nw = nl = 33
        x_range = z_range = (-1.6, 1.6)
        centers = rng.integers(4, 28, size=(2, 9, 2)).astype(np.float32)
        ncf = bev_part_heatmaps(jnp.array(centers), (nw, nl), sigma=1)
        xy_soft, mv = soft_argmax_2d_ref(ncf)
        xy_hard, _ = hard_argmax_2d(ncf)
        np.testing.assert_allclose(
            np.asarray(xy_soft), np.asarray(xy_hard), atol=0.05
        )
        sample = np.stack([random_box(rng), random_box(rng)])
        upd_h = ncf_to_update(ncf, jnp.array(sample), x_range, z_range)
        upd_s = ncf_to_update(
            ncf, jnp.array(sample), x_range, z_range, decode="soft-argmax"
        )
        np.testing.assert_allclose(
            np.asarray(upd_s.all_parts), np.asarray(upd_h.all_parts), atol=0.02
        )

    def test_soft_argmax_recovers_subvoxel_offsets(self, rng):
        """A fractional-center gaussian decodes to the fractional position
        under soft-argmax while hard argmax floors to the voxel."""
        from snvc_tpu.ops.heatmaps import soft_argmax_2d_ref

        centers = np.array([[[10.5, 14.5]]], np.float32)
        ncf = bev_part_heatmaps(jnp.array(centers), (33, 33), sigma=2,
                                quantize=False)
        xy, _ = soft_argmax_2d_ref(ncf)
        np.testing.assert_allclose(np.asarray(xy)[0, 0], [10.5, 14.5], atol=0.05)

    def test_soft_argmax_flat_heatmap_falls_back_to_hard(self, rng):
        """Heatmaps entirely at/below the 0.01 weight floor have zero soft
        weight; the decode must fall back to the hard argmax instead of
        collapsing to index (0, 0) — a systematic worst-case shift toward
        the grid corner for low-confidence NCFs inside the Filter gate."""
        from snvc_tpu.ops.heatmaps import soft_argmax_2d_ref

        hm = np.full((1, 2, 8, 8), -0.5, np.float32)
        hm[0, 0, 5, 3] = 0.009  # below the floor but the max
        hm[0, 1, 2, 6] = 0.5  # normal peak for contrast
        xy, _ = soft_argmax_2d_ref(jnp.asarray(hm))
        np.testing.assert_allclose(np.asarray(xy)[0, 0], [3.0, 5.0], atol=0)
        np.testing.assert_allclose(np.asarray(xy)[0, 1], [6.0, 2.0], atol=0.05)

    def test_filter_thresholds_configurable(self, rng):
        """filter_min/filter_max come from config now; a gate widened to
        accept the same out-of-range heatmap keeps the update."""
        sample = random_box(rng)
        ncf = jnp.full((1, 9, 8, 8), 5.0)
        upd = ncf_to_update(ncf, jnp.array(sample[None]), (-1.6, 1.6), (-1.6, 1.6))
        assert not bool(np.asarray(upd.keep)[0])
        upd_wide = ncf_to_update(
            ncf, jnp.array(sample[None]), (-1.6, 1.6), (-1.6, 1.6),
            filter_min=-10.0, filter_max=10.0,
        )
        assert bool(np.asarray(upd_wide.keep)[0])

    def test_ncf_update_with_coordinates(self, rng):
        """Coordinate-head decode path: normalized coords replace argmax."""
        sample = random_box(rng)
        x_range = z_range = (-1.6, 1.6)
        # coordinates that encode 'no change': parts at their sample positions
        parts = gbox.box_parts_cam(sample)
        center = sample[3:6] - np.array([0, sample[0] / 2, 0])
        local = (parts - center) @ gbox.object_basis(sample)
        cx = (local[:, 0] - x_range[0]) / 3.2
        cz = (local[:, 2] - z_range[0]) / 3.2
        coords = np.stack([cx, cz], axis=-1)[None].astype(np.float32)
        ncf = jnp.zeros((1, 9, 8, 8))
        upd = ncf_to_update(
            ncf, jnp.array(sample[None]), x_range, z_range,
            coordinates=jnp.array(coords), decode="coordinates",
        )
        got = np.asarray(upd.all_parts)[0]
        np.testing.assert_allclose(got[3], sample[3], atol=5e-3)
        np.testing.assert_allclose(got[5], sample[5], atol=5e-3)
        d_ang = (got[6] - sample[6] + np.pi) % (2 * np.pi) - np.pi
        assert abs(d_ang) < 5e-3


def test_make_targets_ncf_subvoxel_plumbing():
    """cfg.ncf_subvoxel=True must reach the heatmap drawer: fractional part
    centers yield targets whose soft-argmax decode differs from (and is
    finer than) the floored default."""
    import jax.numpy as jnp

    from snvc_tpu.config import tiny_vernier_config
    from snvc_tpu.ops.assemble import make_grid_local, make_targets
    from snvc_tpu.ops.heatmaps import soft_argmax_2d_ref

    cfg = tiny_vernier_config()
    rng = np.random.default_rng(3)
    gt = np.array([[1.5, 1.6, 3.8, 0.31, 1.64, 14.27, 0.43]], np.float32)
    # proposal offset a fraction of a voxel from GT so part centers land at
    # fractional grid coordinates
    sample = gt.copy()
    sample[0, 3] += 0.13
    sample[0, 5] -= 0.07
    grid_local = jnp.asarray(make_grid_local(cfg))
    pts = np.zeros((1, 8, 3), np.float32)
    pv = np.zeros((1, 8), bool)
    kw = dict()
    t_q = make_targets(jnp.asarray(sample), jnp.asarray(gt), jnp.asarray(pts),
                       jnp.asarray(pv), grid_local, cfg, **kw)
    t_s = make_targets(jnp.asarray(sample), jnp.asarray(gt), jnp.asarray(pts),
                       jnp.asarray(pv), grid_local,
                       cfg.replace(ncf_subvoxel=True), **kw)
    xy_q, _ = soft_argmax_2d_ref(t_q["ncf"])
    xy_s, _ = soft_argmax_2d_ref(t_s["ncf"])
    dq = np.asarray(xy_q) - np.asarray(xy_s)
    assert np.abs(dq).max() > 0.05, "subvoxel flag did not change targets"
    # the quantized targets decode to (near-)integers, the subvoxel ones
    # to genuinely fractional positions
    frac = np.abs(np.asarray(xy_s) - np.round(np.asarray(xy_s)))
    assert frac.max() > 0.1
