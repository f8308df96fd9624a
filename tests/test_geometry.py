"""Golden tests for the geometry substrate against independently-derived
reference semantics (see SURVEY.md §2 P9-P14)."""

import numpy as np
import pytest

from snvc_tpu.geometry import boxes, imgproc, transforms
from snvc_tpu.geometry.calib import (
    Calibration,
    KittiLabel,
    filter_annotations,
    parse_label_line,
    format_label,
    ry_to_alpha,
    alpha_to_ry,
)


def reference_parts_cam(box3d):
    """Straight transcription of the reference corner math
    (vernier.py:740-765) used as an independent golden check."""
    h, w, l = box3d[0], box3d[1], box3d[2]
    x_c = np.array([0.5 * l, l, l, l, l, 0, 0, 0, 0]) - l / 2.0
    y_c = np.array([0.5 * h, 0, h, 0, h, 0, h, 0, h]) - h
    z_c = np.array([0.5 * w, w, w, 0, 0, w, w, 0, 0]) - w / 2.0
    corners = np.array([x_c, y_c, z_c])
    ry = box3d[6]
    R = np.array(
        [
            [np.cos(ry), 0, np.sin(ry)],
            [0, 1, 0],
            [-np.sin(ry), 0, np.cos(ry)],
        ]
    )
    return (R @ corners + box3d[3:6].reshape(3, 1)).T  # [9, 3]


def random_box(rng):
    return np.array(
        [
            1.4 + rng.random(),  # h
            1.5 + rng.random(),  # w
            3.0 + rng.random(),  # l
            rng.normal() * 10,  # x
            1.5 + rng.normal() * 0.2,  # y (bottom)
            15 + rng.random() * 30,  # z
            rng.uniform(-np.pi, np.pi),  # ry
        ]
    )


class TestBoxGeometry:
    def test_parts_match_reference(self, rng):
        for _ in range(20):
            b = random_box(rng)
            got = boxes.box_parts_cam(b)
            want = reference_parts_cam(b)
            np.testing.assert_allclose(got, want, atol=1e-9)

    def test_parts_batched(self, rng):
        bs = np.stack([random_box(rng) for _ in range(5)])
        got = boxes.box_parts_cam(bs)
        for i in range(5):
            np.testing.assert_allclose(got[i], reference_parts_cam(bs[i]), atol=1e-9)

    def test_basis_matches_reference(self, rng):
        for _ in range(10):
            b = random_box(rng)
            ry = b[6]
            B = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]])
            R = np.array(
                [
                    [np.cos(ry), 0, np.sin(ry)],
                    [0, 1, 0],
                    [-np.sin(ry), 0, np.cos(ry)],
                ]
            )
            want = R @ B.T  # vernier.py:596-612
            np.testing.assert_allclose(boxes.object_basis(b), want, atol=1e-12)

    def test_basis_roundtrip(self, rng):
        b = random_box(rng)
        basis = boxes.object_basis(b)
        offs = rng.normal(size=(7, 3))
        local = offs @ basis
        back = local @ basis.T
        np.testing.assert_allclose(back, offs, atol=1e-12)

    def test_points_in_cuboid_vs_local_frame(self, rng):
        for _ in range(10):
            b = random_box(rng)
            corners = boxes.box_corners_cam(b)
            center = b[3:6].copy()
            center[1] -= 0.5 * b[0]
            pts = center + rng.normal(size=(400, 3)) * np.array([3, 1.5, 3])
            m1 = boxes.points_in_cuboid(pts, corners)
            m2 = boxes.points_in_box3d(pts, b)
            # exclude points within 1mm of a face (tie-breaking differs)
            interior = boxes.points_in_box3d(pts, b, tol=-1e-3)
            boundary = boxes.points_in_box3d(pts, b, tol=1e-3) & ~interior
            assert np.array_equal(m1[~boundary], m2[~boundary])
            assert m1.sum() > 0  # sanity: some points inside

    def test_grid_to_cam_center(self, rng):
        b = random_box(rng)
        # the grid origin maps to the box *center* (bottom center - h/2)
        got = boxes.grid_to_cam(np.zeros((1, 3)), b)[0]
        want = b[3:6] - np.array([0, 0.5 * b[0], 0])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_grid_to_cam_matches_reference_rotation(self, rng):
        """Grid z-axis ("front") maps to the heading; equals the reference's
        rot_y(ry + pi/2) (KITTIRefinement_dataset.py:828-846)."""
        b = random_box(rng)
        pts = rng.normal(size=(10, 3))
        ry = b[6] + 0.5 * np.pi
        R = np.array(
            [
                [np.cos(ry), 0, np.sin(ry)],
                [0, 1, 0],
                [-np.sin(ry), 0, np.cos(ry)],
            ]
        )
        center = np.array([b[3], b[4] - 0.5 * b[0], b[5]])
        want = (R @ pts.T + center[:, None]).T
        np.testing.assert_allclose(boxes.grid_to_cam(pts, b), want, atol=1e-9)

    def test_bev_corners(self):
        box = np.array([[1.0, 2.0, 2.0, 4.0, 0.0]])
        c = boxes.bev_box_corners(box)[0]
        want = np.array([[2.0, 4.0], [0.0, 4.0], [0.0, 0.0], [2.0, 0.0]])
        np.testing.assert_allclose(c, want, atol=1e-12)

    def test_bev_corners_rotation(self):
        box = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 2]])
        c = boxes.bev_box_corners(box)[0]
        # 90-degree CCW rotation of (1,1) -> (-1,1)
        np.testing.assert_allclose(c[0], [-1.0, 1.0], atol=1e-12)


class TestTransforms:
    def test_rigid_recovers_exact(self, rng):
        theta = 0.3
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        t = np.array([[1.0], [-2.0]])
        src = rng.normal(size=(2, 9))
        dst = R @ src + t
        R2, t2 = transforms.rigid_transform(src, dst)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)

    def test_2d_closed_form_matches_svd(self, rng):
        src = rng.normal(size=(2, 9))
        dst = rng.normal(size=(2, 9))
        w = rng.random(9)
        R1, t1 = transforms.rigid_transform(src, dst, w)
        R2, t2 = transforms.rigid_transform_2d(src, dst, w)
        np.testing.assert_allclose(R1, R2, atol=1e-8)
        np.testing.assert_allclose(t1, t2, atol=1e-8)

    def test_weighted_prefers_heavy_points(self, rng):
        src = rng.normal(size=(2, 5))
        R = np.array([[0.0, -1.0], [1.0, 0.0]])
        dst = R @ src
        dst[:, 4] += 10.0  # outlier
        w = np.array([1.0, 1, 1, 1, 1e-6])
        Rw, _ = transforms.rigid_transform(src, dst, w)
        Ru, _ = transforms.rigid_transform(src, dst)
        true_angle = np.pi / 2
        err_w = abs(transforms.rotation_angle_2d(Rw) - true_angle)
        err_u = abs(transforms.rotation_angle_2d(Ru) - true_angle)
        # reference semantics keep unweighted centroids, so the outlier still
        # biases the fit; weighting must at least reduce the error
        assert err_w < err_u

    def test_rotation_angle(self):
        th = -0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        assert abs(transforms.rotation_angle_2d(R) - th) < 1e-12


class TestCalibration:
    def test_project_backproject_roundtrip(self, rng):
        cal = Calibration.default()
        pts = np.stack(
            [rng.normal(size=20) * 5, rng.normal(size=20), 10 + rng.random(20) * 40],
            axis=1,
        )
        uvz = cal.rect_to_image(pts, keep_z=True)
        back = cal.image_to_rect(uvz)
        # keep_z returns the homogeneous w = z + P[2,3] (KITTI's b_z ~ 5mm),
        # matching the reference (kitti_util.py:282-293), so the roundtrip
        # is exact only up to that offset.
        np.testing.assert_allclose(back, pts, atol=2e-2)
        np.testing.assert_allclose(back[:, 2], uvz[:, 2], atol=1e-9)

    def test_velo_roundtrip(self, rng):
        cal = Calibration.default()
        pts = rng.normal(size=(15, 3)) * 10
        np.testing.assert_allclose(
            cal.velo_to_rect(cal.rect_to_velo(pts)), pts, atol=1e-9
        )

    def test_stereo_disparity_sign(self):
        """Right-camera projection of a rect point sits left of (smaller u
        than) the left-camera projection."""
        cl, cr = Calibration.default(), Calibration.default_right()
        p = np.array([[1.0, 1.0, 20.0]])
        ul = cl.rect_to_image(p)[0, 0]
        ur = cr.rect_to_image(p)[0, 0]
        assert ur < ul
        # disparity = f * baseline / z
        baseline = cr.b_x - cl.b_x
        # approximate because the two cameras carry slightly different
        # homogeneous z-offsets (P[2,3]) in real KITTI calibrations
        np.testing.assert_allclose(ul - ur, cl.f_u * baseline / 20.0, rtol=1e-2)

    def test_label_parse_format_roundtrip(self):
        line = (
            "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
            "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59 0.9"
        )
        lab = parse_label_line(line)
        assert lab.type == "Car"
        assert lab.box3d.tolist() == pytest.approx(
            [1.65, 1.67, 3.64, -0.65, 1.71, 46.70, -1.59]
        )
        lab2 = parse_label_line(format_label(lab))
        np.testing.assert_allclose(lab2.box3d, lab.box3d, atol=1e-6)
        assert lab2.score == pytest.approx(0.9)

    def test_filter_annotations(self):
        lines = [
            "Car 0.0 0 0.0 0 0 10 10 1.5 1.6 3.5 1 1 30 0.5",
            "Van 0.0 0 0.0 0 0 10 10 2.0 1.9 4.5 2 1 40 0.1",
            "Truck 0.0 0 0.0 0 0 10 10 3.0 2.5 8.0 3 1 50 0.1",
            "Pedestrian 0.0 0 0.0 0 0 10 10 1.8 0.6 0.8 4 1 20 0.1",
            "Car 0.99 0 0.0 0 0 10 10 1.5 1.6 3.5 1 1 70 0.5",
            "DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10",
        ]
        labels = [parse_label_line(l) for l in lines]
        b2, b3, cls, sc = filter_annotations(
            labels, valid_classes=(2,), depth_range=(0, 60)
        )
        # Car + Van kept (class 2); truck skipped; ped filtered by class;
        # truncated car -> DontCare (not in valid); DontCare dropped (z=-1000)
        assert cls.tolist() == [2, 2]
        assert b3.shape == (2, 7)
        # reordering: [h,w,l,x,y,z,ry]
        np.testing.assert_allclose(b3[0], [1.5, 1.6, 3.5, 1, 1, 30, 0.5], atol=1e-6)

    def test_alpha_roundtrip(self, rng):
        for _ in range(10):
            x, z = rng.normal() * 10, 10 + rng.random() * 30
            ry = rng.uniform(-np.pi, np.pi)
            a = ry_to_alpha(x, z, ry)
            assert -np.pi <= a <= np.pi
            ry2 = alpha_to_ry(x, z, a)
            d = (ry - ry2 + np.pi) % (2 * np.pi) - np.pi
            assert abs(d) < 1e-9


class TestImgProc:
    def test_crop_affine_maps_center_and_scale(self):
        c = np.array([100.0, 50.0])
        s = np.array([40.0, 80.0])  # w, h with ar 2.0
        t = imgproc.crop_affine(c, s, (128, 64))  # out h=128, w=64 -> ar 2.0
        out = imgproc.apply_affine(np.array([[100.0, 50.0]]), t)[0]
        np.testing.assert_allclose(out, [32.0, 64.0], atol=1e-9)
        # crop corners -> output corners
        tl = imgproc.apply_affine(np.array([[80.0, 10.0]]), t)[0]
        np.testing.assert_allclose(tl, [0.0, 0.0], atol=1e-9)
        br = imgproc.apply_affine(np.array([[120.0, 90.0]]), t)[0]
        np.testing.assert_allclose(br, [64.0, 128.0], atol=1e-9)

    def test_invert_affine(self, rng):
        t = imgproc.crop_affine(np.array([10.0, 20.0]), np.array([30.0, 60.0]), (64, 32))
        ti = imgproc.invert_affine(t)
        pts = rng.normal(size=(5, 2)) * 100
        np.testing.assert_allclose(
            imgproc.apply_affine(imgproc.apply_affine(pts, t), ti), pts, atol=1e-9
        )

    def test_points_to_crop_aspect(self, rng):
        kpts = rng.random((9, 2)) * np.array([100, 30])
        c, s = imgproc.points_to_crop(kpts, enlarge=1.1, aspect_ratio=2.0)
        assert s[1] / s[0] == pytest.approx(2.0)
        # all enlarged points inside the box
        assert np.all(kpts >= c - s / 2 - 1e-9) and np.all(kpts <= c + s / 2 + 1e-9)

    def test_gaussian_heatmap_peak(self):
        g = imgproc.gaussian_heatmap_2d((16, 16), (5, 7), 2.0)
        assert g[7, 5] == pytest.approx(1.0)
        assert g[7, 5 + 6] == pytest.approx(np.exp(-36 / 8.0))
        assert g[7, 5 + 7] == 0.0  # outside the 3-sigma window


class TestSimilarityAndPnp:
    def test_similarity_recovers_scale_rotation(self, rng):
        from snvc_tpu.geometry.transforms import similarity_transform

        Y = rng.standard_normal((12, 3))
        ang = 0.7
        R = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1.0],
        ])
        X = 1.7 * Y @ R.T + np.array([0.5, -1.0, 2.0])
        d, Z, T, b, c = similarity_transform(X, Y, compute_optimal_scale=True)
        assert b == pytest.approx(1.7, rel=1e-6)
        np.testing.assert_allclose(Z, X, atol=1e-8)
        assert d == pytest.approx(0.0, abs=1e-10)
        # without scale estimation b is forced to 1 and error is nonzero
        d1, Z1, T1, b1, _ = similarity_transform(X, Y)
        assert b1 == 1.0 and d1 > 0

    def test_pnp_refine_reprojects(self, rng):
        from snvc_tpu.geometry.transforms import pnp_refine

        K = np.array([[700.0, 0, 600.0], [0, 700.0, 180.0], [0, 0, 1.0]])
        # model points and a ground-truth pose
        pts = rng.uniform(-1, 1, (8, 3))
        ang = 0.3
        R = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ])
        t = np.array([0.2, -0.1, 8.0])
        cam = pts @ R.T + t
        uvw = cam @ K.T
        obs = uvw[:, :2] / uvw[:, 2:3]
        refined = pnp_refine(pts, obs, K)
        assert refined.shape == (3, 8)
        np.testing.assert_allclose(refined.T, cam, atol=1e-4)
