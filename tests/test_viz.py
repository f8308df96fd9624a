"""Tests for the visualization layer (TraceBox visibility + rendering)."""

import os

import numpy as np
import pytest

from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry.calib import Calibration, parse_label_line
from snvc_tpu.viz.tracebox import (
    TraceBoxRenderer,
    render_frame,
    save_image_grid,
    vertex_visibility,
)


class TestVisibility:
    def test_single_box_back_corners_hidden(self):
        """A box straight ahead: its near face is visible, the far-face
        corners are occluded by the box's own near faces."""
        box = np.array([1.5, 1.6, 3.6, 0.0, 1.0, 20.0, 0.0])
        corners = gbox.box_corners_cam(box)[None]
        vis = vertex_visibility(corners)[0]
        # corners with smaller z are nearer; at ry=0 the +-x object axis is
        # the camera x... compute near/far by z
        z = corners[0][:, 2]
        near = z < z.mean()
        # all near corners visible
        assert vis[near].all()
        # far corners occluded by the box body
        assert not vis[~near].any()

    def test_two_boxes_occlusion(self):
        front = np.array([1.5, 1.6, 3.6, 0.0, 1.0, 10.0, 0.0])
        behind = np.array([1.5, 1.6, 3.6, 0.0, 1.0, 30.0, 0.0])
        corners = gbox.box_corners_cam(np.stack([front, behind]))
        vis = vertex_visibility(corners)
        # the rear box is fully behind the front one -> all corners hidden
        assert not vis[1].any()
        # front box near corners still visible
        z = corners[0][:, 2]
        assert vis[0][z < z.mean()].all()

    def test_side_by_side_no_occlusion(self):
        a = np.array([1.5, 1.6, 3.6, -5.0, 1.0, 20.0, 0.0])
        b = np.array([1.5, 1.6, 3.6, 5.0, 1.0, 20.0, 0.0])
        corners = gbox.box_corners_cam(np.stack([a, b]))
        vis = vertex_visibility(corners)
        for i in range(2):
            z = corners[i][:, 2]
            assert vis[i][z < z.mean()].all()


class TestRendering:
    def test_render_frame_writes_png(self, tmp_path):
        img = np.full((375, 1242, 3), 90, np.uint8)
        line = (
            "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
            "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59"
        )
        labels = [parse_label_line(line)]
        out = str(tmp_path / "frame.png")
        render_frame(img, labels, Calibration.default(), out)
        assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_image_grid(self, tmp_path):
        imgs = [np.random.randint(0, 255, (40, 80, 3), np.uint8) for _ in range(3)]
        out = str(tmp_path / "grid.png")
        save_image_grid(imgs, out, cols=2)
        assert os.path.exists(out)


class TestDebugRenders:
    def test_render_debug_batch_writes_pngs(self, tmp_path):
        """The --debug CLI path's renderer produces the NCF / occupancy /
        update PNGs from a refinement output dict."""
        from snvc_tpu.viz.debug import render_debug_batch

        rng = np.random.default_rng(0)
        B, P, nh, nw, nl = 2, 9, 4, 8, 8
        batch = {
            "samples": np.array(
                [[1.5, 1.6, 3.8, 0.0, 1.65, 12.0, 0.1]] * B, np.float32
            ),
            "gt_boxes": np.array(
                [[1.5, 1.6, 3.8, 0.2, 1.65, 12.3, 0.15]] * B, np.float32
            ),
            "valid": np.array([True, False]),
        }
        out = {
            "ncf": rng.random((B, P, nl, nw)).astype(np.float32),
            "occupancy": rng.random((B, nh, nw, nl)).astype(np.float32),
            "one_part": batch["samples"] + 0.05,
            "all_parts": batch["samples"] + 0.1,
        }
        paths = render_debug_batch(batch, out, str(tmp_path / "dbg"))
        assert set(paths) == {"ncf", "occupancy", "update"}
        for p in paths.values():
            assert os.path.getsize(p) > 1000, p

    def test_render_debug_3d_ncf(self, tmp_path):
        from snvc_tpu.viz.debug import render_ncf

        rng = np.random.default_rng(1)
        path = str(tmp_path / "ncf3d.png")
        render_ncf(rng.random((1, 3, 4, 8, 8)).astype(np.float32), path)
        assert os.path.getsize(path) > 1000


class TestLidarTopView:
    """Legacy-viz equivalent (SURVEY P23): lidar_to_top encoding + drawing
    (reference snvc/visualization/kitti_util.py:418-530,696-752)."""

    SPEC = None

    @classmethod
    def setup_class(cls):
        from snvc_tpu.viz.lidar import TopViewSpec

        # tiny grid: nx=5, ny=5, nz=3 (z slices of 0.3 m over [0, 0.9))
        cls.SPEC = TopViewSpec(
            x_range=(0.0, 4.0), y_range=(-2.0, 2.0), z_range=(0.0, 0.9),
            xy_division=1.0, z_division=0.3,
        )

    def test_channel_semantics_hand_case(self):
        from snvc_tpu.viz.lidar import lidar_to_top

        # three points in the cell x∈[1,2), y∈[0,1):
        #   z=0.15 (slice 0, frac 0.5, refl 0.2)
        #   z=0.45 (slice 1, frac 0.5, refl 0.9)  <- highest
        #   z=0.30 (slice 1, frac 0.0, refl 0.1)
        pts = np.array(
            [
                [1.5, 0.5, 0.15, 0.2],
                [1.5, 0.5, 0.45, 0.9],
                [1.5, 0.5, 0.30, 0.1],
            ],
            np.float32,
        )
        top = lidar_to_top(pts, self.SPEC)
        assert top.shape == (5, 5, 3 + 2)
        # flipped layout: qx=1 -> row nx-1-1=3; qy=floor(0.5+2)=2 -> col 2
        r, c = 3, 2
        nz = 3
        # density: log(3+1)/log(32)
        assert np.isclose(top[r, c, nz + 1], np.log(4) / np.log(32), atol=1e-6)
        # intensity = reflectance of the highest point
        assert np.isclose(top[r, c, nz], 0.9)
        # slice heights: slice0 max frac 0.5; slice1 max frac 0.5; slice2 empty
        assert np.isclose(top[r, c, 0], 0.5, atol=1e-6)
        assert np.isclose(top[r, c, 1], 0.5, atol=1e-6)
        assert top[r, c, 2] == 0.0
        # everything else empty
        mask = np.ones((5, 5), bool)
        mask[r, c] = False
        assert np.all(top[mask] == 0.0)

    def test_out_of_range_points_dropped(self):
        from snvc_tpu.viz.lidar import lidar_to_top

        pts = np.array(
            [
                [-1.0, 0.0, 0.5, 1.0],   # behind x_min
                [1.0, 5.0, 0.5, 1.0],    # beyond y_max
                [1.0, 0.0, 2.0, 1.0],    # above z_max
            ],
            np.float32,
        )
        top = lidar_to_top(pts, self.SPEC)
        assert np.all(top == 0.0)

    def test_top_coords_flip(self):
        from snvc_tpu.viz.lidar import top_coords

        # far-forward left corner maps to row 0; near-right to the last
        r, c = top_coords(3.9, 1.9, self.SPEC)
        assert (r, c) == (1, 1)
        r, c = top_coords(0.1, -1.9, self.SPEC)
        assert (r, c) == (4, 4)

    def test_top_view_image_and_boxes(self):
        from snvc_tpu.viz.lidar import (
            draw_boxes_on_top,
            lidar_to_top,
            top_view_image,
        )

        rng = np.random.default_rng(3)
        pts = np.column_stack(
            [
                rng.uniform(0.1, 3.9, 200),
                rng.uniform(-1.9, 1.9, 200),
                rng.uniform(0.05, 0.85, 200),
                rng.uniform(0, 1, 200),
            ]
        ).astype(np.float32)
        img = top_view_image(lidar_to_top(pts, self.SPEC))
        assert img.dtype == np.uint8 and img.shape == (5, 5, 3)
        assert img.max() == 255  # min-max normalized

        ring = np.array([[[0.5, -1.5], [0.5, 1.5], [3.5, 1.5], [3.5, -1.5]]])
        before = img.copy()
        out = draw_boxes_on_top(img, ring, self.SPEC, is_gt=True)
        assert np.array_equal(img, before), "input must not be mutated"
        green = (out[:, :, 1] == 255) & (out[:, :, 0] == 0)
        assert green.sum() >= 8, "GT ring should paint green pixels"
        # score shading: low score dimmer than high score
        lo = draw_boxes_on_top(img, ring, self.SPEC, scores=[0.0])
        hi = draw_boxes_on_top(img, ring, self.SPEC, scores=[1.0])
        changed = np.any(lo != img, axis=2)
        assert lo[changed].max() < hi[changed].max()

    def test_visualize_top_views_end_to_end(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from visualize import visualize_top_views

        from snvc_tpu.data.synthetic import make_synthetic_kitti

        root = str(tmp_path / "kitti")
        make_synthetic_kitti(root, num_frames=1, boxes_per_frame=2, seed=5,
                             split="val")
        # predictions = the GT labels with a score column
        pred_dir = str(tmp_path / "preds")
        os.makedirs(pred_dir)
        lbl = os.path.join(root, "training", "label_2")
        fn = sorted(os.listdir(lbl))[0]
        with open(os.path.join(lbl, fn)) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        with open(os.path.join(pred_dir, fn), "w") as f:
            f.write("\n".join(ln + " 0.9" for ln in lines) + "\n")
        out = str(tmp_path / "viz")
        n = visualize_top_views(pred_dir, root, out, "val")
        assert n == 1
        pngs = os.listdir(out)
        assert len(pngs) == 1 and pngs[0].endswith("_top.png")
        assert os.path.getsize(os.path.join(out, pngs[0])) > 200
