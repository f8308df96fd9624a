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
