"""Analytic tests for the C++ KITTI AP evaluator.

NOTE: the official 41-point recall grid needs >= ~48 ground-truth objects
before a perfect detector scores AP 100 (fewer GT leave later recall
points unfilled — a protocol property shared with the reference
evaluator), so the "perfect" cases below replicate frames.
"""

import os

import numpy as np
import pytest

from snvc_tpu.eval.kitti_ap import run_kitti_eval

CAR = (
    "Car 0.00 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
    "{h:.2f} {w:.2f} {l:.2f} {x:.2f} 1.65 {z:.2f} {ry:.2f}"
)


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def gt_line(x, z, ry=0.0, h2d=60.0, alpha=0.0, w=1.6, l=3.8, cls="Car"):
    s = CAR.format(
        alpha=alpha, x1=100, y1=100, x2=180, y2=100 + h2d, h=1.5, w=w, l=l,
        x=x, z=z, ry=ry,
    )
    return s.replace("Car", cls, 1) if cls != "Car" else s


def det_line(x, z, score, **kw):
    return gt_line(x, z, **kw) + f" {score:.4f}"


@pytest.fixture
def dirs(tmp_path):
    gt = str(tmp_path / "gt")
    res = str(tmp_path / "res")
    os.makedirs(os.path.join(res, "data"), exist_ok=True)
    os.makedirs(gt, exist_ok=True)
    return gt, res


def fill(gt, res, gt_rows, det_rows, frames=12):
    """Replicate one frame's rows across `frames` frames."""
    for i in range(frames):
        write(os.path.join(gt, f"{i:06d}.txt"), gt_rows)
        write(os.path.join(res, "data", f"{i:06d}.txt"), det_rows)


class TestKittiEval:
    def test_perfect_predictions(self, dirs):
        gt, res = dirs
        rng = np.random.default_rng(0)
        gt_rows = [gt_line(j * 10.0, 20.0 + j * 5, ry=0.3, alpha=0.3) for j in range(4)]
        det_rows = [g + f" {rng.random():.4f}" for g in gt_rows]
        fill(gt, res, gt_rows, det_rows)
        r = run_kitti_eval(gt, res)
        for metric in ("detection", "detection_ground", "detection_3d"):
            for d in range(3):
                assert r["car"][metric]["ap40"][d] == pytest.approx(100.0, abs=0.5), metric
        assert r["car"]["orientation"]["ap40"][0] == pytest.approx(100.0, abs=0.5)

    def test_all_wrong_positions(self, dirs):
        gt, res = dirs
        fill(gt, res, [gt_line(0.0, 20.0)], [det_line(30.0, 50.0, 0.9)])
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection_3d"]["ap40"][0] == pytest.approx(0.0, abs=0.1)

    def test_half_recall(self, dirs):
        """Half the GT matched with high scores, the rest missed; the
        unmatched far det scores below every TP so precision stays 1 up to
        recall 0.5 -> AP40 ~= 50."""
        gt, res = dirs
        rng = np.random.default_rng(1)
        gt_rows = [gt_line(0.0, 20.0), gt_line(10.0, 40.0)]
        fill(
            gt,
            res,
            gt_rows,
            # only the first GT is detected; second det is far away w/ low score
            [det_line(0.0, 20.0, float(0.6 + 0.4 * rng.random())),
             det_line(60.0, 70.0, 0.1)],
            frames=48,
        )
        r = run_kitti_eval(gt, res)
        ap = r["car"]["detection_3d"]["ap40"][0]
        assert ap == pytest.approx(50.0, abs=3.0)

    def test_3d_iou_gating(self, dirs):
        """A 0.9m longitudinal shift keeps the (identical) 2D boxes at IoU 1
        but drops 3D IoU of a 3.8m box below 0.7: 2D AP 100, 3D AP 0."""
        gt, res = dirs
        fill(gt, res, [gt_line(j * 10.0, 20.0) for j in range(4)],
             [det_line(j * 10.0 + 0.9, 20.0, 0.9 - 0.01 * j) for j in range(4)])
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection"]["ap40"][0] == pytest.approx(100.0, abs=0.5)
        assert r["car"]["detection_3d"]["ap40"][0] == pytest.approx(0.0, abs=0.1)

    def test_car_min_iou_override(self, dirs):
        """The same 0.9m shift (3D IoU ~0.62) fails the official 0.7 gate
        but passes a diagnostic 0.5 override."""
        gt, res = dirs
        fill(gt, res, [gt_line(j * 10.0, 20.0) for j in range(4)],
             [det_line(j * 10.0 + 0.9, 20.0, 0.9 - 0.01 * j) for j in range(4)])
        r07 = run_kitti_eval(gt, res)
        r05 = run_kitti_eval(gt, res, car_min_iou=0.5)
        assert r07["car"]["detection_3d"]["ap40"][0] == pytest.approx(0.0, abs=0.1)
        assert r05["car"]["detection_3d"]["ap40"][0] == pytest.approx(100.0, abs=0.5)

    def test_square_box_rotation_symmetric(self, dirs):
        """90-degree rotation of a square BEV footprint is geometrically
        identical -> BEV AP 100 (exercises the rotated clipping)."""
        gt, res = dirs
        fill(gt, res,
             [gt_line(j * 10.0, 20.0, w=2.0, l=2.0) for j in range(4)],
             [det_line(j * 10.0, 20.0, 0.9 - 0.01 * j, ry=np.pi / 2, w=2.0, l=2.0)
              for j in range(4)])
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection_ground"]["ap40"][0] == pytest.approx(100.0, abs=0.5)

    def test_45deg_rotation_fails_gate(self, dirs):
        """A 45-degree rotated elongated box has BEV IoU well below 0.7
        against its unrotated twin (analytic IoU ~ 0.27)."""
        gt, res = dirs
        fill(gt, res, [gt_line(0.0, 20.0)], [det_line(0.0, 20.0, 0.9, ry=np.pi / 4)])
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection_ground"]["ap40"][0] == pytest.approx(0.0, abs=0.1)

    def test_difficulty_gating(self, dirs):
        """A 30px-high GT is ignored at easy (min 40px) but is a FN at
        moderate: moderate 3D AP 0 with a far detection."""
        gt, res = dirs
        fill(gt, res, [gt_line(0.0, 20.0, h2d=30.0)],
             [det_line(50.0, 50.0, 0.9, h2d=30.0)])
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection_3d"]["ap40"][1] == pytest.approx(0.0, abs=0.1)

    def test_van_ignored_for_car(self, dirs):
        """Detections on Vans are absorbed (neither TP nor FP) for the Car
        class -> perfect AP on the true cars."""
        gt, res = dirs
        rng = np.random.default_rng(2)
        gt_rows = [gt_line(0.0, 20.0, cls="Van")] + [
            gt_line(10.0 + 8 * j, 30.0) for j in range(4)
        ]
        det_rows = [det_line(0.0, 20.0, 0.85)] + [
            det_line(10.0 + 8 * j, 30.0, float(0.5 + 0.5 * rng.random()))
            for j in range(4)
        ]
        fill(gt, res, gt_rows, det_rows)
        r = run_kitti_eval(gt, res)
        assert r["car"]["detection_3d"]["ap40"][0] == pytest.approx(100.0, abs=0.5)

    def test_dontcare_absorbs_detections(self, dirs):
        gt, res = dirs
        dc = "DontCare -1 -1 -10 100.00 100.00 180.00 160.00 -1 -1 -1 -1000 -1000 -1000 -10"
        gt_rows = [dc] + [gt_line(10.0 + 8 * j, 30.0) for j in range(4)]
        # one detection entirely inside the DontCare 2D box (image metric)
        det_rows = [det_line(99.0, 99.0, 0.95)] + [
            det_line(10.0 + 8 * j, 30.0, 0.9 - 0.01 * j) for j in range(4)
        ]
        fill(gt, res, gt_rows, det_rows)
        r = run_kitti_eval(gt, res)
        # for the image metric the stray det overlaps the DontCare area
        # (same 2D box) and is absorbed -> AP 100
        assert r["car"]["detection"]["ap40"][0] == pytest.approx(100.0, abs=0.5)
        # absorption must use the 2D IMAGE overlap for every metric: the
        # stray det's 3D position (99, 99) is nowhere near the DontCare
        # placeholder 3D fields, yet it sits in the DontCare image region,
        # so BEV/3D AP are also perfect (official protocol; reference
        # evaluate_object_3d_offline.cpp:582)
        assert r["car"]["detection_ground"]["ap40"][0] == pytest.approx(100.0, abs=0.5)
        assert r["car"]["detection_3d"]["ap40"][0] == pytest.approx(100.0, abs=0.5)
