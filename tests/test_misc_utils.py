"""Tests: augmentation ops, 2D box utilities, profiling, experimenter."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.geometry import boxes2d
from snvc_tpu.ops import augment
from snvc_tpu.utils.logging import Experimenter
from snvc_tpu.utils.profiling import StepTimer, device_memory_stats


class TestAugment:
    def test_color_jitter_bounded(self, rng):
        img = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
        out = augment.color_jitter(jax.random.PRNGKey(0), img)
        assert out.shape == img.shape
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0
        # different keys give different augmentations
        out2 = augment.color_jitter(jax.random.PRNGKey(1), img)
        assert not np.allclose(np.asarray(out2), o)

    def test_normalize_roundtrip(self, rng):
        img = jnp.asarray(rng.random((2, 4, 4, 3)), jnp.float32)
        n = augment.normalize(img)
        back = n * augment.IMAGENET_STD + augment.IMAGENET_MEAN
        np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-6)

    def test_saturation_gray_identity(self):
        gray = jnp.full((1, 4, 4, 3), 0.5)
        out = augment.saturation(jax.random.PRNGKey(0), gray)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


class TestBoxes2d:
    def test_xywh_roundtrip(self, rng):
        b = rng.random((5, 4)) * 50
        b[:, 2:] += 1
        np.testing.assert_allclose(
            boxes2d.xyxy_to_xywh(boxes2d.xywh_to_xyxy(b)), b, atol=1e-9
        )

    def test_hflip_involution(self, rng):
        b = np.array([[10.0, 5.0, 30.0, 25.0]])
        f = boxes2d.hflip_boxes(boxes2d.hflip_boxes(b, 100), 100)
        np.testing.assert_allclose(f, b, atol=1e-9)

    def test_iou_matrix(self):
        a = np.array([[0.0, 0, 10, 10]])
        b = np.array([[5.0, 0, 15, 10], [20.0, 20, 30, 30]])
        m = boxes2d.iou_matrix(a, b)
        assert m[0, 0] == pytest.approx(50 / 150)
        assert m[0, 1] == 0.0

    def test_nms_2d(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 0, 11, 10], [20, 20, 30, 30]], np.float64
        )
        keep = boxes2d.nms_2d(boxes, [0.9, 0.8, 0.7], 0.5)
        assert keep.tolist() == [0, 2]

    def test_clip_remove_empty(self):
        boxes = np.array([[-5.0, -5, 5, 5], [200.0, 200, 210, 210]])
        out = boxes2d.clip_boxes(boxes, (100, 100), remove_empty=True)
        assert len(out) == 1


class TestObservability:
    def test_step_timer(self, tmp_path):
        t = StepTimer(str(tmp_path / "t.jsonl"))
        for _ in range(3):
            t.tick()
        t.log(5, {"loss": 1.0})
        assert t.mean_step_seconds >= 0
        assert os.path.exists(tmp_path / "t.jsonl")

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict) and len(stats) >= 1

    def test_experimenter_roundtrip(self, tmp_path):
        from snvc_tpu.config import tiny_vernier_config

        cfg = tiny_vernier_config()
        exp = Experimenter(str(tmp_path / "run"), config=cfg)
        exp2 = Experimenter(str(tmp_path / "run"))
        assert exp2.config.grid_resolution == cfg.grid_resolution
        exp2.logger.info("hello")
        w = exp2.metrics_writer()
        w(1, {"loss": 0.5})
        assert os.path.exists(tmp_path / "run" / "metrics.jsonl")


class TestInventoryExtras:
    def test_corners_to_dims(self, rng):
        from snvc_tpu.geometry import boxes as gbox

        b = np.array([1.5, 1.7, 4.1, 2.0, 1.6, 20.0, 0.7])
        dims = gbox.corners_to_dims(gbox.box_corners_cam(b))
        np.testing.assert_allclose(dims, [1.5, 1.7, 4.1], atol=1e-6)

    def test_quaternion_roundtrip(self, rng):
        from snvc_tpu.geometry.boxes import euler_to_quat, quat_to_euler, quat_to_rotation

        rx, ry, rz = 0.1, -0.4, 0.9
        q = euler_to_quat(rx, ry, rz)
        back = quat_to_euler(*q)
        np.testing.assert_allclose(back, [rx, ry, rz], atol=1e-9)
        R = quat_to_rotation(*q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_fcos_centerness(self):
        from snvc_tpu.geometry.boxes import fcos_centerness

        # centered location -> 1; edge -> 0
        assert fcos_centerness(5.0, 5.0, 5.0, 5.0) == pytest.approx(1.0)
        assert fcos_centerness(0.0, 5.0, 10.0, 5.0) == pytest.approx(0.0)

    def test_bbox_loss_3d(self):
        from snvc_tpu.models.losses import approximated_iou3d, bbox_loss_3d

        b = jnp.array([[1.5, 1.7, 4.0, 0.0, 1.6, 20.0, 0.3]])
        iou = approximated_iou3d(b, b)
        np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)
        out = bbox_loss_3d(b, b, jnp.ones(1, bool))
        assert float(out["sl1"]) == pytest.approx(0.0, abs=1e-6)
        assert float(out["IoU3D"]) == pytest.approx(0.0, abs=1e-5)
        b2 = b.at[0, 3].add(1.0)
        out2 = bbox_loss_3d(b2, b, jnp.ones(1, bool))
        assert float(out2["IoU3D"]) > 0.2

    def test_disentangled_loss_zero_at_gt(self):
        from snvc_tpu.models.losses import disentangled_corner_loss

        p = jnp.array([[0.5, 1.6, 20.0, 1.5, 1.7, 4.0, 0.3]])
        w = jnp.ones(1)
        assert float(disentangled_corner_loss(p, p, w)) == pytest.approx(0.0, abs=1e-6)
        p2 = p.at[0, 6].add(0.5)
        assert float(disentangled_corner_loss(p2, p, w)) > 0.01

    def test_weighted_voxel_mse(self):
        from snvc_tpu.models.losses import voxel_mse_loss_weighted

        t = jnp.zeros((1, 2, 4, 4)).at[0, :, 2, 2].set(1.0)
        zero = voxel_mse_loss_weighted(t, t, jnp.ones(1, bool))
        assert float(zero) == pytest.approx(0.0, abs=1e-7)
        # an all-zero prediction errs only on the positive cells; the
        # balanced form weighs that at 0.5 regardless of cell counts
        pred = jnp.zeros_like(t)
        v = voxel_mse_loss_weighted(pred, t, jnp.ones(1, bool))
        assert float(v) == pytest.approx(0.5, abs=1e-6)
