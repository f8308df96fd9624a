"""Rotated IoU / NMS tests against an independent clipping implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.ops.nms import normal_nms, rotated_nms_bev, top_k_boxes
from snvc_tpu.ops.rotated_iou import (
    bev_corners,
    bev_from_box3d,
    bev_iou,
    bev_overlap,
    diou_bev,
    iou3d,
)


# --- independent golden implementation (Sutherland-Hodgman, numpy) --------


def np_corners(box):
    c, s = np.cos(box[4]), np.sin(box[4])
    x4 = np.array([0.5, -0.5, -0.5, 0.5]) * box[2]
    y4 = np.array([0.5, 0.5, -0.5, -0.5]) * box[3]
    return np.stack([x4 * c - y4 * s + box[0], x4 * s + y4 * c + box[1]], axis=1)


def np_overlap(a, b):
    def clip(subject, cp1, cp2):
        out = []
        n = len(subject)
        for i in range(n):
            cur, prev = subject[i], subject[i - 1]
            side_c = (cp2[0] - cp1[0]) * (cur[1] - cp1[1]) - (cp2[1] - cp1[1]) * (
                cur[0] - cp1[0]
            )
            side_p = (cp2[0] - cp1[0]) * (prev[1] - cp1[1]) - (cp2[1] - cp1[1]) * (
                prev[0] - cp1[0]
            )
            if side_c >= 0:
                if side_p < 0:
                    out.append(_isect(prev, cur, cp1, cp2))
                out.append(cur)
            elif side_p >= 0:
                out.append(_isect(prev, cur, cp1, cp2))
        return out

    def _isect(p, q, a_, b_):
        a1 = b_[1] - a_[1]
        b1 = a_[0] - b_[0]
        c1 = a1 * a_[0] + b1 * a_[1]
        a2 = q[1] - p[1]
        b2 = p[0] - q[0]
        c2 = a2 * p[0] + b2 * p[1]
        det = a1 * b2 - a2 * b1
        return np.array([(b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det])

    subject = list(np_corners(a))
    clip_poly = list(np_corners(b))
    # ensure both CCW
    def area(poly):
        poly = np.asarray(poly)
        return 0.5 * np.sum(
            poly[:, 0] * np.roll(poly[:, 1], -1) - np.roll(poly[:, 0], -1) * poly[:, 1]
        )

    if area(subject) < 0:
        subject = subject[::-1]
    if area(clip_poly) < 0:
        clip_poly = clip_poly[::-1]
    for i in range(4):
        if not subject:
            break
        subject = clip(subject, clip_poly[i - 1], clip_poly[i])
    return abs(area(subject)) if len(subject) >= 3 else 0.0


def rand_bev(rng, n):
    return np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            rng.uniform(1, 4, n),
            rng.uniform(1, 4, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


class TestRotatedIoU:
    def test_axis_aligned_analytic(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        ov = float(bev_overlap(a, b)[0, 0])
        assert ov == pytest.approx(2.0, abs=1e-5)  # 1x2 overlap strip
        assert float(bev_iou(a, b)[0, 0]) == pytest.approx(2.0 / 6.0, abs=1e-5)

    def test_identical_boxes(self):
        a = jnp.array([[1.0, 2.0, 3.0, 1.5, 0.7]])
        assert float(bev_iou(a, a)[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_45deg_square_cross(self):
        """Unit square vs itself rotated 45 deg: octagon overlap,
        area = 2*(sqrt(2)-1)."""
        a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = jnp.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
        ov = float(bev_overlap(a, b)[0, 0])
        assert ov == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-4)

    def test_disjoint(self):
        a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
        b = jnp.array([[10.0, 0.0, 1.0, 1.0, -0.3]])
        assert float(bev_overlap(a, b)[0, 0]) == 0.0

    def test_random_vs_golden(self, rng):
        A = rand_bev(rng, 12)
        B = rand_bev(rng, 10)
        got = np.asarray(bev_overlap(jnp.array(A), jnp.array(B)))
        for i in range(12):
            for j in range(10):
                want = np_overlap(A[i], B[j])
                assert got[i, j] == pytest.approx(want, abs=2e-3), (i, j)

    def test_containment(self):
        a = jnp.array([[0.0, 0.0, 4.0, 4.0, 0.2]])
        b = jnp.array([[0.0, 0.0, 1.0, 1.0, -0.9]])
        assert float(bev_overlap(a, b)[0, 0]) == pytest.approx(1.0, abs=1e-4)

    def test_iou3d_full_and_half_height(self):
        b1 = jnp.array([[2.0, 2.0, 4.0, 0.0, 1.0, 20.0, 0.3]])
        assert float(iou3d(b1, b1)[0, 0]) == pytest.approx(1.0, abs=1e-5)
        # same footprint, half-overlapping height
        b2 = b1.at[0, 4].add(1.0)  # shift bottom down by h/2
        got = float(iou3d(b1, b2)[0, 0])
        assert got == pytest.approx(1.0 / 3.0, abs=1e-4)  # 1 / (2+2-1)

    def test_iou3d_differentiable(self):
        """Native gradients match central differences (the reference needed
        a hand-rolled numerical Jacobian, numerical_jaccobian.py:17-57)."""
        b1 = jnp.array([1.6, 1.7, 4.0, 0.5, 1.0, 20.0, 0.2], jnp.float32)
        b2 = jnp.array([1.5, 1.6, 3.8, 0.0, 1.1, 20.5, 0.4], jnp.float32)
        f = lambda a: iou3d(a[None], b2[None])[0, 0]
        g = jax.grad(f)(b1)
        eps = 1e-3
        for k in range(7):
            e = jnp.zeros(7).at[k].set(eps)
            num = (f(b1 + e) - f(b1 - e)) / (2 * eps)
            assert float(g[k]) == pytest.approx(float(num), abs=2e-2), k

    def test_diou_identity(self):
        a = jnp.array([[0.0, 0.0, 2.0, 3.0, 0.4]])
        loss, iou = diou_bev(a, a)
        assert float(iou[0]) == pytest.approx(1.0, abs=1e-5)
        assert float(loss[0]) == pytest.approx(0.0, abs=1e-5)


class TestNMS:
    def test_greedy_suppression(self):
        boxes = jnp.array(
            [
                [0.0, 0.0, 2.0, 2.0, 0.0],
                [0.2, 0.0, 2.0, 2.0, 0.0],  # heavy overlap with 0
                [5.0, 5.0, 2.0, 2.0, 0.0],  # far
                [5.1, 5.0, 2.0, 2.0, 0.3],  # overlaps 2
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.95])
        keep = rotated_nms_bev(boxes, scores, jnp.ones(4, bool), 0.5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, False, True])

    def test_valid_mask_respected(self):
        boxes = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0], [9.0, 9.0, 2.0, 2.0, 0.0]])
        keep = rotated_nms_bev(boxes, jnp.array([0.5, 0.9]),
                               jnp.array([True, False]), 0.5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False])

    def test_normal_nms(self):
        boxes = jnp.array([[0.0, 0.0, 2.0, 2.0], [0.1, 0.0, 2.1, 2.0],
                           [5.0, 5.0, 7.0, 7.0]])
        keep = normal_nms(boxes, jnp.array([0.9, 0.8, 0.7]), jnp.ones(3, bool), 0.5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True])

    def test_top_k(self):
        boxes = jnp.arange(12.0).reshape(6, 2)
        scores = jnp.array([0.1, 0.9, 0.5, 0.7, 0.3, 0.2])
        keep = jnp.array([True, True, False, True, True, True])
        sel, sc, val = top_k_boxes(boxes, scores, keep, 3)
        np.testing.assert_allclose(np.asarray(sc), [0.9, 0.7, 0.3], atol=1e-6)
        assert val.all()
