"""3D box geometry (numpy host substrate).

Box convention throughout the framework (matching the reference's
post-filter ordering, snvc/dataset/KITTILoader3D.py:59):

    box3d = [h, w, l, x, y, z, ry]

with (x, y, z) the *bottom center* in the rect camera frame and ry the yaw
around the camera y (down) axis; KITTI yaw is clockwise-positive.

The 9-part parameterization used by the Vernier model is part 0 = box
*center* (mid-height), parts 1..8 = corners, in the exact ordering of the
reference (snvc/models/vernier.py:740-751) so NCF channels line up.
"""

from __future__ import annotations

import numpy as np

# Per-part coordinates in the object frame, for a unit box (l=h=w=1),
# centered at the box center.  Ordering matches vernier.py:744-746:
#   x: [.5l, l, l, l, l, 0, 0, 0, 0] - l/2
#   y: [.5h, 0, h, 0, h, 0, h, 0, h] - h
#   z: [.5w, w, w, 0, 0, w, w, 0, 0] - w/2
_PART_X = np.array([0.0, 0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5])
_PART_Y = np.array([-0.5, -1.0, 0.0, -1.0, 0.0, -1.0, 0.0, -1.0, 0.0])
_PART_Z = np.array([0.0, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])

# BEV 4-corner ordering for a (x, z, w, l, angle) box, matching the
# reference's box2corners (snvc/utils/torch_utils.py:131-162).
_BEV_X = np.array([0.5, -0.5, -0.5, 0.5])
_BEV_Y = np.array([0.5, 0.5, -0.5, -0.5])


def rot_y(ry):
    """Rotation matrix around the camera y axis; [..., 3, 3].

    Matches the reference convention (KITTIRefinement_dataset.py:547-549).
    """
    ry = np.asarray(ry)
    c, s = np.cos(ry), np.sin(ry)
    zero, one = np.zeros_like(c), np.ones_like(c)
    rows = np.stack(
        [
            np.stack([c, zero, s], axis=-1),
            np.stack([zero, one, zero], axis=-1),
            np.stack([-s, zero, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def parts_object_frame(box3d) -> np.ndarray:
    """The 9 part points in the object frame, [..., 9, 3].

    box3d: [..., 7] (h, w, l, x, y, z, ry); only dims are used.
    """
    box3d = np.asarray(box3d)
    h, w, l = box3d[..., 0:1], box3d[..., 1:2], box3d[..., 2:3]
    x = l * _PART_X
    y = h * _PART_Y
    z = w * _PART_Z
    return np.stack([x, y, z], axis=-1)


def box_parts_cam(box3d) -> np.ndarray:
    """Camera-frame coordinates of the 9 parts, [..., 9, 3].

    Equivalent to the reference's get_cam_cord (vernier.py:753-765):
    rotate the object-frame parts by ry and translate to the bottom center.
    """
    box3d = np.asarray(box3d)
    pts = parts_object_frame(box3d)  # [..., 9, 3]
    R = rot_y(box3d[..., 6])  # [..., 3, 3]
    rotated = np.einsum("...ij,...nj->...ni", R, pts)
    return rotated + box3d[..., None, 3:6]


def box_corners_cam(box3d) -> np.ndarray:
    """Only the 8 corners, [..., 8, 3]."""
    return box_parts_cam(box3d)[..., 1:, :]


def object_basis(box3d) -> np.ndarray:
    """Basis of the object ("sitting in the car") frame, [..., 3, 3].

    Columns are the w (right-hand), h (gravity), l (front) directions in the
    camera frame; equals rot_y(ry) @ B with B columns
    [0,0,-1], [0,1,0], [1,0,0] (reference: vernier.py:596-612).

    Camera offsets project to object coords via ``offset @ basis``; object
    coords map back to camera via ``local @ basis.T``.
    """
    box3d = np.asarray(box3d)
    B = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    return rot_y(box3d[..., 6]) @ B


def grid_to_cam(grid_local, box3d) -> np.ndarray:
    """Map Vernier-grid points from the object frame to the camera frame.

    grid_local: [..., N, 3] points with axes (x: width, y: height, z: length)
    of the object frame; box3d: [..., 7].  The grid is centered at the box
    *center* (not bottom center) and the points head "front" before rotation,
    hence the extra +pi/2 (reference: KITTIRefinement_dataset.py:828-846).
    """
    box3d = np.asarray(box3d)
    R = rot_y(box3d[..., 6] + 0.5 * np.pi)
    center = np.concatenate(
        [
            box3d[..., 3:4],
            box3d[..., 4:5] - 0.5 * box3d[..., 0:1],
            box3d[..., 5:6],
        ],
        axis=-1,
    )
    return np.einsum("...ij,...nj->...ni", R, np.asarray(grid_local)) + center[..., None, :]


def cuboid_planes(corners8) -> np.ndarray:
    """Outward plane coefficients [..., 6, 4] of a cuboid from its 8 corners.

    ``corners8`` uses the framework part ordering (parts 1..8).  A point p is
    inside iff  [p, 1] . plane < 0  for all six planes
    (reference: snvc/utils/bounding_box.py:360-390).
    """
    corners8 = np.asarray(corners8)
    # faces as (p1, p2, p3) triples; normal = (p2-p1) x (p3-p2) points outward.
    # Using 0-based indices into the parts-1..8 array (reference indices -1).
    faces = np.array(
        [
            [1, 0, 2],  # front  (+x object)
            [7, 6, 4],  # back   (-x)
            [5, 4, 0],  # left   (+z object)
            [3, 2, 6],  # right  (-z)
            [0, 4, 6],  # top    (-y cam, box roof)
            [7, 5, 1],  # bottom
        ]
    )
    p1 = corners8[..., faces[:, 0], :]
    p2 = corners8[..., faces[:, 1], :]
    p3 = corners8[..., faces[:, 2], :]
    n = np.cross(p2 - p1, p3 - p2)
    d = -np.sum(p1 * n, axis=-1, keepdims=True)
    return np.concatenate([n, d], axis=-1)


def points_in_cuboid(points, corners8) -> np.ndarray:
    """Boolean mask [..., N] of points inside the cuboid.

    points: [..., N, 3]; corners8: [..., 8, 3] (framework part order).
    Half-space test against the 6 outward planes; same semantics as the
    reference's Mesh.in_mesh (bounding_box.py:286-297) and the
    points-in-rotated-box CUDA kernel (roiaware_pool3d_kernel.cu:16-36).
    """
    planes = cuboid_planes(corners8)  # [..., 6, 4]
    points = np.asarray(points)
    s = np.einsum("...nk,...fk->...nf", points, planes[..., :3])
    s = s + planes[..., None, :, 3]
    return np.all(s < 0, axis=-1)


def points_in_box3d(points, box3d, tol: float = 0.0) -> np.ndarray:
    """Mask of points inside an upright box3d, via the local-frame test.

    Cheaper, exactly-equivalent alternative to the plane test for upright
    boxes: rotate into the object frame and compare against half-dims.
    """
    box3d = np.asarray(box3d)
    pts = np.asarray(points)
    center = box3d[..., 3:6].copy()
    center[..., 1] -= 0.5 * box3d[..., 0]
    R = rot_y(box3d[..., 6])
    local = np.einsum("...ji,...nj->...ni", R, pts - center[..., None, :])
    hx = 0.5 * box3d[..., 2] + tol  # l along object x
    hy = 0.5 * box3d[..., 0] + tol
    hz = 0.5 * box3d[..., 1] + tol  # w along object z
    return (
        (np.abs(local[..., 0]) < hx)
        & (np.abs(local[..., 1]) < hy)
        & (np.abs(local[..., 2]) < hz)
    )


def bev_box_corners(boxes) -> np.ndarray:
    """4 BEV corners [..., 4, 2] of (cx, cy, w, h, angle) boxes
    (reference: torch_utils.py:131-162; counter-clockwise-positive angle)."""
    boxes = np.asarray(boxes)
    w, h = boxes[..., 2:3], boxes[..., 3:4]
    x4 = w * _BEV_X
    y4 = h * _BEV_Y
    c, s = np.cos(boxes[..., 4:5]), np.sin(boxes[..., 4:5])
    rx = x4 * c - y4 * s + boxes[..., 0:1]
    ry_ = x4 * s + y4 * c + boxes[..., 1:2]
    return np.stack([rx, ry_], axis=-1)


def box3d_to_bev(box3d) -> np.ndarray:
    """box3d [..., 7] -> BEV (x, z, w=box w, h=box l, angle) with the
    counter-clockwise convention used by rotated-IoU code
    (reference: loss3d.py:721-731 flips the KITTI clockwise yaw)."""
    box3d = np.asarray(box3d)
    return np.stack(
        [
            box3d[..., 3],
            box3d[..., 5],
            box3d[..., 2],  # length along heading
            box3d[..., 1],  # width
            -box3d[..., 6],
        ],
        axis=-1,
    )


def canonical_bev_parts(w, l) -> np.ndarray:
    """BEV (x, z) coordinates of the 9 parts for an unrotated box at origin,
    [2, 9] (reference: vernier.py:614-622)."""
    x = np.asarray(_PART_X) * l
    z = np.asarray(_PART_Z) * w
    return np.stack([x, z], axis=0)


def corners_to_dims(corners8):
    """Recover (h, w, l) from 8 corners in the framework part order
    (reference numpy_utils.get_dimention_from_corners:42-61)."""
    corners8 = np.asarray(corners8)
    # parts 1..8: edges of the cuboid in the part ordering
    l = np.linalg.norm(corners8[..., 0, :] - corners8[..., 4, :], axis=-1)
    h = np.linalg.norm(corners8[..., 0, :] - corners8[..., 1, :], axis=-1)
    w = np.linalg.norm(corners8[..., 0, :] - corners8[..., 2, :], axis=-1)
    return np.stack([h, w, l], axis=-1)


def fcos_centerness(l, t, r, b):
    """FCOS centerness sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)))
    (reference torch_utils.compute_centerness_targets:100-105)."""
    lr = np.minimum(l, r) / np.maximum(np.maximum(l, r), 1e-9)
    tb = np.minimum(t, b) / np.maximum(np.maximum(t, b), 1e-9)
    return np.sqrt(np.clip(lr * tb, 0, None))


# --- quaternions (reference bounding_box.py:439-470) -----------------------


def quat_to_euler(qw, qx, qy, qz):
    """Quaternion -> (rx, ry, rz) Euler angles."""
    rx = np.arctan2(2.0 * (qw * qx + qy * qz), 1.0 - 2.0 * (qx * qx + qy * qy))
    sinp = np.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    ry = np.arcsin(sinp)
    rz = np.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return rx, ry, rz


def euler_to_quat(rx, ry, rz):
    """Euler (roll=rx, pitch=ry, yaw=rz) -> quaternion (w, x, y, z)."""
    cy, sy = np.cos(rz * 0.5), np.sin(rz * 0.5)
    cp, sp = np.cos(ry * 0.5), np.sin(ry * 0.5)
    cr, sr = np.cos(rx * 0.5), np.sin(rx * 0.5)
    qw = cy * cp * cr + sy * sp * sr
    qx = cy * cp * sr - sy * sp * cr
    qy = sy * cp * sr + cy * sp * cr
    qz = sy * cp * cr - cy * sp * sr
    return qw, qx, qy, qz


def quat_to_rotation(q0, q1, q2, q3):
    """Quaternion -> 3x3 rotation matrix (batched over leading dims)."""
    r = np.stack(
        [
            np.stack([q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3,
                      2 * (q1 * q2 - q0 * q3), 2 * (q0 * q2 + q1 * q3)], -1),
            np.stack([2 * (q1 * q2 + q0 * q3),
                      q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3,
                      2 * (q2 * q3 - q0 * q1)], -1),
            np.stack([2 * (q1 * q3 - q0 * q2), 2 * (q0 * q1 + q2 * q3),
                      q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3], -1),
        ],
        axis=-2,
    )
    return r
