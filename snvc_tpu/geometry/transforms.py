"""Rigid / similarity transform estimation (numpy host substrate).

The batched, jit-able device versions live in snvc_tpu.ops.registration;
these numpy mirrors exist for parity tests and the host post-processing
path (reference: snvc/utils/transformation.py:104-193).
"""

from __future__ import annotations

import numpy as np


def rigid_transform(src, dst, weights=None):
    """Least-squares rigid transform (R, t) mapping src -> dst via SVD.

    src, dst: [d, N] point sets; weights: optional [N] importance weights.
    Reflections are corrected by flipping the last singular direction
    (reference: transformation.py:153-188).
    Returns R [d, d] and t [d, 1] with dst ~= R @ src + t.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    assert src.shape == dst.shape
    mu_s = src.mean(axis=1, keepdims=True)
    mu_d = dst.mean(axis=1, keepdims=True)
    xs = src - mu_s
    xd = dst - mu_d
    if weights is None:
        H = xs @ xd.T
    else:
        w = np.asarray(weights, dtype=np.float64).reshape(-1)
        H = (xs * w) @ xd.T
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt = Vt.copy()
        Vt[-1, :] *= -1
        R = Vt.T @ U.T
    t = mu_d - R @ mu_s
    return R, t


def rigid_transform_2d(src, dst, weights=None):
    """Closed-form 2D weighted rigid transform (no SVD).

    For d=2 the optimal rotation angle is atan2 of the weighted
    cross-/dot-covariance; mathematically identical to the SVD route and
    the form used on-device (ops.registration).
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    w = (
        np.ones(src.shape[1])
        if weights is None
        else np.asarray(weights, dtype=np.float64).reshape(-1)
    )
    # NOTE: centroids are unweighted to match the reference exactly
    # (transformation.py:166-175 weights only the covariance).
    mu_s = src.mean(axis=1, keepdims=True)
    mu_d = dst.mean(axis=1, keepdims=True)
    xs = src - mu_s
    xd = dst - mu_d
    # covariance terms
    a = (w * (xs[0] * xd[0] + xs[1] * xd[1])).sum()  # trace term
    b = (w * (xs[0] * xd[1] - xs[1] * xd[0])).sum()  # cross term
    theta = np.arctan2(b, a)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    t = mu_d - R @ mu_s
    return R, t


def procrustes(src, dst, weights=None):
    """Apply the estimated rigid transform to src."""
    R, t = rigid_transform(src, dst, weights)
    return R @ src + t


def rotation_angle_2d(R) -> float:
    """Planar rotation angle from a 2x2 rotation matrix
    (reference: vernier.py:624-627)."""
    return float(np.arctan2(R[1, 0], R[0, 0]))
