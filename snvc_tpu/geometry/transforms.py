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


def similarity_transform(X, Y, compute_optimal_scale: bool = False):
    """Procrustes alignment of Y onto X with optional uniform scaling
    (reference compute_similarity_transform, transformation.py:104-151).

    X, Y: [N, d] point sets (targets, inputs).
    Returns (d, Z, T, b, c): normalized squared error after alignment, the
    transformed Y, the rotation T (applied as ``Y @ T``), the scale b, and
    the translation c, with Z = b * Y @ T + c.
    """
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    muX, muY = X.mean(0), Y.mean(0)
    X0, Y0 = X - muX, Y - muY
    ssX = (X0**2).sum()
    ssY = (Y0**2).sum()
    normX, normY = np.sqrt(ssX), np.sqrt(ssY)
    X0 /= normX
    Y0 /= normY
    A = X0.T @ Y0
    U, s, Vt = np.linalg.svd(A, full_matrices=False)
    V = Vt.T
    # reflection correction on the last singular direction
    detT = np.linalg.det(V @ U.T)
    V[:, -1] *= np.sign(detT)
    s[-1] *= np.sign(detT)
    T = V @ U.T
    traceTA = s.sum()
    if compute_optimal_scale:
        b = traceTA * normX / normY
        d = 1 - traceTA**2
        Z = normX * traceTA * (Y0 @ T) + muX
    else:
        b = 1.0
        d = 1 + ssY / ssX - 2 * traceTA * normY / normX
        Z = normY * (Y0 @ T) + muX
    c = muX - b * (muY @ T)
    return d, Z, T, b, c


def pnp_refine(prediction, observation, intrinsics, dist_coeffs=None):
    """Refine a 3D keypoint prediction against observed 2D keypoints with
    iterative PnP (reference pnp_refine, transformation.py:195-208).

    prediction: [N, 3] model points; observation: [N, 2] image points;
    intrinsics: [3, 3].  Returns the model points expressed in the
    estimated camera pose ([3, N], reference layout), or ``prediction``
    unchanged if PnP fails.
    """
    import cv2

    prediction = np.ascontiguousarray(prediction, dtype=np.float64)
    observation = np.ascontiguousarray(observation, dtype=np.float64)
    if dist_coeffs is None:
        dist_coeffs = np.zeros(4)
    success, rvec, tvec = cv2.solvePnP(
        prediction, observation, np.asarray(intrinsics, dtype=np.float64),
        np.asarray(dist_coeffs, dtype=np.float64),
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    if not success:
        return prediction
    return cv2.Rodrigues(rvec)[0] @ prediction.T + tvec


def rotation_angle_2d(R) -> float:
    """Planar rotation angle from a 2x2 rotation matrix
    (reference: vernier.py:624-627)."""
    return float(np.arctan2(R[1, 0], R[0, 0]))
