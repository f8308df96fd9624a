"""Affine ROI-crop math (host-side, numpy).

The reference crops object ROIs with cv2.warpAffine driven by a 2x3 affine
built from keypoints (snvc/utils/img_proc.py:22-74,456-499).  Here the crop
*math* stays on the host (tiny), but the actual image resampling runs
on-device via snvc_tpu.ops.warp, so the host never touches pixel loops.

Semantics replicated exactly:
  * kpts -> crop box: boundary method with `enlarge` margin, then the crop
    size is grown to the target aspect ratio (img_proc.kpts2cs:456-499),
  * crop box -> affine: uniform scale k = out_w / crop_w about the box
    center mapping to the output center (img_proc.get_affine_transform with
    rot=0, absolute=True); note the scale is set by the *width* only — with
    the aspect-ratio-matched crop this makes the crop fill the output.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def points_to_crop(
    kpts: np.ndarray, enlarge: float = 1.1, aspect_ratio: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """2D keypoints [N, 2] -> (center [2], size [2] = (w, h)) of a crop box.

    Bounding box of the points, enlarged by ``enlarge``, then the smaller
    side is grown so h/w == aspect_ratio (reference kpts2cs 'boundary'
    method + resize_crop, img_proc.py:428-440,483-491).
    """
    kpts = np.asarray(kpts, dtype=np.float64)
    lo = kpts.min(axis=0)
    hi = kpts.max(axis=0)
    center = 0.5 * (lo + hi)
    size = (hi - lo) * enlarge
    w, h = size[0], size[1]
    if h / max(w, 1e-12) > aspect_ratio:
        w = h / aspect_ratio
    else:
        h = w * aspect_ratio
    return center, np.array([w, h])


def crop_affine(center, size, out_hw: Tuple[int, int]) -> np.ndarray:
    """2x3 affine mapping source pixels -> output-crop pixels.

    out_hw: (height, width) of the ROI.  Uniform scale k = out_w / crop_w,
    crop center -> output center (reference get_affine_transform semantics
    with rot=0: the 3-point solve degenerates to scale+translate).
    """
    out_h, out_w = out_hw
    k = out_w / size[0]
    t = np.array(
        [
            [k, 0.0, 0.5 * out_w - k * center[0]],
            [0.0, k, 0.5 * out_h - k * center[1]],
        ]
    )
    return t


def invert_affine(t: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine."""
    A = t[:, :2]
    b = t[:, 2]
    Ai = np.linalg.inv(A)
    return np.concatenate([Ai, (-Ai @ b)[:, None]], axis=1)


def apply_affine(pts, t) -> np.ndarray:
    """Apply 2x3 affine(s) to points.

    pts: [..., N, 2]; t: [..., 2, 3].  Returns [..., N, 2].
    (Reference affine_transform returns [2, N]; we keep points row-major.)
    """
    pts = np.asarray(pts)
    t = np.asarray(t)
    return np.einsum("...ij,...nj->...ni", t[..., :2], pts) + t[..., None, :, 2]


def roi_crop_transform(
    kpts_2d: np.ndarray,
    out_hw: Tuple[int, int],
    enlarge: float = 1.1,
) -> np.ndarray:
    """Keypoints -> 2x3 source->ROI affine, using out_hw's aspect ratio."""
    ar = out_hw[0] / out_hw[1]
    c, s = points_to_crop(kpts_2d, enlarge=enlarge, aspect_ratio=ar)
    return crop_affine(c, s, out_hw)


def gaussian_heatmap_2d(shape_hw, center_xy, sigma: float) -> np.ndarray:
    """Dense 2D gaussian dot; numpy mirror of ops.heatmaps (closed form,
    not the reference's windowed blit — values match inside the window and
    are <exp(-4.5) outside, below the reference's truncation)."""
    h, w = shape_hw
    ys = np.arange(h).reshape(h, 1)
    xs = np.arange(w).reshape(1, w)
    mx, my = center_xy
    dx2 = (xs - mx) ** 2
    dy2 = (ys - my) ** 2
    g = np.exp(-(dx2 + dy2) / (2.0 * sigma**2))
    # reference blits a (2*3s+1)^2 window: truncate outside the square
    # |dx|<=3s, |dy|<=3s (KITTIRefinement_dataset.py:666-702)
    r2 = float((3 * sigma) ** 2)
    g = np.where((dx2 <= r2) & (dy2 <= r2), g, 0.0)
    return g
