"""TraceBox: 3D-cuboid overlay renderer with ray-traced hidden lines.

Fresh implementation of the reference CLI visualizer
(tools/visualize.py:248-459): each box is triangulated (12 triangles),
every vertex is tested for occlusion by casting the camera->vertex ray
against all triangles (vectorized Möller–Trumbore instead of the
reference's per-triangle python loop), and edges with an occluded endpoint
are drawn dashed while fully-visible edges are solid.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry.calib import Calibration, KittiLabel, read_label
from snvc_tpu.viz.points import BOX_EDGES

# triangles over the 8 box corners (two per face, 6 faces)
_FACE_QUADS = [
    (0, 1, 3, 2),  # +x (front)
    (4, 5, 7, 6),  # -x (back)
    (0, 1, 5, 4),  # +z
    (2, 3, 7, 6),  # -z
    (0, 2, 6, 4),  # top (-y)
    (1, 3, 7, 5),  # bottom
]
BOX_TRIANGLES = np.array(
    [(a, b, c) for (a, b, c, d) in _FACE_QUADS for _ in (0,)]
    + [(a, c, d) for (a, b, c, d) in _FACE_QUADS]
)


def ray_hits_triangles(origin, targets, tri_a, tri_b, tri_c, eps=1e-9):
    """For each target point, does the segment origin->target hit any
    triangle strictly before the target?

    targets: [N, 3]; tri_*: [T, 3].  Returns [N] bool.
    """
    d = targets - origin  # [N, 3]
    e1 = tri_b - tri_a  # [T, 3]
    e2 = tri_c - tri_a
    p = np.cross(d[:, None, :], e2[None, :, :])  # [N, T, 3]
    det = np.einsum("tk,ntk->nt", e1, p)
    inv = np.where(np.abs(det) > eps, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    s = origin[None, None, :] - tri_a[None, :, :]  # [1, T, 3]
    u = np.einsum("ntk,ntk->nt", s.repeat(len(d), 0), p) * inv
    q = np.cross(s, e1[None, :, :])  # [1, T, 3]
    v = np.einsum("nk,ntk->nt", d, q) * inv
    t = np.einsum("tk,ntk->nt", e2, q.repeat(len(d), 0)) * inv
    hit = (
        (np.abs(det) > eps)
        & (u >= -eps)
        & (v >= -eps)
        & (u + v <= 1 + eps)
        & (t > eps)
        & (t < 1.0 - 1e-4)  # strictly before the vertex itself
    )
    return hit.any(axis=1)


def vertex_visibility(all_corners: np.ndarray) -> np.ndarray:
    """all_corners: [B, 8, 3] camera-frame corners of all boxes.
    Returns [B, 8] bool visibility from the origin (camera center)."""
    B = all_corners.shape[0]
    tri = all_corners[:, BOX_TRIANGLES]  # [B, 24, 3, 3]
    tri = tri.reshape(-1, 3, 3)
    origin = np.zeros(3)
    targets = all_corners.reshape(-1, 3)
    hidden = ray_hits_triangles(
        origin, targets, tri[:, 0], tri[:, 1], tri[:, 2]
    )
    return ~hidden.reshape(B, 8)


class TraceBoxRenderer:
    """Render KITTI boxes over an image with hidden-line dashing."""

    def __init__(self, calib: Optional[Calibration] = None):
        self.calib = calib or Calibration.default()

    def render(
        self,
        ax,
        boxes3d: np.ndarray,
        colors: Optional[Sequence] = None,
        image: Optional[np.ndarray] = None,
    ):
        boxes3d = np.asarray(boxes3d).reshape(-1, 7)
        if image is not None:
            ax.imshow(image)
        if len(boxes3d) == 0:
            return
        corners = gbox.box_corners_cam(boxes3d)  # [B, 8, 3]
        visible = vertex_visibility(corners)
        for bi, b in enumerate(boxes3d):
            c = (
                colors[bi]
                if colors is not None
                else plt_color(bi)
            )
            uv = self.calib.rect_to_image(corners[bi])
            for e0, e1 in BOX_EDGES:
                style = "-" if (visible[bi, e0] and visible[bi, e1]) else "--"
                ax.plot(uv[[e0, e1], 0], uv[[e0, e1], 1], c=c, linestyle=style,
                        linewidth=1.2)
        if image is not None:
            ax.set_xlim(0, image.shape[1])
            ax.set_ylim(image.shape[0], 0)
        ax.axis("off")


def plt_color(i: int):
    palette = ["tab:red", "tab:blue", "tab:green", "tab:orange", "tab:purple",
               "tab:cyan", "tab:olive", "tab:pink"]
    return palette[i % len(palette)]


def render_frame(
    image: np.ndarray,
    labels: Sequence[KittiLabel],
    calib: Calibration,
    save_path: Optional[str] = None,
):
    """Reference `show` (tools/visualize.py:374-421): draw every labeled box
    over the frame."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    boxes = np.stack([l.box3d for l in labels]) if labels else np.zeros((0, 7))
    TraceBoxRenderer(calib).render(ax, boxes, image=image)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=110)
        plt.close(fig)
    return fig


def save_image_grid(images: Sequence[np.ndarray], save_path: str, cols: int = 2):
    """Batch grid writer (reference save_batch_image, visualize.py:437-459)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(6 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        if i < n:
            ax.imshow(images[i])
        ax.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=100)
    plt.close(fig)


def visualize_predictions(
    pred_dir: str,
    data_root: str,
    out_dir: str,
    split: str = "val",
    max_frames: Optional[int] = None,
):
    """Reference tools/visualize.py main flow: render every prediction file
    over its frame."""
    from snvc_tpu.data.kitti import KittiDataset

    ds = KittiDataset(data_root, split)
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for fn in sorted(os.listdir(pred_dir)):
        if not fn.endswith(".txt"):
            continue
        if max_frames is not None and count >= max_frames:
            break
        idx = int(fn.split(".")[0])
        scene = ds.scene(idx)
        labels = read_label(os.path.join(pred_dir, fn))
        img = scene.load_image("left")
        calib = scene.calibration("left")
        render_frame(img, labels, calib, os.path.join(out_dir, f"{idx:06d}.png"))
        count += 1
    return count
