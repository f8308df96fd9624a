"""Matplotlib 3D point/box plotting utilities.

Fresh implementation of the reference's viz substrate
(snvc/visualization/points.py:45-447): 3D scatter/line/cuboid drawing with
the 8-corner edge list shared by the whole framework, equal-aspect 3D axes,
and BEV rendering.  Mayavi (the reference's lidar viewer) is intentionally
not a dependency; the BEV/3D matplotlib views cover its use cases.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# edges between the 8 box corners (framework part ordering 1..8, 0-based;
# matches the reference's plot_3d_bbox.connections so renders line up)
BOX_EDGES = np.array(
    [
        [0, 1], [0, 2], [1, 3], [2, 3],
        [4, 5], [5, 7], [4, 6], [6, 7],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ]
)

RECT_EDGES = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])


def plot_3d_points(ax, points, color="b", size=5, alpha=1.0):
    points = np.asarray(points)
    if len(points) == 0:
        return
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=color, s=size, alpha=alpha)


def plot_lines(ax, points, edges, dimension=3, c="k", linestyle="-", linewidth=1.5):
    points = np.asarray(points)
    for e in np.asarray(edges).reshape(-1, 2):
        seg = points[list(e)]
        if dimension == 3:
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], c=c, linestyle=linestyle,
                    linewidth=linewidth)
        else:
            ax.plot(seg[:, 0], seg[:, 1], c=c, linestyle=linestyle,
                    linewidth=linewidth)


def plot_3d_bbox(ax, corners_projected, color="r", linestyle="-"):
    """Draw the 12 projected edges of a cuboid; corners_projected [8, 2]."""
    plot_lines(ax, corners_projected, BOX_EDGES, dimension=2, c=color,
               linestyle=linestyle)


def plot_2d_bbox(ax, box, color="r", linestyle="-"):
    x1, y1, x2, y2 = box
    pts = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])
    plot_lines(ax, pts, RECT_EDGES, dimension=2, c=color, linestyle=linestyle)


def set_3d_axe_limits(ax, points, margin=1.1):
    """Equal-aspect 3D limits around a point set
    (reference set_3d_axe_limits)."""
    points = np.asarray(points).reshape(-1, 3)
    center = 0.5 * (points.max(axis=0) + points.min(axis=0))
    radius = 0.5 * margin * (points.max(axis=0) - points.min(axis=0)).max()
    radius = max(radius, 1e-3)
    ax.set_xlim3d([center[0] - radius, center[0] + radius])
    ax.set_ylim3d([center[1] - radius, center[1] + radius])
    ax.set_zlim3d([center[2] - radius, center[2] + radius])


def plot_bev_boxes(ax, boxes3d, color="r", linestyle="-", labels=None):
    """Draw box3d [N, 7] footprints in the BEV (x right, z up)."""
    from snvc_tpu.geometry import boxes as gbox

    boxes3d = np.asarray(boxes3d).reshape(-1, 7)
    for i, b in enumerate(boxes3d):
        # bottom corners are the ODD part indices (the corner order
        # alternates top/bottom, geometry.boxes._PART_Y)
        corners = gbox.box_corners_cam(b)[[1, 3, 7, 5]][:, [0, 2]]
        order = [0, 1, 2, 3, 0]
        ax.plot(corners[order, 0], corners[order, 1], c=color, linestyle=linestyle)
        if labels is not None:
            ax.text(b[3], b[5], str(labels[i]), fontsize=8, color=color)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")


def plot_lidar_bev(ax, pc_rect, boxes3d=None, max_points=20000, span=50.0):
    """BEV LiDAR scatter with optional boxes (matplotlib replacement for the
    reference's mayavi draw_lidar/draw_gt_boxes3d, viz_util.py:156,319)."""
    pc = np.asarray(pc_rect)
    if len(pc) > max_points:
        pc = pc[:: len(pc) // max_points]
    ax.scatter(pc[:, 0], pc[:, 2], s=0.2, c=pc[:, 1], cmap="viridis")
    if boxes3d is not None and len(boxes3d):
        plot_bev_boxes(ax, boxes3d, color="r")
    ax.set_xlim(-span, span)
    ax.set_ylim(0, span * 1.4)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
