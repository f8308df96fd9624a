"""Debug rendering of refinement internals.

Equivalent of the reference inference CLI's --debug plots
(tools/inference_agnostic.py:142-275,380-428): the predicted NCF part
heatmaps, the occupancy volume, and the proposal -> refined-box update in
BEV, written as PNGs for one batch.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from snvc_tpu.viz.points import plot_bev_boxes


def _ensure_agg():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def render_ncf(ncf: np.ndarray, path: str, instance: int = 0):
    """ncf [B, P, nl, nw] (or [B, P, nh, nw, nl] for the 3D variant, shown
    as its middle-height slice) -> one grid image of part heatmaps."""
    plt = _ensure_agg()
    hm = np.asarray(ncf[instance])
    if hm.ndim == 4:  # 3D NCF -> middle-height slice, [P, nw, nl] -> BEV
        hm = np.transpose(hm[:, hm.shape[1] // 2], (0, 2, 1))
    P = hm.shape[0]
    cols = min(P, 3)
    rows = -(-P // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for p in range(P):
        axes[p].imshow(hm[p], origin="lower", cmap="viridis")
        axes[p].set_title(f"part {p}", fontsize=8)
        axes[p].axis("off")
    for a in axes[P:]:
        a.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def render_occupancy(occ: np.ndarray, path: str, instance: int = 0,
                     n_slices: int = 4):
    """occupancy [B, nh, nw, nl] -> height slices."""
    plt = _ensure_agg()
    o = np.asarray(occ[instance])
    nh = o.shape[0]
    idx = np.linspace(0, nh - 1, n_slices).astype(int)
    fig, axes = plt.subplots(1, n_slices, figsize=(3 * n_slices, 3))
    for a, i in zip(np.atleast_1d(axes), idx):
        im = a.imshow(o[i].T, origin="lower", cmap="magma", vmin=0, vmax=1)
        a.set_title(f"h slice {i}", fontsize=8)
        a.axis("off")
    fig.colorbar(im, ax=axes, shrink=0.7)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def render_update(samples: np.ndarray, out: Dict, path: str,
                  gt_boxes: Optional[np.ndarray] = None,
                  valid: Optional[np.ndarray] = None):
    """BEV overlay: proposals vs one_part/all_parts refinements (vs GT)."""
    plt = _ensure_agg()
    fig, ax = plt.subplots(figsize=(7, 7))
    m = valid if valid is not None else np.ones(len(samples), bool)
    plot_bev_boxes(ax, np.asarray(samples)[m], color="tab:orange",
                   linestyle="--")
    for key, color in (("one_part", "tab:blue"), ("all_parts", "tab:green")):
        if out.get(key) is not None:
            plot_bev_boxes(ax, np.asarray(out[key])[m], color=color)
    if gt_boxes is not None:
        plot_bev_boxes(ax, np.asarray(gt_boxes)[m], color="k", linestyle=":")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title("proposal (--) / one_part (b) / all_parts (g) / GT (:)")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def render_debug_batch(batch, out: Dict, out_dir: str, tag: str = "batch0"):
    """Write the full debug set for one refinement batch; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    if out.get("ncf") is not None:
        paths["ncf"] = os.path.join(out_dir, f"{tag}_ncf.png")
        render_ncf(np.asarray(out["ncf"]), paths["ncf"])
    if out.get("occupancy") is not None:
        paths["occupancy"] = os.path.join(out_dir, f"{tag}_occupancy.png")
        render_occupancy(np.asarray(out["occupancy"]), paths["occupancy"])
    arrays = batch.arrays() if hasattr(batch, "arrays") else batch
    paths["update"] = os.path.join(out_dir, f"{tag}_update.png")
    render_update(
        np.asarray(arrays["samples"]),
        out,
        paths["update"],
        gt_boxes=np.asarray(arrays["gt_boxes"]) if "gt_boxes" in arrays else None,
        valid=np.asarray(arrays["valid"]).astype(bool),
    )
    return paths
