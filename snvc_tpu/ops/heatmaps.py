"""On-device training-target generation and heatmap decoding.

The reference draws gaussian part heatmaps on the host with windowed numpy
blits (KITTIRefinement_dataset.py:623-702).  On TPU a closed-form dense
gaussian over the fixed-size grid is a handful of fused VPU ops, so targets
are generated on-device from the part coordinates alone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bev_part_heatmaps(centers_xz, grid_wl, sigma, quantize: bool = True):
    """Gaussian BEV heatmaps for object parts.

    centers_xz: [N, P, 2] part positions in *voxel index* units
      (x index along nw, z index along nl), possibly fractional.
    grid_wl: (nw, nl) heatmap size; output is [N, P, nl, nw]
      (rows = z/length axis, cols = x/width axis, matching the reference's
      field[z, x] layout, KITTIRefinement_dataset.py:675,697).
    sigma: gaussian sigma in voxels.
    quantize: floor the centers first, replicating the reference's integer
      blitting; disable for sub-voxel supervision (an upgrade the reference
      TODO-ed at KITTIRefinement_dataset.py:633).
    """
    nw, nl = grid_wl
    c = jnp.floor(centers_xz) if quantize else centers_xz
    cx = c[..., 0][..., None, None]  # [N, P, 1, 1]
    cz = c[..., 1][..., None, None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (nl, nw), 1)
    zs = jax.lax.broadcasted_iota(jnp.float32, (nl, nw), 0)
    dx2 = (xs - cx) ** 2
    dz2 = (zs - cz) ** 2
    g = jnp.exp(-(dx2 + dz2) / (2.0 * float(sigma) ** 2))
    r2 = float((3 * sigma) ** 2)
    return jnp.where((dx2 <= r2) & (dz2 <= r2), g, 0.0)


def heatmaps_3d(centers_yxz, grid_hwl, sigma, quantize: bool = True):
    """3D gaussian part fields [N, P, nh, nw, nl] (grid_type='3D' variant,
    KITTIRefinement_dataset.py:623-664)."""
    nh, nw, nl = grid_hwl
    c = jnp.floor(centers_yxz) if quantize else centers_yxz
    cy = c[..., 0][..., None, None, None]
    cx = c[..., 1][..., None, None, None]
    cz = c[..., 2][..., None, None, None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (nh, nw, nl), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (nh, nw, nl), 1)
    zs = jax.lax.broadcasted_iota(jnp.float32, (nh, nw, nl), 2)
    dy2 = (ys - cy) ** 2
    dx2 = (xs - cx) ** 2
    dz2 = (zs - cz) ** 2
    g = jnp.exp(-(dy2 + dx2 + dz2) / (2.0 * float(sigma) ** 2))
    r2 = float((3 * sigma) ** 2)
    return jnp.where((dy2 <= r2) & (dx2 <= r2) & (dz2 <= r2), g, 0.0)


def hard_argmax_2d(heatmaps):
    """Flat argmax decode.

    heatmaps: [N, P, Hm, Wm] -> (xy [N, P, 2] float indices (x=col, y=row),
    maxval [N, P]).  Matches the reference's np.argmax + unravel decode
    (vernier.py:683-697, img_proc.get_max_preds).
    """
    N, P, Hm, Wm = heatmaps.shape
    flat = heatmaps.reshape(N, P, -1)
    idx = jnp.argmax(flat, axis=-1)
    maxval = jnp.max(flat, axis=-1)
    y = (idx // Wm).astype(jnp.float32)
    x = (idx % Wm).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), maxval


def soft_argmax_2d(heatmaps, temperature: float = 1.0):
    """Differentiable soft-argmax decode (img_proc.soft_arg_max:656-692
    reimagined: plain masked softmax expectation, jit/grad friendly).

    Returns (xy [N, P, 2], maxval [N, P]).
    """
    N, P, Hm, Wm = heatmaps.shape
    flat = heatmaps.reshape(N, P, -1)
    maxval = jnp.max(flat, axis=-1)
    w = jax.nn.softmax(flat * temperature, axis=-1).reshape(N, P, Hm, Wm)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hm, Wm), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hm, Wm), 0)
    x = jnp.sum(w * xs, axis=(-1, -2))
    y = jnp.sum(w * ys, axis=(-1, -2))
    return jnp.stack([x, y], axis=-1), maxval


def soft_argmax_2d_ref(heatmaps):
    """Reference-exact soft-argmax decode (img_proc.soft_arg_max:656-692):
    weights = exp(relu(h - 0.01)) - 1 normalized to sum 1, expectation of
    the (x, y) index grids.  Cells at/below the 0.01 floor contribute
    exactly zero weight — near a sharp peak this decode converges to the
    hard argmax while recovering sub-voxel offsets.

    Heatmaps entirely at/below the floor have zero total weight; the
    expectation would silently decode to index (0, 0) — the grid corner —
    so those fall back to the hard argmax (which the reference's caller
    reaches via its own score gating, img_proc.get_max_preds).

    Returns (xy [N, P, 2] float indices, maxval [N, P])."""
    N, P, Hm, Wm = heatmaps.shape
    flat = heatmaps.reshape(N, P, -1).astype(jnp.float32)
    maxval = jnp.max(flat, axis=-1)
    w = jnp.exp(jax.nn.relu(flat - 0.01)) - 1.0
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    w = (w / jnp.maximum(wsum, 1e-12)).reshape(N, P, Hm, Wm)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hm, Wm), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hm, Wm), 0)
    x = jnp.sum(w * xs, axis=(-1, -2))
    y = jnp.sum(w * ys, axis=(-1, -2))
    soft = jnp.stack([x, y], axis=-1)
    hard, _ = hard_argmax_2d(heatmaps)
    flat_mask = (wsum[..., 0] <= 0.0)[..., None]
    return jnp.where(flat_mask, hard, soft), maxval
