"""Frustum-volume -> world-voxel resampling for the global model.

The plane-sweep cost volume lives in camera-frustum coordinates
(depth-plane d, image row v, image col u).  The BEV detection head wants a
regular rect-frame voxel grid.  Each voxel center (x, y, z) projects to
(u, v) = P(x, y, z) and depth-plane coordinate d(z); its feature is the
trilinear sample of the frustum volume — the geometric core the reference's
unreleased StereoNet shares with DSGN-family detectors (SURVEY.md §3.4).

Implemented as an 8-tap gather (the 3D analog of ops.grid_sample); XLA
lowers it to a single fused dynamic-gather per tap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def depth_plane_coords(z, depths):
    """Map metric depth z [..., ] to fractional plane index given the
    (sorted, ascending) depth hypotheses [D]."""
    D = depths.shape[0]
    idx = jnp.searchsorted(depths, z, side="right") - 1
    idx = jnp.clip(idx, 0, D - 2)
    d0 = jnp.take(depths, idx)
    d1 = jnp.take(depths, idx + 1)
    frac = (z - d0) / jnp.maximum(d1 - d0, 1e-6)
    return idx.astype(jnp.float32) + jnp.clip(frac, 0.0, 1.0)


def _gather_dvu(vol_flat, d, v, u, D, H, W):
    valid = (d >= 0) & (d < D) & (v >= 0) & (v < H) & (u >= 0) & (u < W)
    dc = jnp.clip(d, 0, D - 1)
    vc = jnp.clip(v, 0, H - 1)
    uc = jnp.clip(u, 0, W - 1)
    flat = (dc * H + vc) * W + uc
    vals = jnp.take(vol_flat, flat, axis=0)
    return vals * valid[:, None].astype(vol_flat.dtype)


def sample_frustum(volume, d, v, u):
    """Trilinear sample of one frustum volume.

    volume: [D, H, W, C]; d, v, u: [P] fractional coordinates in
    (plane, row/stride, col/stride) units.  Returns [P, C]; out-of-range
    taps contribute 0.
    """
    D, H, W, C = volume.shape
    flat = volume.reshape(D * H * W, C)
    d0 = jnp.floor(d).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u0 = jnp.floor(u).astype(jnp.int32)
    fd = (d - d0).astype(volume.dtype)[:, None]
    fv = (v - v0).astype(volume.dtype)[:, None]
    fu = (u - u0).astype(volume.dtype)[:, None]
    acc = 0.0
    for dd in (0, 1):
        for dv in (0, 1):
            for du in (0, 1):
                w = (
                    (fd if dd else 1 - fd)
                    * (fv if dv else 1 - fv)
                    * (fu if du else 1 - fu)
                )
                acc = acc + w * _gather_dvu(
                    flat, d0 + dd, v0 + dv, u0 + du, D, H, W
                )
    return acc


def frustum_to_voxel(
    volume,
    P_mat,
    depths,
    voxel_centers,
    feature_stride: int = 4,
):
    """Resample a batched frustum volume onto a rect-frame voxel grid.

    volume: [N, D, Hf, Wf, C] (plane-major); P_mat: [N, 3, 4]; depths: [D];
    voxel_centers: [V, 3] rect-frame (x, y, z) — shared across the batch.
    Returns [N, V, C].
    """

    def one(vol, P):
        uvw = voxel_centers @ P[:, :3].T + P[:, 3]
        u = uvw[:, 0] / uvw[:, 2] / feature_stride
        v = uvw[:, 1] / uvw[:, 2] / feature_stride
        d = depth_plane_coords(voxel_centers[:, 2], depths)
        return sample_frustum(vol, d, v, u)

    return jax.vmap(one)(volume, P_mat)
