#!/usr/bin/env python
"""Measure per-block image-row/column spans of the voxel-grid projections.

Sizes the row-band window of the banded sampling kernel
(ops/grid_sample_pallas.py): for each 1024-point block of the h-major grid
ravel, how many FEATURE rows (of Hf=64) do the valid points' bilinear taps
span?  The banded kernel is exact only when every block fits its 32-row
(two 16-row-aligned windows) band; this probe reports the fit rate over a
sweep of realistic KITTI-like poses so the window choice is measured, not
guessed.  CPU-only (numpy), no JAX.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

from snvc_tpu.config import VernierConfig
from snvc_tpu.geometry import imgproc
from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.ops.assemble import make_grid_local
from snvc_tpu.data.pipeline import roi_box3d

F, CX, CY, BASE = 721.5377, 609.5593, 172.854, 0.5372
P2 = np.array([[F, 0, CX, 0], [0, F, CY, 0], [0, 0, 1, 0]], np.float64)
P3 = P2.copy()
P3[0, 3] = -F * BASE


def project(P, pts):
    uvw = pts @ P[:, :3].T + P[:, 3]
    return uvw[:, :2] / uvw[:, 2:3]


def grid_proj_for(sample, P, trans, grid_local):
    ry = sample[6]
    c, s = np.cos(ry), np.sin(ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    cam = grid_local @ R.T + sample[3:6]
    uv = project(P, cam)
    return uv @ trans[:, :2].T + trans[:, 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship", choices=["small", "flagship"])
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=4, help="feature stride")
    args = ap.parse_args()

    if args.config == "flagship":
        cfg = VernierConfig(grid_resolution=(32, 192, 192))
    else:
        cfg = VernierConfig()
    grid_local = make_grid_local(cfg).astype(np.float64)
    H, W = cfg.resolution
    Hf = H // args.stride

    rng = np.random.default_rng(0)
    spans_y, spans_x, fit32, fit16, nblk = [], [], 0, 0, 0
    for _ in range(args.n):
        z = rng.uniform(7.0, 55.0)
        x = rng.uniform(-0.35, 0.35) * z  # inside the frustum
        y = rng.uniform(1.4, 1.9)
        h, w, l = rng.normal([1.53, 1.63, 3.88], [0.13, 0.10, 0.43])
        ry = rng.uniform(-np.pi, np.pi)
        sample = np.array([h, w, l, x, y, z, ry])
        box = roi_box3d(sample, cfg)
        kpts = gbox.box_parts_cam(box)
        for P in (P2, P3):
            trans = imgproc.roi_crop_transform(
                project(P, kpts), cfg.resolution, cfg.roi_enlarge
            )
            gp = grid_proj_for(sample, P, trans, grid_local)
            py = gp[:, 1] / args.stride - 0.5  # feature-pixel rows
            px = gp[:, 0] / args.stride - 0.5
            nb = len(gp) // args.block
            for b in range(nb):
                sl = slice(b * args.block, (b + 1) * args.block)
                for v, bucket in ((py[sl], spans_y), (px[sl], spans_x)):
                    ok = (v > -1.0) & (v < Hf)
                    if not ok.any():
                        bucket.append(0.0)
                        continue
                    lo = np.clip(np.floor(v[ok]).min(), 0, Hf - 1)
                    hi = np.clip(np.floor(v[ok]).max() + 1, 0, Hf - 1)
                    bucket.append(hi - lo + 1)
                # two 16-aligned windows fit check (rows)
                v = py[sl]
                ok = (v > -1.0) & (v < Hf)
                nblk += 1
                if not ok.any():
                    fit32 += 1
                    fit16 += 1
                    continue
                lo = int(np.clip(np.floor(v[ok]).min(), 0, Hf - 1))
                hi = int(np.clip(np.floor(v[ok]).max() + 1, 0, Hf - 1))
                i0 = min(lo // 16, Hf // 16 - 2)
                fit32 += hi <= 16 * i0 + 31
                j0 = min(lo // 8, Hf // 8 - 2)
                fit16 += hi <= 8 * j0 + 15

    sy, sx = np.array(spans_y), np.array(spans_x)
    for name, s in (("y", sy), ("x", sx)):
        print(
            f"{name}-span rows: p50={np.percentile(s,50):.1f} "
            f"p90={np.percentile(s,90):.1f} p99={np.percentile(s,99):.1f} "
            f"max={s.max():.0f}"
        )
    print(f"blocks fitting 2x16-row band: {fit32}/{nblk} = {fit32/nblk:.4f}")
    print(f"blocks fitting 2x8-row band:  {fit16}/{nblk} = {fit16/nblk:.4f}")


if __name__ == "__main__":
    main()
