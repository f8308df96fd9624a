"""Synthetic KITTI-format scene generator.

Writes a minimal but structurally-complete KITTI object tree (stereo
images, calib, labels, velodyne, split files) with randomly-posed car-like
boxes, so the full pipeline — dataset, instance DB, batching, device
assembly, model, update, writer, evaluator — can be exercised end-to-end
without real data.  The reference has no test substrate at all
(SURVEY.md §4); this is ours.

Images contain a simple shaded rendering of each box (brighter quad per
face, consistent between views via projection), so feature sampling sees
view-consistent structure rather than pure noise.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry.calib import Calibration, KittiLabel, format_label, ry_to_alpha

IMG_H, IMG_W = 375, 1242
GROUND_Y = 1.7  # ground-plane height (rect frame); renderer + LiDAR agree
# bump on ANY behavior change to the renderer: reuse stamps embed it, so
# stale trees re-render instead of silently feeding old pixels (the round-3
# texture-memorization postmortem is what this guards)
SYNTH_VERSION = 3


def _calib_text() -> str:
    P2 = "7.070493e+02 0.000000e+00 6.040814e+02 4.575831e+01 0.000000e+00 7.070493e+02 1.805066e+02 -3.454157e-01 0.000000e+00 0.000000e+00 1.000000e+00 4.981016e-03"
    P3 = "7.070493e+02 0.000000e+00 6.040814e+02 -3.372877e+02 0.000000e+00 7.070493e+02 1.805066e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03"
    V2C = "0.0 -1.0 0.0 0.0 0.0 0.0 -1.0 0.0 1.0 0.0 0.0 0.0"
    R0 = "1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0"
    P0 = "7.070493e+02 0.000000e+00 6.040814e+02 0.000000e+00 0.000000e+00 7.070493e+02 1.805066e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00"
    return (
        f"P0: {P0}\nP1: {P0}\nP2: {P2}\nP3: {P3}\n"
        f"R0_rect: {R0}\nTr_velo_to_cam: {V2C}\n"
    )


# per-class dimension priors [h, w, l] low/high (KITTI-plausible medians;
# the evaluator gates pedestrians/cyclists at min IoU 0.5,
# cpp/kitti_eval.cpp:39-44)
_DIM_PRIORS = {
    "Car": ((1.4, 1.5, 3.3), (1.7, 1.8, 4.3)),
    "Pedestrian": ((1.6, 0.5, 0.5), (1.9, 0.7, 0.8)),
    "Cyclist": ((1.6, 0.5, 1.6), (1.9, 0.7, 1.9)),
}


def random_box(rng: np.random.Generator, cls: str = "Car") -> np.ndarray:
    """[h, w, l, x, y, z, ry] bottom-centered, in front of the camera."""
    lo, hi = _DIM_PRIORS[cls]
    z = rng.uniform(12.0, 35.0)
    x = rng.uniform(-0.25, 0.25) * z * 0.5
    return np.array(
        [
            rng.uniform(lo[0], hi[0]),
            rng.uniform(lo[1], hi[1]),
            rng.uniform(lo[2], hi[2]),
            x,
            1.65 + rng.normal() * 0.05,
            z,
            rng.uniform(-np.pi, np.pi),
        ],
        dtype=np.float32,
    )


def random_car_box(rng: np.random.Generator) -> np.ndarray:
    return random_box(rng, "Car")


def _face_texture(tex_id: int, face_idx: int, size: int = 64) -> np.ndarray:
    """Deterministic per-(texture-id, face) speckle texture [size, size].

    Seeded by identity, NOT by view — both cameras warp the SAME canonical
    pattern through their own projections of the face, so the texture is
    geometrically consistent across the stereo pair (the correspondence
    signal plane-sweep matching needs; flat-shaded faces are textureless
    and leave depth underdetermined inside the face).

    tex_id must be UNIQUE per (scene, box) for detection training data —
    reusing textures across frames lets a detector memorize texture->pose
    associations instead of learning stereo geometry (measured: 0.07 m
    center error on seen frames vs 2.7 m on held-out with shared
    textures).  A tracked object keeps one tex_id across its sequence."""
    trng = np.random.default_rng(tex_id * 1000003 + face_idx * 97 + 13)
    t = trng.uniform(0.55, 1.45, size=(size // 4, size // 4))
    t = np.kron(t, np.ones((4, 4)))  # 4-px blocks: survives downscale
    t += trng.uniform(-0.12, 0.12, size=(size, size))
    return t


def render_scene(
    boxes3d: np.ndarray, calib: Calibration, rng, tex_ids=None
) -> np.ndarray:
    """Textured-cuboid rendering over a smooth background.

    Faces are rasterized as true projected convex quads (crisp oriented
    edges at the exact 3D pose — the signal a refinement model must read),
    back-face culled via the outward normal, lambertian-ish shaded, and
    modulated by a per-face canonical texture warped through the quad
    homography — identical in both views, so stereo matching is
    well-posed everywhere on the face, not only at its edges."""
    import cv2

    # sky: smooth gradient (no LiDAR lands there, depth unsupervised)
    yy = np.mgrid[0:IMG_H, 0:IMG_W][0]
    img = (55 + 25 * yy / IMG_H).astype(np.float32)
    img = np.stack([img, img * 1.05, img * 0.95], axis=-1)
    # ground: a TRUE 3D textured plane at y=GROUND_Y warped through each
    # view's plane homography.  A screen-space background pattern would be
    # identical in both views — zero disparity = infinite depth — and
    # contradict the LiDAR ground supervision; the world-anchored texture
    # gives the depth branch a learnable, geometrically consistent signal.
    grng = np.random.default_rng(777)
    GT_RES = 560
    gt_tex = grng.uniform(0.6, 1.4, size=(GT_RES // 4, GT_RES // 4))
    gt_tex = np.kron(gt_tex, np.ones((4, 4)))
    gx0, gx1, gz0, gz1 = -30.0, 30.0, 3.0, 70.0
    plane_xz = np.array(
        [[gx0, gz1], [gx1, gz1], [gx1, gz0], [gx0, gz0]], np.float32
    )
    plane_pts = np.stack(
        [plane_xz[:, 0], np.full(4, GROUND_Y, np.float32), plane_xz[:, 1]],
        axis=1,
    )
    plane_uv = calib.rect_to_image(plane_pts).astype(np.float32)
    tex_quad = np.array(
        [[0, 0], [GT_RES - 1, 0], [GT_RES - 1, GT_RES - 1], [0, GT_RES - 1]],
        np.float32,
    )
    Hg = cv2.getPerspectiveTransform(tex_quad, plane_uv)
    gwarp = cv2.warpPerspective(
        gt_tex.astype(np.float32), Hg, (IMG_W, IMG_H),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    gmask = gwarp > 0.0
    gval = np.clip(70.0 * gwarp[gmask], 0, 255)
    img[gmask] = np.stack([gval, gval * 1.02, gval * 0.98], axis=-1)
    order = np.argsort(-boxes3d[:, 5])  # far to near
    # corner layout (geometry.boxes _PART_* order, corners 1..8): indices
    # alternate top/bottom — cyclic face quads must follow it or the
    # polygons bow-tie (matches viz/tracebox._FACE_QUADS)
    faces = [
        (0, 1, 3, 2),  # +l (front)
        (4, 5, 7, 6),  # -l (back)
        (0, 1, 5, 4),  # +w side
        (2, 3, 7, 6),  # -w side
        (0, 2, 6, 4),  # top
        (1, 3, 7, 5),  # bottom
    ]
    TS = 64
    tex_corners = np.array(
        [[0, 0], [TS - 1, 0], [TS - 1, TS - 1], [0, TS - 1]], np.float32
    )
    if tex_ids is None:
        tex_ids = list(range(len(boxes3d)))
    for bi in order:
        box = boxes3d[bi]
        tid = int(tex_ids[bi])
        corners = gbox.box_corners_cam(box)  # [8, 3]
        uv = calib.rect_to_image(corners)
        base = 90 + 110 * ((tid * 2654435761) % 97) / 97.0
        center = corners.mean(axis=0)
        for fi, f in enumerate(faces):
            p3 = corners[list(f)]
            n = np.cross(p3[1] - p3[0], p3[3] - p3[0])
            fc = p3.mean(axis=0)
            if np.dot(n, fc - center) < 0:
                n = -n
            # back-face cull: the face must look toward the camera
            if np.dot(n, -fc) <= 0:
                continue
            nn = n / (np.linalg.norm(n) + 1e-9)
            # directional light + per-face tint
            lam = 0.55 + 0.45 * max(0.0, float(np.dot(nn, [0.3, -0.8, -0.52])))
            shade = np.clip(base * lam * (0.85 + 0.06 * fi), 0, 255)
            poly = np.round(uv[list(f)]).astype(np.int32)
            # warp the canonical texture through the quad homography: the
            # same world-anchored pattern lands at each view's projection
            H = cv2.getPerspectiveTransform(
                tex_corners, uv[list(f)].astype(np.float32)
            )
            tex = cv2.warpPerspective(
                _face_texture(tid, fi, TS).astype(np.float32), H,
                (IMG_W, IMG_H), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=1.0,
            )
            mask = np.zeros((IMG_H, IMG_W), np.uint8)
            cv2.fillConvexPoly(mask, poly, 1)
            m = mask.astype(bool)
            val = np.clip(shade * tex[m], 0, 255)
            img[m] = np.stack([val, val * 1.04, val * 0.96], axis=-1)
            cv2.polylines(img, [poly], True,
                          (shade * 0.4, shade * 0.4, shade * 0.4), 1)
    img += rng.normal(size=img.shape) * 4.0
    return np.clip(img, 0, 255).astype(np.uint8)


def surface_points(box: np.ndarray, rng, n: int = 400) -> np.ndarray:
    """LiDAR-like points on the camera-facing surfaces of a box (rect frame)."""
    h, w, l = box[0], box[1], box[2]
    u = rng.uniform(-0.5, 0.5, size=(n, 2))
    face = rng.integers(0, 3, size=n)
    pts = np.zeros((n, 3))
    # object frame (x along length, y up-down [-h, 0], z along width)
    pts[:, 0] = np.where(face == 0, -0.5 * l, u[:, 0] * l)
    pts[:, 1] = np.where(face == 2, -h, (u[:, 1] * 0.5 - 0.5) * h)
    pts[:, 2] = np.where(face == 1, -0.5 * w, u[:, 1] * w * 0.5)
    pts[:, 1] = np.where(face != 2, (u[:, 1] - 0.5) * h, -h)
    R = gbox.rot_y(box[6])
    return (R @ pts.T).T + box[3:6]


def make_synthetic_kitti(
    root: str,
    num_frames: int = 2,
    boxes_per_frame: int = 3,
    seed: int = 0,
    split: str = "val",
    reuse: bool = True,
    classes: Tuple[str, ...] = ("Car",),
) -> List[np.ndarray]:
    """Write a synthetic KITTI tree under ``root``; returns per-frame GT
    box arrays.

    With ``reuse`` (default), a complete existing tree rendered with the
    SAME parameters is loaded back instead of re-rendered — big train
    sets (the streaming-regime detection runs use thousands of frames at
    ~1 s/frame render cost) survive across invocations.  A stamp file
    (``<split>.stamp.json``) records (seed, boxes_per_frame, num_frames,
    renderer version); any mismatch — different seed, different box
    count, renderer change — re-renders rather than silently returning
    stale data under the new parameters' name."""
    import cv2

    base = os.path.join(root, "training")
    split_file = os.path.join(root, split + ".txt")
    stamp_file = os.path.join(root, split + ".stamp.json")
    stamp = {
        "seed": int(seed),
        "boxes_per_frame": int(boxes_per_frame),
        "num_frames": int(num_frames),
        "renderer": SYNTH_VERSION,
    }
    if tuple(classes) != ("Car",):
        # only stamped when non-default so existing Car-only trees (and
        # their reuse stamps) stay valid byte-for-byte
        stamp["classes"] = list(classes)
    if reuse and os.path.isfile(split_file) and os.path.isfile(stamp_file):
        import json

        with open(stamp_file) as f:
            have = json.load(f)
        names = [ln.strip() for ln in open(split_file) if ln.strip()]
        last = names[-1] if names else ""
        if have == stamp and len(names) == num_frames and os.path.isfile(
            os.path.join(base, "image_3", last + ".png")
        ):
            out = []
            for name in names:
                # KITTI label columns 8..14 = h w l x y z ry
                rows = np.loadtxt(
                    os.path.join(base, "label_2", name + ".txt"),
                    usecols=range(8, 15), ndmin=2, dtype=np.float32,
                )
                out.append(rows)
            return out

    rng = np.random.default_rng(seed)
    for d in ("image_2", "image_3", "calib", "label_2", "velodyne"):
        os.makedirs(os.path.join(base, d), exist_ok=True)

    cl = Calibration.default()
    cr = Calibration.default_right()
    all_boxes = []
    for fi in range(num_frames):
        name = f"{fi:06d}"
        # round-robin over the class tuple so every frame carries each
        # class when boxes_per_frame >= len(classes)
        box_cls = [classes[i % len(classes)] for i in range(boxes_per_frame)]
        boxes = np.stack([random_box(rng, c) for c in box_cls])
        all_boxes.append(boxes)
        # unique texture ids per (frame, box): detection must read stereo
        # geometry, not memorize recurring patterns
        tex_ids = rng.integers(0, 2**31 - 1, size=len(boxes))
        img_l = render_scene(boxes, cl, rng, tex_ids=tex_ids)
        img_r = render_scene(boxes, cr, rng, tex_ids=tex_ids)
        cv2.imwrite(
            os.path.join(base, "image_2", name + ".png"),
            cv2.cvtColor(img_l, cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(
            os.path.join(base, "image_3", name + ".png"),
            cv2.cvtColor(img_r, cv2.COLOR_RGB2BGR),
        )
        with open(os.path.join(base, "calib", name + ".txt"), "w") as f:
            f.write(_calib_text())
        # labels
        lines = []
        for b, bc in zip(boxes, box_cls):
            uv = cl.rect_to_image(gbox.box_corners_cam(b))
            box2d = np.array(
                [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]
            )
            box2d = np.clip(box2d, 0, [IMG_W - 1, IMG_H - 1, IMG_W - 1, IMG_H - 1])
            lab = KittiLabel(
                type=bc,
                truncation=0.0,
                occlusion=0,
                alpha=ry_to_alpha(b[3], b[5], b[6]),
                box2d=box2d.astype(np.float32),
                box3d=b,
            )
            lines.append(format_label(lab))
        with open(os.path.join(base, "label_2", name + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        # lidar: box surfaces + ground plane, in velodyne frame
        pts_rect = np.concatenate(
            [surface_points(b, rng) for b in boxes]
            + [
                np.stack(
                    [
                        rng.uniform(-20, 20, 2000),
                        np.full(2000, GROUND_Y),
                        rng.uniform(5, 45, 2000),
                    ],
                    axis=1,
                )
            ]
        )
        pts_velo = cl.rect_to_velo(pts_rect)
        pc = np.zeros((len(pts_velo), 4), np.float32)
        pc[:, :3] = pts_velo
        pc[:, 3] = 0.5
        pc.tofile(os.path.join(base, "velodyne", name + ".bin"))

    with open(os.path.join(root, split + ".txt"), "w") as f:
        f.write("\n".join(f"{i:06d}" for i in range(num_frames)) + "\n")
    import json

    with open(stamp_file, "w") as f:
        json.dump(stamp, f)
    return all_boxes


def make_synthetic_sequence(
    root: str,
    num_frames: int = 8,
    seed: int = 0,
    split: str = "val",
    velocity=(0.15, 0.0, -0.45),
    yaw_rate: float = 0.02,
) -> List[np.ndarray]:
    """A MOVING-object sequence: one car translating by ``velocity`` m/frame
    (rect camera frame) with a slow yaw drift, same rendering/labels/LiDAR
    as make_synthetic_kitti.  The tracking-by-detection demo's substrate
    (reference README.md:19-20: search for the next pose from an initial
    cuboid).  Returns the per-frame GT box (one per frame)."""
    import cv2

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "training")
    for d in ("image_2", "image_3", "calib", "label_2", "velodyne"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    cl = Calibration.default()
    cr = Calibration.default_right()
    box = random_car_box(rng)
    box[3:6] = [0.5, 1.65, 18.0]  # start near the image center
    vel = np.asarray(velocity, np.float32)
    all_boxes = []
    for fi in range(num_frames):
        name = f"{fi:06d}"
        boxes = box[None].copy()
        all_boxes.append(boxes.copy())
        # a tracked object keeps ITS texture across the sequence
        img_l = render_scene(boxes, cl, rng, tex_ids=[seed + 17])
        img_r = render_scene(boxes, cr, rng, tex_ids=[seed + 17])
        cv2.imwrite(os.path.join(base, "image_2", name + ".png"),
                    cv2.cvtColor(img_l, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(base, "image_3", name + ".png"),
                    cv2.cvtColor(img_r, cv2.COLOR_RGB2BGR))
        with open(os.path.join(base, "calib", name + ".txt"), "w") as f:
            f.write(_calib_text())
        uv = cl.rect_to_image(gbox.box_corners_cam(box))
        box2d = np.clip(
            np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]),
            0, [IMG_W - 1, IMG_H - 1, IMG_W - 1, IMG_H - 1],
        )
        lab = KittiLabel(
            type="Car", truncation=0.0, occlusion=0,
            alpha=ry_to_alpha(box[3], box[5], box[6]),
            box2d=box2d.astype(np.float32), box3d=box.copy(),
        )
        with open(os.path.join(base, "label_2", name + ".txt"), "w") as f:
            f.write(format_label(lab) + "\n")
        pts_rect = np.concatenate([
            surface_points(box, rng),
            np.stack([rng.uniform(-20, 20, 2000), np.full(2000, GROUND_Y),
                      rng.uniform(5, 45, 2000)], axis=1),
        ])
        pts_velo = cl.rect_to_velo(pts_rect)
        pc = np.zeros((len(pts_velo), 4), np.float32)
        pc[:, :3] = pts_velo
        pc[:, 3] = 0.5
        pc.tofile(os.path.join(base, "velodyne", name + ".bin"))
        box = box.copy()
        box[3:6] += vel
        box[6] += yaw_rate
    with open(os.path.join(root, split + ".txt"), "w") as f:
        f.write("\n".join(f"{i:06d}" for i in range(num_frames)) + "\n")
    return all_boxes


def write_predictions(
    out_dir: str,
    all_boxes: List[np.ndarray],
    noise: float = 0.25,
    seed: int = 1,
) -> None:
    """Noisy copies of the GT as a fake detector's proposal files."""
    rng = np.random.default_rng(seed)
    cl = Calibration.default()
    os.makedirs(out_dir, exist_ok=True)
    for fi, boxes in enumerate(all_boxes):
        lines = []
        for b in boxes:
            p = b.copy()
            p[3] += rng.normal() * noise
            p[5] += rng.normal() * noise
            p[6] += rng.normal() * 0.08
            uv = cl.rect_to_image(gbox.box_corners_cam(p))
            box2d = np.clip(
                np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]),
                0,
                [IMG_W - 1, IMG_H - 1, IMG_W - 1, IMG_H - 1],
            )
            lab = KittiLabel(
                type="Car",
                truncation=0.0,
                occlusion=0,
                alpha=ry_to_alpha(p[3], p[5], p[6]),
                box2d=box2d.astype(np.float32),
                box3d=p,
                score=float(rng.uniform(0.5, 1.0)),
            )
            lines.append(format_label(lab))
        with open(os.path.join(out_dir, f"{fi:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def synthetic_batch_arrays(cfg, seed: int = 0, frames: int = 1):
    """Directly build a geometry-consistent InstanceBatch array dict (no
    files): random boxes in front of the default stereo calib, noisy
    proposals, surface point clouds.  Used by tests, the multi-chip
    dry-run, and the benchmark."""
    from snvc_tpu.data.pipeline import crop_transforms, select_points

    rng = np.random.default_rng(seed)
    I = cfg.max_instances
    img_h, img_w = cfg.image_size
    cl = Calibration.default()
    cr = Calibration.default_right()

    images_left = rng.integers(0, 255, size=(frames, img_h, img_w, 3), dtype=np.uint8)
    images_right = rng.integers(0, 255, size=(frames, img_h, img_w, 3), dtype=np.uint8)
    P_left = np.tile(cl.as_array()[None], (frames, 1, 1)).astype(np.float32)
    P_right = np.tile(cr.as_array()[None], (frames, 1, 1)).astype(np.float32)

    samples = np.zeros((I, 7), np.float32)
    gt_boxes = np.zeros((I, 7), np.float32)
    trans_l = np.tile(np.eye(2, 3, dtype=np.float32), (I, 1, 1))
    trans_r = trans_l.copy()
    Np = 1024
    points = np.zeros((I, Np, 3), np.float32)
    points_valid = np.zeros((I, Np), bool)
    for k in range(I):
        gt = random_car_box(rng)
        prop = gt.copy()
        prop[3] += rng.normal() * 0.2
        prop[5] += rng.normal() * 0.2
        prop[6] += rng.normal() * 0.05
        gt_boxes[k] = gt
        samples[k] = prop
        trans_l[k], trans_r[k] = crop_transforms(prop, cl, cr, cfg)
        pc = surface_points(gt, rng, n=600).astype(np.float32)
        points[k], points_valid[k] = select_points(pc, prop, cfg, Np)

    return dict(
        images_left=images_left,
        images_right=images_right,
        P_left=P_left,
        P_right=P_right,
        image_idx=rng.integers(0, frames, size=I).astype(np.int32),
        trans_l=trans_l,
        trans_r=trans_r,
        samples=samples,
        valid=np.ones(I, bool),
        gt_boxes=gt_boxes,
        points=points,
        points_valid=points_valid,
    )
