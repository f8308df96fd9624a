"""Global-model proposal decoding: corners -> boxes -> rotated NMS -> KITTI.

The reference's detection post-processing lives in its unreleased
StereoNet; the shipped pieces dictate the interfaces: corner-parameterized
regression (loss3d.py:100-102), rotated NMS (iou3d_nms_utils.py:88-103),
and KITTI-format proposal files consumed by the Vernier stage.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snvc_tpu.config import StereoConfig
from snvc_tpu.models.stereonet import bev_locations
from snvc_tpu.ops.nms import rotated_nms_bev, top_k_boxes
from snvc_tpu.ops.rotated_iou import bev_from_box3d


def corners24_to_box3d(corners):
    """[..., 24] corner offsets (already +anchor) -> box3d [..., 7].

    Inverts the compute_corners_sc layout (stereo_losses.gt_corners_24):
    bottom 4 corners then top 4; heading from the corner0->corner3 edge.
    """
    c = corners.reshape(corners.shape[:-1] + (8, 3))
    bottom = c[..., :4, :]
    top = c[..., 4:, :]
    center_xz = jnp.mean(c[..., (0, 2)], axis=-2)
    y_bottom = jnp.mean(bottom[..., 1], axis=-1)
    h = jnp.mean(bottom[..., 1] - top[..., 1], axis=-1)
    # every dimension has four parallel edges — average them all (the
    # yaw as a vector sum, which is wrap-safe) so single-corner noise in
    # a predicted cuboid enters at 1/4 weight instead of full
    e_l = (
        (c[..., 0, :] - c[..., 3, :])
        + (c[..., 1, :] - c[..., 2, :])
        + (c[..., 4, :] - c[..., 7, :])
        + (c[..., 5, :] - c[..., 6, :])
    )
    e_w = (
        (c[..., 0, :] - c[..., 1, :])
        + (c[..., 3, :] - c[..., 2, :])
        + (c[..., 4, :] - c[..., 5, :])
        + (c[..., 7, :] - c[..., 6, :])
    )
    l = jnp.linalg.norm(e_l[..., (0, 2)], axis=-1) / 4.0
    w = jnp.linalg.norm(e_w[..., (0, 2)], axis=-1) / 4.0
    ry = jnp.arctan2(-e_l[..., 2], e_l[..., 0])
    return jnp.stack(
        [h, w, l, center_xz[..., 0], y_bottom, center_xz[..., 1], ry], axis=-1
    )


def decode_proposals(
    outputs: Dict,
    cfg: StereoConfig,
    max_boxes: int = 128,
    score_threshold: float = 0.1,
    nms_iou: float = 0.25,
):
    """Decode one batch of RPN outputs into padded proposal sets.

    Returns (boxes3d [N, max_boxes, 7], scores [N, max_boxes],
    classes [N, max_boxes] slot indices in [0, num_classes), and
    valid [N, max_boxes]).
    """
    A, K = cfg.num_angles, cfg.num_classes
    locations = jnp.asarray(bev_locations(cfg))  # [L, 2]
    L = locations.shape[0]
    # per-class anchor heights when configured (matches assign_targets)
    anchors_y = jnp.broadcast_to(jnp.asarray(cfg.anchors_y), (K,))

    def one(cls, reg, ctr):
        cls = cls.reshape(L, A, K)
        reg = reg.reshape(L, A, K, 24)
        ctr = ctr.reshape(L, A)
        score = jax.nn.sigmoid(cls) * jax.nn.sigmoid(ctr)[..., None]
        score = score.reshape(L * A * K)
        anchor3d = jnp.stack(
            [
                jnp.broadcast_to(locations[:, 0:1], (L, K)),
                jnp.broadcast_to(anchors_y[None, :], (L, K)),
                jnp.broadcast_to(locations[:, 1:2], (L, K)),
            ],
            axis=-1,
        )  # [L, K, 3]
        corners = reg + jnp.tile(anchor3d, (1, 1, 8))[:, None, :, :]
        boxes = corners24_to_box3d(corners).reshape(L * A * K, 7)
        # class slot of every flattened (location, angle, class) triple
        kidx = jnp.tile(jnp.arange(K, dtype=jnp.int32), (L * A,))
        # keep the top pool before NMS to bound the IoU matrix
        pool = min(4 * max_boxes, L * A * K)
        idx = jnp.argsort(-score)[:pool]
        bsel = boxes[idx]
        ssel = score[idx]
        ksel = kidx[idx]
        vsel = ssel > score_threshold
        keep = rotated_nms_bev(bev_from_box3d(bsel), ssel, vsel, nms_iou)
        b, s, v = top_k_boxes(bsel, ssel, keep, max_boxes)
        kk = top_k_boxes(ksel, ssel, keep, max_boxes)[0]
        return b, s, kk, v

    return jax.vmap(one)(outputs["cls"], outputs["reg"], outputs["centerness"])


class DetectRunner:
    """Global-model serving driver: stereo pair -> KITTI proposal files.

    Owns the two chained XLA programs (encoder | head+decode) split along
    the training seam — fusing them inflates TPU compile time from
    minutes to tens of minutes — with params passed as arguments so the
    persistent compile cache works across processes.  ``run(prefetch=K)``
    keeps K frames in flight before the oldest host pull, overlapping
    host batch prep and the per-program dispatch RTT with device compute
    (same pipelining as RefineRunner.run; reference serving loop:
    tools/inference_agnostic.py:366-432).
    """

    def __init__(
        self,
        cfg: StereoConfig,
        variables: Dict,
        max_boxes: int = 8,
        score_threshold: float = 0.02,
        nms_iou: float = 0.25,
        mesh=None,
    ):
        """``mesh``: a jax.sharding.Mesh with a "data" axis for
        data-parallel serving — params replicate, every batch array
        shards on its leading (frame) axis, and XLA partitions both
        programs with no code change (batch_size must divide the axis).
        A "model" axis > 1 additionally shards the plane-sweep volume's
        depth axis (StereoHead.volume_sharding): serving-side tensor
        parallelism for grids too large for one chip."""
        import jax as _jax

        from snvc_tpu.models.stereonet import StereoEncoder, StereoHead
        from snvc_tpu.models.vernier import scope_variables
        from snvc_tpu.training.train_stereo import _volume_sharding, normalize_images

        self.cfg = cfg
        self.mesh = mesh
        encoder = StereoEncoder(cfg)
        head = StereoHead(cfg, volume_sharding=_volume_sharding(mesh))
        self._enc_vars = scope_variables(variables, "encoder")
        self._head_vars = scope_variables(variables, "head")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self._enc_vars = _jax.device_put(self._enc_vars, replicated)
            self._head_vars = _jax.device_put(self._head_vars, replicated)
        else:
            # callers pass host trees (device_get'd params); pin them on
            # device ONCE — numpy args to a jitted fn re-upload per dispatch,
            # i.e. the whole parameter set would cross the link every frame
            self._enc_vars = _jax.device_put(self._enc_vars)
            self._head_vars = _jax.device_put(self._head_vars)

        @_jax.jit
        def run_encoder(vars_, b):
            return encoder.apply(
                vars_,
                normalize_images(b["images_left"]),
                normalize_images(b["images_right"]),
            )

        @_jax.jit
        def run_head(vars_, feats, b):
            lf, rf, rpn_img = feats
            out = head.apply(
                vars_, lf, rf, rpn_img, b["P_left"], b["P_right"]
            )
            return decode_proposals(
                out, cfg, max_boxes=max_boxes,
                score_threshold=score_threshold, nms_iou=nms_iou,
            )

        self._encode, self._head = run_encoder, run_head

    def forward(self, batch_arrays: Dict):
        """Dispatch one batch; returns device (boxes, scores, valid)."""
        if self.mesh is not None:
            batch_arrays = jax.device_put(batch_arrays, self._batch_sharding)
        return self._head(
            self._head_vars,
            self._encode(self._enc_vars, batch_arrays),
            batch_arrays,
        )

    def run(
        self,
        ds,
        out_dir: str,
        batch_size: int = 1,
        prefetch: int = 4,
        max_frames=None,
        log=None,
    ) -> int:
        """Detect every frame of ``ds`` into KITTI files under
        ``out_dir/data``; returns the total proposal count."""
        from collections import deque

        from snvc_tpu.data.stereo_pipeline import StereoPipeline

        pipe = StereoPipeline(ds, self.cfg, batch_size=batch_size,
                              training=False)
        data_dir = os.path.join(out_dir, "data")
        os.makedirs(data_dir, exist_ok=True)
        total = 0
        written = set()

        def finish(names, out):
            nonlocal total
            boxes, scores, classes, valid = jax.tree.map(np.asarray, out)
            for i, name in enumerate(names):
                if name in written:  # padded tail batch repeats a frame
                    continue
                written.add(name)
                scene = ds.scene(int(name))
                lines = proposals_to_kitti(
                    boxes[i], scores[i], valid[i], scene.calibration("left"),
                    classes=classes[i], class_names=self.cfg.class_names,
                )
                total += len(lines)
                with open(os.path.join(data_dir, name + ".txt"), "w") as f:
                    f.write("\n".join(lines) + ("\n" if lines else ""))

        pending = deque()
        for bi, batch in enumerate(pipe.batches()):
            if max_frames is not None and bi * batch_size >= max_frames:
                break
            pending.append(
                (batch.scene_names, self.forward(batch.arrays()))
            )
            while len(pending) > max(prefetch, 0):
                finish(*pending.popleft())
        while pending:
            finish(*pending.popleft())
        if log is not None:
            log(f"decoded {total} proposals over {len(written)} frames")
        return total


def proposals_to_kitti(
    boxes3d: np.ndarray,
    scores: np.ndarray,
    valid: np.ndarray,
    calib,
    image_hw=(375, 1242),
    cls_name: str = "Car",
    classes: np.ndarray = None,
    class_names=None,
):
    """Format decoded proposals as KITTI label lines (with projected 2D
    boxes) for the refinement stage / evaluator.

    With ``classes`` (slot indices from decode_proposals) and
    ``class_names`` (StereoConfig.class_names), each line carries its
    predicted class; otherwise every line is ``cls_name`` (the reference
    writer hard-codes "Car", inference_agnostic.py:354)."""
    from snvc_tpu.geometry import boxes as gbox
    from snvc_tpu.inference.kitti_writer import instance_line

    lines = []
    H, W = image_hw
    for i, (b, s, v) in enumerate(zip(boxes3d, scores, valid)):
        if not v or not np.isfinite(s):
            continue
        uv = calib.rect_to_image(gbox.box_corners_cam(b))
        box2d = np.array(
            [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]
        )
        box2d = np.clip(box2d, 0, [W - 1, H - 1, W - 1, H - 1])
        name = cls_name
        if classes is not None and class_names is not None:
            name = class_names[int(classes[i])]
        lines.append(instance_line(b, box2d, float(s), name))
    return lines
