"""Global main-scale stereo detector ("StereoNet").

The reference never released its StereoNet class (commented import,
snvc/models/__init__.py:1-2); this is a fresh TPU-native design assembled
from the building blocks the reference ships (SURVEY.md §3.4):

  stereo pair -> StereoFeatureNet (submodule.feature_extraction analog)
              -> plane-sweep cost volume over depth hypotheses (N1 kernel)
              -> 3D hourglass stack
              -> (a) soft-argmax depth regression (submodule.py:76-83)
              -> (b) frustum->voxel resampling + BEV anchor-free RPN head
                     trained with the shipped RPN3DLoss semantics
                     (loss3d.py:78-370)
              -> rotated NMS -> KITTI-format proposals for the Vernier
                 stage.

Layouts: images NHWC, cost volume [N, D, H/4, W/4, 2C] (plane-major),
voxels [N, Z, X, Y*C] collapsed to BEV channels-last for the 2D head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from snvc_tpu.config import StereoConfig
from snvc_tpu.models.layers import Conv3d, ConvNorm, ConvNorm3d, Hourglass
from snvc_tpu.models.stereo_backbone import StereoFeatureNet
from snvc_tpu.ops.cost_volume import build_cost_volume
from snvc_tpu.ops.frustum import frustum_to_voxel
from snvc_tpu.ops.frustum_pallas import (
    frustum_pallas_available,
    frustum_to_voxel_pallas_diff,
)

Dtype = Any


def depth_hypotheses(cfg: StereoConfig) -> np.ndarray:
    """Uniform depth planes in [min_depth, max_depth]."""
    return np.linspace(cfg.min_depth, cfg.max_depth, cfg.num_depths).astype(
        np.float32
    )


def voxel_grid_centers(cfg: StereoConfig) -> np.ndarray:
    """Rect-frame voxel centers [Z*X*Y, 3], BEV-major (z, x, y) ravel."""
    nz, nx = cfg.bev_size
    ny = cfg.ny
    zs = cfg.z_min + (np.arange(nz) + 0.5) * cfg.voxel_z
    xs = cfg.x_min + (np.arange(nx) + 0.5) * cfg.voxel_x
    ys = cfg.y_min + (np.arange(ny) + 0.5) * cfg.voxel_y
    gz, gx, gy = np.meshgrid(zs, xs, ys, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


def bev_locations(cfg: StereoConfig) -> np.ndarray:
    """BEV anchor locations [Z*X, 2] (x, z), matching the reference's
    compute_locations_bev (torch_utils.py:77-98)."""
    nz, nx = cfg.bev_size
    zs = cfg.z_min + (np.arange(nz) + 0.5) * cfg.voxel_z
    xs = cfg.x_min + (np.arange(nx) + 0.5) * cfg.voxel_x
    gz, gx = np.meshgrid(zs, xs, indexing="ij")
    return np.stack([gx, gz], axis=-1).reshape(-1, 2).astype(np.float32)


class StereoEncoder(nn.Module):
    """Shared 2D feature extraction over both views.

    Kept as its own child module (mirroring VernierEncoder) so training
    and inference can compile it as a separate XLA program: fusing the 2D
    extractor with the 3D conv stack in one program inflates TPU compile
    time by an order of magnitude (BENCH.md optimization log #1)."""

    cfg: StereoConfig

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        cfg = self.cfg
        dt = self.dtype
        net = StereoFeatureNet(
            backbone=cfg.backbone,
            gn=cfg.gn,
            branch=cfg.branch,
            plane_sweep=cfg.plane_sweep_volume,
            rpn_feature=cfg.rpn3d_enable and cfg.cat_img_feature,
            rpn_convdim=cfg.rpn_convdim,
            dtype=dt,
        )
        lf, rpn_img = net(left.astype(dt), train)
        rf, _ = net(right.astype(dt), train)
        return lf, rf, rpn_img


class StereoHead(nn.Module):
    """Cost volume -> 3D stack -> depth regression + BEV RPN head.

    ``volume_sharding`` (a jax.sharding.NamedSharding, typically
    P("data", "model")) enables tensor parallelism over the plane-sweep
    DEPTH axis — the global model's memory/FLOP-dominant structure and
    the survey's long-context analog (SURVEY.md §5): each model shard
    holds a contiguous slab of depth planes, the 3D convs partition with
    k=3 halo exchange along D, the depth softmax psums across shards,
    and GSPMD inserts one gather of the compact post-stack volume for
    the frustum resample.  The Pallas frustum path is skipped under
    depth sharding (a pallas_call cannot be partitioned by GSPMD); the
    XLA resample partitions instead."""

    cfg: StereoConfig
    volume_sharding: Any = None

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, lf, rf, rpn_img, P_left, P_right, train: bool = False):
        cfg = self.cfg
        dt = self.dtype
        # fail fast on geometry the two-level hourglasses cannot round-trip
        # (stride-2 down twice + deconv up twice needs divisibility by 4)
        nz_, nx_ = cfg.bev_size
        for name, v in (
            ("num_depths", cfg.num_depths),
            ("feature height (input_size[0]/4)", lf.shape[1]),
            ("feature width (input_size[1]/4)", lf.shape[2]),
            ("BEV nz ((z_max-z_min)/voxel_z)", nz_),
            ("BEV nx ((x_max-x_min)/voxel_x)", nx_),
        ):
            if v % 4 != 0:
                raise ValueError(
                    f"StereoConfig: {name} = {v} must be divisible by 4 "
                    "(two-level hourglass down/up round-trip)"
                )
        depths = jnp.asarray(depth_hypotheses(cfg))
        # disparity (in feature pixels) per depth plane: disp = f*B / z / 4
        # with B = b_x(right) - b_x(left) > 0 and b_x = P[0,3] / (-f)
        fu = P_left[:, 0, 0]
        baseline = P_right[:, 0, 3] / (-P_right[:, 0, 0]) - P_left[:, 0, 3] / (
            -P_left[:, 0, 0]
        )
        # shifts vary per batch element via calib; the kernel takes the
        # whole [N, D] table (vmapping pallas_call is Mosaic-hostile)
        shifts = (fu[:, None] * baseline[:, None] / depths[None, :]) / 4.0
        vol = build_cost_volume(lf, rf, shifts.astype(jnp.float32), 1)
        # [N, D, Hf, Wf, 2C]
        if self.volume_sharding is not None:
            vol = jax.lax.with_sharding_constraint(vol, self.volume_sharding)

        g = 32
        base = nn.relu(ConvNorm3d(32, 3, gn=cfg.gn, groups=g, dtype=dt)(vol, train))
        base = nn.relu(ConvNorm3d(32, 3, gn=cfg.gn, groups=g, dtype=dt)(base, train))

        # --- stacked hourglasses with intermediate cost outputs ----------
        # Stage i threads the FIRST stage's pre/post skip state (the
        # reference hourglass interface, submodule.py:149-168), adds its
        # output back to the pre-stack volume, and refines the previous
        # stage's cost cumulatively.  Each stage's softmax-expectation
        # depth (submodule.disparityregression, :76-83) is supervised with
        # the reference's 0.5/0.7/1.0 staging (loss3d.py:432-438).
        # num_hourglasses=1 is graph- and parameter-identical to the
        # original single-hourglass head.
        vol_i, pre1, post1 = base, None, None
        cost, costs = None, []
        for i in range(max(1, cfg.num_hourglasses)):
            hg_out, pre_i, post_i = Hourglass(32, ndim=3, gn=cfg.gn, dtype=dt)(
                vol_i, pre1 if i > 0 else None, post1 if i > 0 else None, train
            )
            if i == 0:
                pre1, post1 = pre_i, post_i
            vol_i = base + hg_out
            # depth regression branch (submodule.disparityregression)
            c = Conv3d(1, (3, 3, 3), dtype=dt)(vol_i)[..., 0].astype(jnp.float32)
            cost = c if cost is None else cost + c  # [N, D, Hf, Wf]
            costs.append(cost)
        vol = vol_i

        depth_offset = None
        if cfg.depth_offset:
            # per-depth-plane learned refinement of the hypothesis grid
            # (the reference W_loss `off` branch, loss3d.py:399-412):
            # depth_d = level_d + off_d, supervised through the W1 loss
            depth_offset = Conv3d(1, (3, 3, 3), dtype=dt)(vol)[..., 0].astype(
                jnp.float32
            )

        def expectation(c, off=None):
            p = jax.nn.softmax(c, axis=1)
            lvl = depths[None, :, None, None]
            if off is not None:
                lvl = lvl + off
            return p, jnp.sum(p * lvl, axis=1)

        # the offset refines only the final stage's decode (the reference
        # applies `off` to the single final prob, loss3d.py:406-411)
        prob, depth = expectation(cost, depth_offset)
        out: Dict[str, jnp.ndarray] = {
            "depth": depth,
            "depth_prob": prob,
            "depth_levels": depths,
        }
        if depth_offset is not None:
            out["depth_offset"] = depth_offset
        if len(costs) > 1:
            # intermediate stages (training supervision only; the final
            # stage's depth is out["depth"] above)
            out["depth_preds"] = tuple(
                expectation(c)[1] for c in costs[:-1]
            ) + (depth,)
        else:
            out["depth_preds"] = (depth,)

        if cfg.rpn3d_enable:
            nz, nx = cfg.bev_size
            ny = cfg.ny
            if self.volume_sharding is None and frustum_pallas_available(
                vol.shape[2], vol.shape[3], vol.shape[4]
            ):
                zs = cfg.z_min + (np.arange(nz) + 0.5) * cfg.voxel_z
                xs = cfg.x_min + (np.arange(nx) + 0.5) * cfg.voxel_x
                ys = cfg.y_min + (np.arange(ny) + 0.5) * cfg.voxel_y
                voxels = frustum_to_voxel_pallas_diff(
                    vol, P_left, np.asarray(depth_hypotheses(cfg)),
                    zs, xs, ys, feature_stride=4,
                )  # [N, nz, nx, ny, C]
                C = voxels.shape[-1]
            else:
                centers = jnp.asarray(voxel_grid_centers(cfg))
                feat = frustum_to_voxel(
                    vol, P_left, depths, centers, feature_stride=4
                )  # [N, V, C]
                C = feat.shape[-1]
                voxels = feat.reshape(-1, nz, nx, ny, C)
            bev = voxels.reshape(-1, nz, nx, ny * C).astype(dt)
            bev = nn.relu(ConvNorm(64, 3, gn=cfg.gn, groups=g, dtype=dt)(bev, train))
            if cfg.cat_img_feature and rpn_img is not None:
                img_bev = frustum_img_to_bev(rpn_img, P_left, cfg)
                bev = jnp.concatenate([bev, img_bev.astype(dt)], axis=-1)
                bev = nn.relu(ConvNorm(64, 3, gn=cfg.gn, groups=g, dtype=dt)(bev, train))
            hg2, _, _ = Hourglass(64, ndim=2, gn=cfg.gn, dtype=dt)(bev, None, None, train)
            bev = bev + hg2
            A, K = cfg.num_angles, cfg.num_classes
            cls = nn.Conv(A * K, (3, 3), padding="SAME", dtype=dt)(bev)
            reg = nn.Conv(A * K * 24, (3, 3), padding="SAME", dtype=dt)(bev)
            ctr = nn.Conv(A, (3, 3), padding="SAME", dtype=dt)(bev)
            out["cls"] = cls.astype(jnp.float32)
            out["reg"] = reg.astype(jnp.float32)
            out["centerness"] = ctr.astype(jnp.float32)
        return out


class StereoNet(nn.Module):
    """Full global model: encoder + head (SURVEY.md §3.4; the reference
    class is unreleased — commented import, snvc/models/__init__.py:1-2).

    For split-program compilation, apply the children separately through
    their scoped variables (snvc_tpu.models.vernier.scope_variables)::

        feats = StereoEncoder(cfg).apply(scope_variables(v, "encoder"), l, r)
        out = StereoHead(cfg).apply(scope_variables(v, "head"), *feats, Pl, Pr)
    """

    cfg: StereoConfig
    volume_sharding: Any = None

    def setup(self):
        self.encoder = StereoEncoder(self.cfg)
        self.head = StereoHead(self.cfg, volume_sharding=self.volume_sharding)

    def __call__(self, left, right, P_left, P_right, train: bool = False):
        """left/right: [N, H, W, 3] normalized images; P_*: [N, 3, 4].

        Returns dict with:
          depth      [N, H/4, W/4]   regressed depth map
          depth_prob [N, D, H/4, W/4] softmax depth distribution
          cls        [N, Z, X, A*K]  BEV classification logits
          reg        [N, Z, X, A*K*24] corner regression
          centerness [N, Z, X, A]
        """
        lf, rf, rpn_img = self.encoder(left, right, train)
        return self.head(lf, rf, rpn_img, P_left, P_right, train)


def frustum_img_to_bev(img_feat, P_mat, cfg: StereoConfig):
    """Project the RPN image feature into the BEV by sampling it at each
    BEV cell's anchor-height 3D point (cheap analog of the reference's
    cat_img_feature path).

    The BEV grid at fixed anchor height is separable in image coordinates
    for rectified projections (P[2, :2] = 0): the image row v depends only
    on the BEV z-row and the column u on (z-row, x), so the bilinear
    resample with zeros padding is two hat-weight einsums on the MXU
    instead of a per-cell XLA gather (pathological on TPU)."""
    from snvc_tpu.ops.frustum_pallas import _hat

    nz, nx = cfg.bev_size
    y = float(cfg.anchors_y[0])
    zs = jnp.asarray(
        cfg.z_min + (np.arange(nz, dtype=np.float32) + 0.5) * cfg.voxel_z
    )
    xs = jnp.asarray(
        cfg.x_min + (np.arange(nx, dtype=np.float32) + 0.5) * cfg.voxel_x
    )

    def one(f, P):
        Hf, Wf = f.shape[0], f.shape[1]
        w = zs + P[2, 3]
        u = (P[0, 0] * xs[None, :] + P[0, 2] * zs[:, None] + P[0, 3]) / w[
            :, None
        ] / 4.0
        v = (P[1, 1] * y + P[1, 2] * zs + P[1, 3]) / w / 4.0
        hu = _hat(u, Wf)  # [nz, nx, Wf]
        hv = _hat(v, Hf)  # [nz, Hf]
        t = jnp.einsum("zh,hwc->zwc", hv, f.astype(jnp.float32))
        return jnp.einsum("zxw,zwc->zxc", hu, t).astype(f.dtype)

    return jax.vmap(one)(img_feat, P_mat)  # [N, nz, nx, C]
