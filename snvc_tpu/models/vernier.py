"""Vernier-scale instance refinement network (Flax linen).

TPU-native re-design of the reference's VernierScale
(snvc/models/vernier.py:26-555): samples 2D CNN features of the left/right
ROIs at the projections of a high-resolution object-centric 3D grid,
aggregates them into a voxel volume, and predicts
  * per-voxel foreground occupancy,
  * BEV part-confidence heatmaps (the "neural confidence field", NCF) for
    num_parts object parts (center + 8 corners),
  * optionally regressed part coordinates and a bbox refinement.

Layout: voxel volumes are [N, nh, nw, nl, C] (NDHWC); heatmaps come out as
[N, P, nl, nw] matching the reference target layout.  All four head
variants ('3D' | 'BEV' | 'BEV_type2' | 'BEV_type3', vernier.py:116-314)
are implemented; BEV_type3 is the released/flagship path.

The pose update itself (NCF -> refined box) lives in
snvc_tpu.ops.registration and is fully batched/jit-able.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from snvc_tpu.config import VernierConfig
from snvc_tpu.models.fc_model import FCModel
from snvc_tpu.models.hrnet import BasicBlock, HRNet
from snvc_tpu.models.layers import (
    Conv3d,
    ConvNorm,
    ConvNorm3d,
    Hourglass,
    HourglassDeep,
    avg_pool_height,
)
from snvc_tpu.ops.grid_sample import sample_stereo_voxel

Dtype = Any


class CoordHead(nn.Module):
    """Heatmaps (+ coord-conv maps) -> normalized part coordinates
    (reference _init_coord_head, vernier.py:68-93).

    Strided residual blocks shrink the BEV map; a final valid conv over the
    remaining extent maps to num_parts * 2 sigmoid outputs.  (The reference
    hard-codes a (6, 4) kernel sized for its release config; computing the
    kernel from the actual extent keeps the head config-safe.)
    """

    num_parts: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.num_parts * 2
        x = BasicBlock(ch, stride=2, dtype=self.dtype)(x, train)
        # downsample until the nl (length) axis reaches 6 — the extent the
        # reference's block-count formula num_ds = 4 - log2(192/nl)
        # (vernier.py:83) leaves before its hard-coded (6, 4) valid conv:
        # at the release grid (nl=192, nw=128) this is 5 strided blocks and
        # the kernel below computes to exactly (6, 4)
        while x.shape[1] > 6:
            x = BasicBlock(ch, stride=2, dtype=self.dtype)(x, train)
        x = nn.Conv(
            ch,
            (x.shape[1], x.shape[2]),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        x = nn.sigmoid(x)
        return x.reshape(x.shape[0], self.num_parts, 2)


def _coord_maps(n, nl, nw, dtype):
    """Coordinate-convolution maps [N, nl, nw, 2] with x in [0,1] along the
    width axis and z in [0,1] along the length axis
    (reference _init_grid, vernier.py:99-114)."""
    xm = jnp.linspace(0.0, 1.0, nw, dtype=dtype)[None, :].repeat(nl, axis=0)
    zm = jnp.linspace(0.0, 1.0, nl, dtype=dtype)[:, None].repeat(nw, axis=1)
    m = jnp.stack([xm, zm], axis=-1)
    return jnp.broadcast_to(m[None], (n, nl, nw, 2))


class VernierEncoder(nn.Module):
    """ROIs -> object-centric voxel: shared HRNet on both views + stereo
    grid sampling (vernier.py:471-477).  Kept as its own module so
    inference can jit it separately from the 3D head — fusing the 2D
    extractor with the 3D conv stack in one XLA program inflates TPU
    compile time by an order of magnitude."""

    cfg: VernierConfig

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, left_roi, right_roi, grid_proj_left, grid_proj_right,
                 train: bool = False):
        cfg = self.cfg
        dt = self.dtype
        feat_net = HRNet(cfg.backbone, head_type="default", dtype=dt)
        # one stacked pass over both views: same shared weights as the
        # reference's two calls (vernier.py:471-472) but twice the batch
        # for the MXU (and a single dispatch)
        n = left_roi.shape[0]
        both = jnp.concatenate(
            [left_roi.astype(dt), right_roi.astype(dt)], axis=0
        )
        feats = feat_net(both, train)
        left_feat, right_feat = feats[:n], feats[n:]
        from snvc_tpu.ops.grid_sample_pallas import (
            pallas_sampling_available,
            sample_stereo_voxel_pallas,
        )

        if pallas_sampling_available(left_feat.shape, cfg.resolution):
            voxel = sample_stereo_voxel_pallas(
                left_feat, right_feat, grid_proj_left, grid_proj_right,
                cfg.resolution, cfg.grid_resolution,
            )
        else:
            voxel = sample_stereo_voxel(
                left_feat,
                right_feat,
                grid_proj_left,
                grid_proj_right,
                cfg.resolution,
                cfg.grid_resolution,
            )
        if cfg.feature_aggregation == "concat-atten":
            # cosine-similarity gating of the concatenated halves
            # (reference vernier.py:341-344) — applied on the voxel so both
            # sampling backends share it
            C = voxel.shape[-1] // 2
            sl, sr = voxel[..., :C], voxel[..., C:]
            num = jnp.sum(sl * sr, axis=-1, keepdims=True)
            den = jnp.linalg.norm(sl, axis=-1, keepdims=True) * jnp.linalg.norm(
                sr, axis=-1, keepdims=True
            )
            voxel = voxel * jnp.clip(num / jnp.maximum(den, 1e-8), 0.0, None)
        elif cfg.feature_aggregation != "concat":
            raise NotImplementedError(cfg.feature_aggregation)
        return voxel


class VernierHead(nn.Module):
    """Voxel -> NCF / occupancy / coordinates (vernier.py:362-458)."""

    cfg: VernierConfig

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, voxel, train: bool = False):
        out = self._predict(voxel, train)
        # emit fp32 outputs regardless of compute dtype
        return {
            k: (v.astype(jnp.float32) if v is not None else None)
            for k, v in out.items()
        }

    # ------------------------------------------------------------------
    def _predict(self, voxel, train):
        vt = self.cfg.vernier_type
        if vt == "3D":
            return self._head_3d(voxel, train)
        if vt == "BEV":
            return self._head_bev(voxel, train)
        if vt in ("BEV_type2", "BEV_type3"):
            return self._head_bev_type23(voxel, train, with_coords=vt == "BEV_type3")
        raise NotImplementedError(vt)

    def _hg3d(self, dim, x, train):
        """Hourglass choice by grid width (reference vernier.py:265-268);
        optionally rematerialized to trade FLOPs for HBM."""
        # nn.remat static_argnums count the bound module at index 0, so
        # `train` sits at 4 for Hourglass(x, presqu, postsqu, train) and at
        # 2 for HourglassDeep(x, train) — it must be static because the
        # BatchNorm branch (gn=False) does Python control flow on it
        if self.cfg.n_sample_w <= 16:
            cls = (
                nn.remat(Hourglass, static_argnums=(4,))
                if self.cfg.remat
                else Hourglass
            )
            return cls(dim, ndim=3, gn=self.cfg.gn, dtype=self.dtype)(
                x, None, None, train
            )[0]
        cls = (
            nn.remat(HourglassDeep, static_argnums=(2,))
            if self.cfg.remat
            else HourglassDeep
        )
        return cls(dim, ndim=3, gn=self.cfg.gn, dtype=self.dtype)(x, train)

    def _hg2d(self, dim, x, train):
        if self.cfg.n_sample_w <= 16:
            mod = Hourglass(dim, ndim=2, gn=self.cfg.gn, dtype=self.dtype)
            return mod(x, None, None, train)[0]
        return HourglassDeep(dim, ndim=2, gn=self.cfg.gn, dtype=self.dtype)(x, train)

    # --- '3D': full 3D NCF (vernier.py:128-142, 366-371) ---------------
    def _head_3d(self, voxel, train):
        cfg = self.cfg
        dim = voxel.shape[-1]  # 2C
        g = cfg.gn_groups
        x = nn.relu(ConvNorm3d(dim, 3, gn=cfg.gn, groups=g, dtype=self.dtype)(voxel, train))
        x = nn.relu(ConvNorm3d(dim, 3, gn=cfg.gn, groups=g, dtype=self.dtype)(x, train))
        h, _, _ = Hourglass(dim, ndim=3, gn=cfg.gn, dtype=self.dtype)(x, None, None, train)
        x = x + h
        # per-part 3D confidence fields, matching the grid_type='3D'
        # targets (heatmaps_3d).  The reference hard-codes 1 output channel
        # ("only predicts the confidence of the 3D center", vernier.py:122)
        # while its dataset draws num_parts fields — consistent only at
        # num_parts=1; using cfg.num_parts keeps both in lockstep.
        ncf = Conv3d(cfg.num_parts, (1, 1, 1), dtype=self.dtype)(x)
        # [N, nh, nw, nl, P] -> [N, P, nh, nw, nl]
        ncf = jnp.moveaxis(ncf, -1, 1)
        return dict(ncf=ncf, occupancy=None, offset=None, coordinates=None, bbox=None)

    # --- 'BEV': early pooling variant (vernier.py:143-190, 372-389) ----
    def _head_bev(self, voxel, train):
        cfg = self.cfg
        dim = voxel.shape[-1]
        g = cfg.gn_groups
        x = nn.relu(
            ConvNorm3d(dim, 3, (2, 1, 1), gn=cfg.gn, groups=g, dtype=self.dtype)(voxel, train)
        )
        x = nn.relu(
            ConvNorm3d(dim, 3, (2, 1, 1), gn=cfg.gn, groups=g, dtype=self.dtype)(x, train)
        )
        x = avg_pool_height(x, 2)
        N, H, W, L, C = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(N, W, L, H * C)
        bev = nn.relu(ConvNorm(dim * 2, 3, gn=cfg.gn, groups=g, dtype=self.dtype)(bev, train))
        h, _, _ = Hourglass(dim * 2, ndim=2, gn=cfg.gn, dtype=self.dtype)(bev, None, None, train)
        bev = bev + h
        occ = nn.relu(ConvNorm(dim * 2, 3, gn=cfg.gn, groups=g, dtype=self.dtype)(bev, train))
        occ = nn.sigmoid(
            nn.Conv(cfg.grid_resolution[0], (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(occ)
        )
        # [N, W, L, nh] -> [N, nh, W, L]
        occupancy = jnp.moveaxis(occ, -1, 1)
        hm = nn.relu(ConvNorm(dim * 4, 3, 2, gn=cfg.gn, groups=g, dtype=self.dtype)(bev, train))
        hm = HRNet(cfg.backbone, head_type="heatmap_regression",
                   num_heatmaps=cfg.num_parts, dtype=self.dtype)(hm, train)
        # [N, W', L', P] -> [N, P, L', W'] (reference permute(0,1,3,2))
        ncf = hm.transpose(0, 3, 2, 1)
        return dict(ncf=ncf, occupancy=occupancy, offset=None, coordinates=None, bbox=None)

    # --- 'BEV_type2'/'BEV_type3' (vernier.py:191-313, 390-455) ---------
    def _head_bev_type23(self, voxel, train, with_coords):
        cfg = self.cfg
        two_dim = voxel.shape[-1]  # 2C
        dim = two_dim // 2
        g = cfg.gn_groups
        C3 = lambda f, k, d=1: ConvNorm3d(f, k, 1, d, cfg.gn, g, dtype=self.dtype)

        vimg = nn.relu(C3(dim, 1)(voxel, train))  # image-feature shortcut
        x = nn.relu(C3(dim, 7)(voxel, train))
        x = nn.relu(C3(dim, 5)(x, train)) + x
        x = nn.relu(C3(dim, 5, d=2)(x, train)) + x
        x = self._hg3d(dim, x, train) + x

        # foreground occupancy head
        occ = nn.relu(C3(dim, 3)(x, train))
        occ = nn.sigmoid(
            Conv3d(1, (3, 3, 3), dtype=self.dtype)(occ)
        )  # [N, nh, nw, nl, 1]
        occupancy = occ[..., 0]

        offset = None
        if cfg.use_part_reg_head:
            off = nn.relu(C3(dim, 3)(x, train))
            off = Conv3d(27, (1, 1, 1), dtype=self.dtype)(off)
            offset = jnp.moveaxis(off, -1, 1)  # [N, 27, nh, nw, nl]

        # concat image-feature shortcut gated by occupancy
        x = jnp.concatenate([x, vimg * occ], axis=-1)
        x = nn.relu(C3(dim, 3)(x, train))
        x = avg_pool_height(x, 4)
        N, H, W, L, C = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(N, W, L, H * C)
        bev = nn.relu(ConvNorm(64, 3, gn=cfg.gn, groups=g, dtype=self.dtype)(bev, train))
        hm = self._hg2d(64, bev, train)
        # [N, W, L, 64] -> [N, L, W, 64] (reference permute(0,1,3,2))
        hm = hm.transpose(0, 2, 1, 3)
        ncf_maps = nn.Conv(cfg.num_parts, (3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype)(hm)  # [N, nl, nw, P]
        ncf = jnp.moveaxis(ncf_maps, -1, 1)  # [N, P, nl, nw]

        coordinates, bbox = None, None
        if with_coords:
            aug = jnp.concatenate(
                [ncf_maps, _coord_maps(N, ncf_maps.shape[1], ncf_maps.shape[2],
                                       ncf_maps.dtype)],
                axis=-1,
            )
            coordinates = CoordHead(cfg.num_parts, dtype=self.dtype)(aug, train)
            if cfg.use_bbox_head:
                flat = coordinates.reshape(N, cfg.num_parts * 2)
                bbox = FCModel(num_blocks=1, num_neurons=128, output_size=5,
                               dtype=self.dtype)(flat, train)
        return dict(ncf=ncf, occupancy=occupancy, offset=offset,
                    coordinates=coordinates, bbox=bbox)


class VernierScale(nn.Module):
    """Full instance model: encoder + head (reference VernierScale,
    vernier.py:26-555).

    For inference, apply the children separately through their scoped
    variables to keep XLA programs small::

        vox = VernierEncoder(cfg).apply(scope_variables(vars, "encoder"), ...)
        out = VernierHead(cfg).apply(scope_variables(vars, "head"), vox)

    ``voxel_sharding`` (a jax.sharding.NamedSharding) enables tensor
    parallelism: the object voxel is shard-constrained (typically over its
    length axis on the mesh's "model" axis) and GSPMD partitions the 3D
    conv stack with halo exchanges — the TPU-native analog of splitting
    the cost volume across devices (SURVEY.md §2.3).
    """

    cfg: VernierConfig
    voxel_sharding: Any = None

    def setup(self):
        self.encoder = VernierEncoder(self.cfg)
        self.head = VernierHead(self.cfg)

    def __call__(self, left_roi, right_roi, grid_proj_left, grid_proj_right,
                 train: bool = False):
        voxel = self.encoder(
            left_roi, right_roi, grid_proj_left, grid_proj_right, train
        )
        if self.voxel_sharding is not None:
            voxel = jax.lax.with_sharding_constraint(voxel, self.voxel_sharding)
        return self.head(voxel, train)


def scope_variables(variables, name: str):
    """Slice a VernierScale variables dict down to one child module."""
    out = {}
    for col, tree in variables.items():
        if name in tree:
            out[col] = tree[name]
    return out


def get_model(cfg: VernierConfig) -> VernierScale:
    """Reference-parity constructor (vernier.py:841-842)."""
    return VernierScale(cfg)
