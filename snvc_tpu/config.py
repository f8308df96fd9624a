"""Typed configuration for snvc_tpu.

The reference uses an executable ``save_config.py`` loaded from the model
directory (reference: snvc/utils/exp_utils.py:22-28).  Here configs are
frozen dataclasses serialized to JSON next to Orbax checkpoints, keeping the
"config travels with weights" property while staying hermetic.

The key surface mirrors the reference's recovered config keys
(SURVEY.md §5): grid geometry (grid_resolution / ranges / spacing / sigma),
ROI cropping (resolution / aspect_ratio / image stats), model selection
(vernier_type, backbone, gn, num_parts, heads), data generation
(augmentation noise, fov check), and the global model's voxel/RPN keys.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _as_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(_as_tuple(v) for v in x)
    return x


class _Base:
    """JSON (de)serialization shared by all config dataclasses."""

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            sub = _CONFIG_TYPES.get(f.name)
            if sub is not None and isinstance(v, dict):
                v = sub.from_dict(v)
            elif isinstance(v, list):
                v = _as_tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class HRNetStageConfig(_Base):
    """One HRNet stage (reference: snvc/models/hrnet.py:276-311)."""

    num_modules: int = 1
    num_branches: int = 1
    block: str = "bottleneck"  # "basic" | "bottleneck"
    num_blocks: Tuple[int, ...] = (4,)
    num_channels: Tuple[int, ...] = (64,)
    fuse_method: str = "sum"


def hrnet_w32_stages() -> Tuple[HRNetStageConfig, ...]:
    return (
        HRNetStageConfig(1, 1, "bottleneck", (4,), (64,)),
        HRNetStageConfig(1, 2, "basic", (4, 4), (32, 64)),
        HRNetStageConfig(4, 3, "basic", (4, 4, 4), (32, 64, 128)),
        HRNetStageConfig(3, 4, "basic", (4, 4, 4, 4), (32, 64, 128, 256)),
    )


def hrnet_w48_stages() -> Tuple[HRNetStageConfig, ...]:
    return (
        HRNetStageConfig(1, 1, "bottleneck", (4,), (64,)),
        HRNetStageConfig(1, 2, "basic", (4, 4), (48, 96)),
        HRNetStageConfig(4, 3, "basic", (4, 4, 4), (48, 96, 192)),
        HRNetStageConfig(3, 4, "basic", (4, 4, 4, 4), (48, 96, 192, 384)),
    )


def hrnet_tiny_stages() -> Tuple[HRNetStageConfig, ...]:
    """Small stages for tests/CI (not in the reference)."""
    return (
        HRNetStageConfig(1, 1, "bottleneck", (1,), (16,)),
        HRNetStageConfig(1, 2, "basic", (1, 1), (8, 16)),
        HRNetStageConfig(1, 3, "basic", (1, 1, 1), (8, 16, 32)),
        HRNetStageConfig(1, 4, "basic", (1, 1, 1, 1), (8, 16, 32, 64)),
    )


def hrnet_multi_stages() -> Tuple[HRNetStageConfig, ...]:
    """Small stages with REPEATED modules per stage (num_modules 2/3/2) and
    a 4-branch final stage — the release hrnet-w48/w32 enumeration class
    (reference hrnet.py:460-500) at test size.  Exists to pin the
    checkpoint converter's within-stage repeated-module ordering without
    paying a full w32 init in CI."""
    return (
        HRNetStageConfig(1, 1, "bottleneck", (2,), (16,)),
        HRNetStageConfig(2, 2, "basic", (2, 2), (8, 16)),
        HRNetStageConfig(3, 3, "basic", (2, 2, 2), (8, 16, 32)),
        HRNetStageConfig(2, 4, "basic", (2, 2, 2, 2), (8, 16, 32, 64)),
    )


@dataclass(frozen=True)
class BackboneConfig(_Base):
    """2D feature extractor config (reference: hrnet.get_model, hrnet.py:562)."""

    name: str = "hrnet-w32"  # hrnet-w48 | hrnet-w32 | hrnet-tiny
    head_type: str = "default"  # default | classification | heatmap_regression
    add_xy: bool = False
    init_weights: bool = False
    pre_trained_path: str = ""

    def stages(self) -> Tuple[HRNetStageConfig, ...]:
        if self.name == "hrnet-w32":
            return hrnet_w32_stages()
        if self.name == "hrnet-w48":
            return hrnet_w48_stages()
        if self.name == "hrnet-tiny":
            return hrnet_tiny_stages()
        if self.name == "hrnet-test-multi":
            return hrnet_multi_stages()
        raise ValueError(f"unknown backbone {self.name}")

    @property
    def output_channel(self) -> int:
        return self.stages()[1].num_channels[0]


@dataclass(frozen=True)
class VernierConfig(_Base):
    """Instance-level refinement model + data config.

    Semantics follow the reference's recovered ``cfg`` surface
    (snvc/models/vernier.py, snvc/dataset/KITTIRefinement_dataset.py).
    """

    # --- model ---
    vernier_type: str = "BEV_type3"  # 3D | BEV | BEV_type2 | BEV_type3
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    gn: bool = True  # GroupNorm instead of BatchNorm in the 3D/BEV nets
    gn_groups: int = 32
    num_parts: int = 9  # center + 8 corners
    use_bbox_head: bool = False
    use_part_reg_head: bool = False
    head_reg_type: str = "vector2d"
    # stereo feature aggregation into the voxel: "concat" |
    # "concat-atten" (cosine-similarity gating, reference vernier.py:341-344)
    feature_aggregation: str = "concat"
    # NCF heatmap loss: "mse" (VoxelMSELoss) or "mse_weighted"
    # (VoxelMSELossWeighted, loss3d.py:801-828 — balances the sparse peaks
    # against the empty background)
    ncf_loss: str = "mse"
    # --- instance grid (the "Vernier scale") ---
    # grid_resolution = (nh, nw, nl): samples along y (height), x (width),
    # z (length) of the object frame; reference example 32x192x192
    # (vernier.py:120, KITTIRefinement_dataset.py:267-282).
    grid_resolution: Tuple[int, int, int] = (16, 96, 96)
    # The BEV part heatmaps carry all 9 parts including the 8 CORNERS: the
    # w/l ranges must contain +-l/2 (+ perturbation + gaussian radius) or
    # the corner NCF targets clip off-grid and the all_parts registration
    # degrades (car corners sit at ~+-2.0 m along length).
    x_range: Tuple[float, float] = (-2.4, 2.4)
    y_range: Tuple[float, float] = (-1.0, 1.0)
    z_range: Tuple[float, float] = (-2.4, 2.4)
    sigma: int = 2  # gaussian radius (in voxels) of part heatmap targets
    # sub-voxel NCF supervision: draw the part gaussians at the TRUE
    # (fractional) voxel coordinates instead of flooring them first — the
    # reference's own TODO (KITTIRefinement_dataset.py:633); pairs with
    # the soft-argmax decode whose precision quantized targets waste
    ncf_subvoxel: bool = False
    grid_type: str = "2D"  # target heatmaps: "2D" (BEV) or "3D"
    # --- ROI cropping ---
    resolution: Tuple[int, int] = (256, 256)  # (height, width) of the ROI
    aspect_ratio: float = 1.0  # target height/width of the crop box
    roi_enlarge: float = 1.1  # crop box enlargement (img_proc.kpts2cs default)
    img_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    img_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # --- data / augmentation ---
    usage: str = "inference"  # train | inference
    sup_type: str = "real"  # synthetic (sample around GT) | real (proposals)
    pred_dir: str = ""
    depth_range: Tuple[float, float] = (0.0, 60.0)
    valid_classes: Tuple[int, ...] = (2,)  # Car(+Van)=2 in the KITTI mapping
    augment: bool = True
    augment_times: int = 1
    rot_aug: bool = True
    loc_aug: bool = True
    dim_aug: bool = False
    std_rot: float = 5.0  # degrees
    std_loc: Tuple[float, float, float] = (0.2, 0.05, 0.2)
    std_dim: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    check_fov: bool = False
    # --- batching (TPU static shapes) ---
    max_instances: int = 8  # instances per device batch (padded)
    # image slots per batch: >1 packs instances of several frames into one
    # batch (sparse scenes no longer waste padded instance slots; also the
    # only way to build multi-frame serving batches for val sweeps)
    frames_per_batch: int = 1
    image_size: Tuple[int, int] = (384, 1280)  # full-frame pad size (H, W)
    # --- pose update / output ---
    # NCF -> part position decode: "coordinates" (reference CLI behavior —
    # use the part-reg head when present, else heatmap argmax), "argmax"
    # (force reference get_max_preds even when the head exists), or
    # "soft-argmax" (img_proc.soft_arg_max — sub-voxel expectation decode)
    ncf_decode: str = "coordinates"
    # Filter gate: heatmap values outside [filter_min, filter_max] mark an
    # implausible prediction and the update is rejected
    # (tools/inference_agnostic.py:94-105)
    filter_min: float = -1.0
    filter_max: float = 2.0
    save: bool = True
    pred_type: Tuple[str, ...] = ("all_parts",)
    output_dir: str = "outputs"
    debug: bool = False
    # --- numerics ---
    compute_dtype: str = "bfloat16"  # activations; params stay fp32
    remat: bool = True  # rematerialize hourglasses to save HBM

    # Derived quantities -------------------------------------------------
    @property
    def n_sample_h(self) -> int:
        return self.grid_resolution[0]

    @property
    def n_sample_w(self) -> int:
        return self.grid_resolution[1]

    @property
    def n_sample_l(self) -> int:
        return self.grid_resolution[2]

    @property
    def grid_range(self) -> Tuple[float, float, float]:
        """(h, w, l) extent of the refinement space in meters."""
        return (
            self.y_range[1] - self.y_range[0],
            self.x_range[1] - self.x_range[0],
            self.z_range[1] - self.z_range[0],
        )

    @property
    def spacing(self) -> Tuple[float, float, float]:
        """Voxel pitch (dy, dx, dz) under the linspace grid convention
        (n points spanning the range -> pitch = range/(n-1)); the reference
        stores this as cfg.spacing and its formulas assume the same."""
        nh, nw, nl = self.grid_resolution
        gh, gw, gl = self.grid_range
        return (gh / (nh - 1), gw / (nw - 1), gl / (nl - 1))


@dataclass(frozen=True)
class StereoConfig(_Base):
    """Global main-scale stereo detector config.

    The reference's StereoNet class is unreleased; the config keys are
    recovered from snvc/models/submodule.py:363-513 and loss3d.py:15-20.
    """

    backbone: str = "reslike-det-small"
    gn: bool = True
    branch: bool = True  # SPP branches
    plane_sweep_volume: bool = True
    cat_img_feature: bool = True
    rpn3d_enable: bool = True
    rpn_convdim: int = 64
    align_corners: bool = True
    cv_feature_dim: int = 32  # channels of cost-volume features ("lastconv")
    # depth hypotheses for the plane sweep
    num_depths: int = 64
    min_depth: float = 2.0
    max_depth: float = 59.6
    # scene voxel / BEV grid (camera rect frame)
    x_min: float = -30.0
    x_max: float = 30.0
    y_min: float = -1.0
    y_max: float = 3.0
    z_min: float = 2.0
    z_max: float = 59.6
    voxel_x: float = 0.2
    voxel_y: float = 0.2
    voxel_z: float = 0.2
    # RPN head
    num_classes: int = 1
    # class slot k <-> KITTI type name: drives GT class assignment in the
    # stereo pipeline and the proposal writer's type column (the reference
    # writer hard-codes "Car", inference_agnostic.py:354; its evaluator
    # scores car/pedestrian/cyclist, evaluate_object_3d_offline.cpp:43-58)
    class_names: Tuple[str, ...] = ("Car",)
    num_angles: int = 2
    anchor_angles: Tuple[float, ...] = (0.0, 1.5707963)
    anchors_y: Tuple[float, ...] = (1.65,)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    num_3d_convs: int = 1
    hourglass_3d: bool = True
    # stacked 3D hourglasses over the cost volume with intermediate cost
    # outputs (the reference ships deep stacked hourglasses,
    # submodule.py:223-268, and a multi-stage disparity loss weighted
    # 0.5/0.7/1.0 over several depth_preds, loss3d.py:432-438).  Each
    # stage threads the first stage's pre/post skip state, adds its output
    # back to the pre-stack volume, and refines the previous stage's cost.
    # num_hourglasses=1 reproduces the original single-hourglass graph
    # (same parameter tree: old checkpoints load unchanged).
    num_hourglasses: int = 1
    # depth supervision: "sl1" (multi-stage smooth-L1 on the regressed
    # depth, loss3d.py:425-438) or "w1" (Wasserstein-1 over the depth
    # distribution, loss3d.py:399-423)
    depth_loss: str = "sl1"
    # per-depth-plane learned offset added to the hypothesis grid under
    # the W1 loss (the reference's `off` branch, loss3d.py:399-412)
    depth_offset: bool = False
    # per-step view-consistent photometric jitter during training
    # (reference ColorJitter/Lighting, preprocess.py:21-179)
    photometric_aug: bool = False
    # heading-symmetric corner regression: score each positive against
    # both pi-rotated corner orderings and keep the better one.  The
    # heading bit is invisible to BEV/3D IoU and (on geometry alone)
    # unlearnable, so the asymmetric loss drives predictions toward the
    # average of the two orderings — a shrunken, degenerate box.  Off by
    # default for parity with the reference loss (loss3d.py:350-359,
    # whose own sin/cos disambiguation lands on a corner coordinate).
    reg_heading_sym: bool = False
    # image size (padded/cropped to static shape); KITTI is 375x1242
    input_size: Tuple[int, int] = (384, 1248)
    compute_dtype: str = "bfloat16"

    @property
    def bev_size(self) -> Tuple[int, int]:
        nz = int(round((self.z_max - self.z_min) / self.voxel_z))
        nx = int(round((self.x_max - self.x_min) / self.voxel_x))
        return nz, nx

    @property
    def ny(self) -> int:
        return int(round((self.y_max - self.y_min) / self.voxel_y))


@dataclass(frozen=True)
class TrainConfig(_Base):
    lr: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 500
    total_steps: int = 80000
    batch_size: int = 8  # global batch (instances for vernier, pairs for stereo)
    occupancy_weight: float = 1.0
    coordinate_weight: float = 0.1
    grad_clip: float = 10.0
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 1000


@dataclass(frozen=True)
class MeshConfig(_Base):
    """Device mesh layout. data: batch sharding over ICI; model: optional
    sharding of the cost-volume depth axis / voxel channels."""

    data: int = -1  # -1: all devices
    model: int = 1


@dataclass(frozen=True)
class ExperimentConfig(_Base):
    vernier: VernierConfig = field(default_factory=VernierConfig)
    stereo: StereoConfig = field(default_factory=StereoConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data_path: str = "data/kitti/training"
    split_file: str = "data/kitti/val.txt"


_CONFIG_TYPES = {
    "backbone": BackboneConfig,
    "vernier": VernierConfig,
    "stereo": StereoConfig,
    "train": TrainConfig,
    "mesh": MeshConfig,
}


def tiny_vernier_config(**overrides) -> VernierConfig:
    """A small config for tests and CPU smoke runs."""
    base = dict(
        backbone=BackboneConfig(name="hrnet-tiny"),
        grid_resolution=(8, 16, 16),
        resolution=(64, 64),
        gn_groups=4,
        max_instances=2,
        sigma=1,
        compute_dtype="float32",
        remat=False,
    )
    base.update(overrides)
    return VernierConfig(**base)


def tiny_stereo_config(**overrides) -> StereoConfig:
    base = dict(
        backbone="reslike50-det-tiny",
        num_depths=16,
        input_size=(64, 128),
        x_min=-8.0,
        x_max=8.0,
        z_min=2.0,
        z_max=18.0,
        voxel_x=0.5,
        voxel_y=1.0,
        voxel_z=0.5,
        compute_dtype="float32",
    )
    base.update(overrides)
    return StereoConfig(**base)


def save_config(cfg: _Base, path: str) -> None:
    with open(path, "w") as f:
        f.write(cfg.to_json())


def load_config(path: str, cls=ExperimentConfig):
    with open(path, "r") as f:
        return cls.from_json(f.read())
