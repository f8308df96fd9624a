"""HRNet 2D backbone (Flax linen, NHWC).

TPU-native re-design of the reference's high-resolution feature extractor
(snvc/models/hrnet.py:25-570, itself adapted from the public HRNet):
parallel multi-resolution branches with repeated cross-resolution fusion.
Used as (a) the stride-4 feature extractor for left/right ROIs
(head_type='default') and (b) a heatmap-regression head with pixel-shuffle
upsampling (head_type='heatmap_regression', hrnet.py:324-334).

Structural choices kept for behavioral parity:
  * stem: two stride-2 3x3 convs -> stride 4,
  * stage-1 bottleneck layer, then 2/3/4-branch stages per config,
  * fuse: 1x1 conv + nearest 2^k upsample (j > i), chained stride-2 3x3
    convs (j < i), identity (j == i), summed then relu,
  * default head returns the highest-resolution branch.

BatchNorm follows the reference; pass train=True with a mutable
'batch_stats' collection during training.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from snvc_tpu.config import BackboneConfig, HRNetStageConfig
from snvc_tpu.models.layers import pixel_shuffle_2d

Dtype = Any


class BasicBlock(nn.Module):
    """3x3-3x3 residual block with final relu (reference hrnet.py:25-54)."""

    features: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        # explicit (1,1) padding = torch Conv2d(k3, pad=1); flax "SAME" at
        # stride 2 pads (0,1) and shifts converted checkpoints by a pixel
        out = nn.Conv(
            self.features, (3, 3), (self.stride,) * 2, ((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype,
        )(x)
        out = nn.relu(bn(out))
        out = nn.Conv(self.features, (3, 3), (1, 1), ((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride,) * 2,
                        use_bias=False, dtype=self.dtype)(x)
            x = bn(x)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck, expansion 4 (reference hrnet.py:72-110)."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Optional[Dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        out_ch = self.features * self.expansion
        out = nn.relu(bn(nn.Conv(self.features, (1, 1), use_bias=False,
                                 dtype=self.dtype)(x)))
        out = nn.relu(
            bn(nn.Conv(self.features, (3, 3), (self.stride,) * 2,
                       ((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(out))
        )
        out = bn(nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(out))
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = bn(nn.Conv(out_ch, (1, 1), (self.stride,) * 2, use_bias=False,
                           dtype=self.dtype)(x))
        return nn.relu(out + x)


_BLOCKS = {"basic": (BasicBlock, 1), "bottleneck": (Bottleneck, 4)}


def _nearest_up(x, factor: int):
    """Nearest-neighbor 2^k upsample (reference nn.Upsample(mode='nearest'),
    hrnet.py:204)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


class FuseLayer(nn.Module):
    """Cross-resolution fusion path j -> i (reference hrnet.py:184-230)."""

    to_branch: int
    from_branch: int
    features: int  # channels of branch `to_branch`
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        i, j = self.to_branch, self.from_branch
        if j > i:
            x = bn(nn.Conv(self.features, (1, 1), use_bias=False,
                           dtype=self.dtype)(x))
            return _nearest_up(x, 2 ** (j - i))
        for k in range(i - j):
            last = k == i - j - 1
            ch = self.features if last else x.shape[-1]
            x = bn(nn.Conv(ch, (3, 3), (2, 2), ((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype)(x))
            if not last:
                x = nn.relu(x)
        return x


class HRModule(nn.Module):
    """One high-resolution module: per-branch blocks + full fusion
    (reference HighResolutionModule, hrnet.py:113-252)."""

    stage: HRNetStageConfig
    multi_scale_output: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        block, exp = _BLOCKS[self.stage.block]
        nb = self.stage.num_branches
        outs = []
        for i in range(nb):
            h = xs[i]
            for _ in range(self.stage.num_blocks[i]):
                h = block(self.stage.num_channels[i], dtype=self.dtype)(h, train)
            outs.append(h)
        if nb == 1:
            return outs
        fused = []
        n_out = nb if self.multi_scale_output else 1
        for i in range(n_out):
            ci = self.stage.num_channels[i] * exp
            acc = outs[i]
            for j in range(nb):
                if j == i:
                    continue
                acc = acc + FuseLayer(i, j, ci, dtype=self.dtype)(outs[j], train)
            fused.append(nn.relu(acc))
        return fused


class Transition(nn.Module):
    """Branch-count transition between stages (reference hrnet.py:387-421)."""

    out_channels: Tuple[int, ...]
    in_channels: Tuple[int, ...]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        n_pre, n_cur = len(self.in_channels), len(self.out_channels)
        outs = []
        for i in range(n_cur):
            if i < n_pre:
                if self.out_channels[i] != self.in_channels[i]:
                    h = nn.relu(
                        bn(nn.Conv(self.out_channels[i], (3, 3), (1, 1),
                                   ((1, 1), (1, 1)), use_bias=False,
                                   dtype=self.dtype)(xs[i]))
                    )
                else:
                    h = xs[i]
            else:
                h = xs[-1]
                for j in range(i + 1 - n_pre):
                    ch = self.out_channels[i] if j == i - n_pre else h.shape[-1]
                    h = nn.relu(
                        bn(nn.Conv(ch, (3, 3), (2, 2), ((1, 1), (1, 1)),
                                   use_bias=False, dtype=self.dtype)(h))
                    )
            outs.append(h)
        return outs


class HRNet(nn.Module):
    """Full HRNet (reference HighResolutionNet, hrnet.py:261-525).

    head_type:
      'default'            -> highest-resolution feature map [N, H/4, W/4, C]
      'heatmap_regression' -> skips the stem/stage1 (input is already a
                              feature map), ends with 1x1 conv to
                              num_heatmaps*4 channels + pixel-shuffle x2
      'classification'     -> incremental bottleneck head + global pool + fc
    """

    cfg: BackboneConfig
    head_type: Optional[str] = None
    num_heatmaps: int = 9
    num_classes: int = 1000
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        head = self.head_type or self.cfg.head_type
        stages = self.cfg.stages()
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)

        if head != "heatmap_regression":
            if self.cfg.add_xy and x.shape[-1] == 3:
                # coordinate-conv input augmentation (reference add_xy /
                # modify_input_channel, hrnet.py:550-560).  The REAL maps
                # are the ROI bbox's [-1, 1] coordinates in the GLOBAL
                # image frame (img_proc.generate_xy_map:184-198, appended
                # in the data path, img_proc.py:222-223) — the instance
                # pipeline computes them from the crop affine and ships
                # 5-channel ROIs (ops.assemble.roi_xy_maps).  When a bare
                # 3-channel image reaches the backbone directly (tests,
                # standalone use) fall back to the degenerate
                # bbox-==-whole-image maps: [-1, 1] ramps over the crop.
                N, H, W = x.shape[:3]
                xm = jnp.broadcast_to(
                    jnp.linspace(-1.0, 1.0, W, dtype=x.dtype)[None, None, :],
                    (N, H, W),
                )
                ym = jnp.broadcast_to(
                    jnp.linspace(-1.0, 1.0, H, dtype=x.dtype)[None, :, None],
                    (N, H, W),
                )
                x = jnp.concatenate(
                    [x, xm[..., None], ym[..., None]], axis=-1
                )
            # stem: stride-4 (hrnet.py:268-274)
            x = nn.relu(bn(nn.Conv(64, (3, 3), (2, 2), ((1, 1), (1, 1)),
                                   use_bias=False, dtype=self.dtype)(x)))
            x = nn.relu(bn(nn.Conv(64, (3, 3), (2, 2), ((1, 1), (1, 1)),
                                   use_bias=False, dtype=self.dtype)(x)))
            # stage 1
            s1 = stages[0]
            block, exp = _BLOCKS[s1.block]
            for _ in range(s1.num_blocks[0]):
                x = block(s1.num_channels[0], dtype=self.dtype)(x, train)
        xs = [x]
        prev_channels = (x.shape[-1],)

        for si in range(1, len(stages)):
            st = stages[si]
            block, exp = _BLOCKS[st.block]
            cur_channels = tuple(c * exp for c in st.num_channels)
            xs = Transition(cur_channels, prev_channels, dtype=self.dtype)(xs, train)
            for _ in range(st.num_modules):
                xs = HRModule(st, True, dtype=self.dtype)(xs, train)
            prev_channels = tuple(h.shape[-1] for h in xs)

        if head == "default":
            return xs[0]
        if head == "heatmap_regression":
            y = nn.Conv(self.num_heatmaps * 4, (1, 1), dtype=self.dtype)(xs[0])
            return pixel_shuffle_2d(y, 2)
        if head == "classification":
            head_channels = [32, 64, 128, 256]
            y = Bottleneck(head_channels[0], dtype=self.dtype)(xs[0], train)
            for i in range(len(xs) - 1):
                incre = Bottleneck(head_channels[i + 1], dtype=self.dtype)(
                    xs[i + 1], train
                )
                down = nn.relu(
                    bn(nn.Conv(head_channels[i + 1] * 4, (3, 3), (2, 2),
                               ((1, 1), (1, 1)), dtype=self.dtype)(y))
                )
                y = incre + down
            y = nn.relu(bn(nn.Conv(2048, (1, 1), dtype=self.dtype)(y)))
            y = jnp.mean(y, axis=(1, 2))
            return nn.Dense(self.num_classes, dtype=self.dtype)(y)
        raise NotImplementedError(head)
