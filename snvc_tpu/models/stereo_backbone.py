"""2D stereo feature extractor for the global (main-scale) model.

TPU-native re-design of the reference's feature_extraction
(snvc/models/submodule.py:363-513): a ResNet-ish trunk (stride 4 total)
with four spatial-pyramid-pooling branches, producing
  * a compact cost-volume feature (32 ch) for the plane sweep, and
  * an RPN image feature for the BEV head.

Backbone variants carry the reference's channel/bloc layouts
(submodule.py:375-407).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from snvc_tpu.models.layers import ConvNorm, ResBlock2d

Dtype = Any

_VARIANTS = {
    # name: (first_dim, dims, blocks, branch_dim, lastconv_dims)
    "reslike-det": (64, (64, 128, 192, 256), (3, 6, 12, 4), 32, (256, 32)),
    "reslike-det-small": (64, (32, 64, 128, 192), (3, 6, 12, 4), 32, (256, 32)),
    "reslike-det-small-fixfirst": (16, (32, 64, 128, 192), (3, 6, 12, 4), 32, (256, 32)),
    "reslike50-det-small-fixfirst": (16, (32, 64, 128, 256), (3, 4, 6, 3), 32, (256, 32)),
    "reslike50-det-tiny": (8, (16, 32, 64, 128), (3, 4, 6, 3), 32, (128, 32)),
    # test-only
    "reslike-micro": (8, (8, 16, 16, 16), (1, 1, 1, 1), 8, (32, 16)),
}


def _avgpool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


def _bilinear_resize(x, hw, align_corners=True):
    # jax.image.resize 'linear' matches align_corners=False; the reference
    # uses cfg.align_corners (typically True).  For SPP context features the
    # difference is sub-percent; we use the XLA-native resize.
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]), "linear")


class StereoFeatureNet(nn.Module):
    backbone: str = "reslike-det-small"
    gn: bool = True
    branch: bool = True
    plane_sweep: bool = True
    rpn_feature: bool = True
    rpn_convdim: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        first_dim, dims, blocks, branch_dim, last_dims = _VARIANTS[self.backbone]
        gn0 = self.gn if first_dim >= 32 else False

        def conv(h, f, stride=1, dilation=1, gn=None, groups=32):
            g = self.gn if gn is None else gn
            return nn.relu(
                ConvNorm(f, 3, stride, dilation, g, groups, dtype=self.dtype)(h, train)
            )

        # stem: stride 2 (submodule.py:411-416)
        h = conv(x, first_dim, stride=2, gn=gn0)
        h = conv(h, first_dim, gn=gn0)
        h = conv(h, first_dim, gn=gn0)

        def layer(h, f, n, stride, dilation, gn):
            for i in range(n):
                h = ResBlock2d(f, stride if i == 0 else 1, dilation, gn,
                               dtype=self.dtype)(h, train)
            return h

        h = layer(h, dims[0], blocks[0], 1, 1, self.gn if dims[0] >= 32 else False)
        raw = layer(h, dims[1], blocks[1], 2, 1, self.gn)   # stride 4
        mid = layer(raw, dims[2], blocks[2], 1, 1, self.gn)
        skip = layer(mid, dims[3], blocks[3], 1, 2, self.gn)  # dilated

        feats = [raw, mid, skip]
        if self.branch:
            hw = (skip.shape[1], skip.shape[2])
            for k in (64, 32, 16, 8):
                kk = min(k, hw[0], hw[1])
                b = _avgpool(skip, kk)
                b = nn.relu(
                    ConvNorm(branch_dim, 1, 1, 1, self.gn,
                             min(32, branch_dim), dtype=self.dtype)(b, train)
                )
                feats.append(_bilinear_resize(b, hw))
        concat = jnp.concatenate(feats, axis=-1)

        cv_feat = None
        if self.plane_sweep:
            c = conv(concat, last_dims[0])
            cv_feat = nn.Conv(last_dims[1], (1, 1), use_bias=False,
                              dtype=self.dtype)(c)
        rpn_feat = None
        if self.rpn_feature:
            groups = 32 if self.rpn_convdim % 32 == 0 else 16
            rpn_feat = conv(concat, self.rpn_convdim, groups=groups)
        return cv_feat, rpn_feat
