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
    """Non-overlapping average pooling via crop + reshape + mean.

    Exactly equals nn.avg_pool with stride == window (floor semantics),
    but avoids XLA reduce_window, which executes the 64x64 SPP windows
    ~70x slower than this formulation on the axon TPU backend."""
    N, H, W, C = x.shape
    Ho, Wo = H // k, W // k
    x = x[:, : Ho * k, : Wo * k]
    x = x.reshape(N, Ho, k, Wo, k, C)
    return x.mean(axis=(2, 4))


def _interp_matrix(n_out, n_in, dtype):
    """[n_out, n_in] align_corners=True linear interpolation weights
    (hat function), built with iotas — runs the upsample on the MXU
    instead of XLA resize's gather path."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    scale = (n_in - 1) / max(n_out - 1, 1)
    src = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0) * scale
    idx = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - idx)).astype(dtype)


def _bilinear_resize(x, hw, align_corners=True):
    """Separable bilinear upsample (reference
    F.interpolate(..., align_corners=True), submodule.py:487-496).

    For the tiny SPP sources (<= 16x16) the interpolation is an explicit
    broadcast-weighted sum over source cells — degenerate K=1..16 matmuls
    execute pathologically on the axon backend (~60 ms each)."""
    N, H, W, C = x.shape
    Ah = _interp_matrix(hw[0], H, x.dtype)
    Aw = _interp_matrix(hw[1], W, x.dtype)
    if H * W <= 256:
        out = 0.0
        for h in range(H):
            for w in range(W):
                wmap = (Ah[:, h][:, None] * Aw[:, w][None, :])[None, :, :, None]
                out = out + wmap * x[:, h, w][:, None, None, :]
        return out
    y = jnp.einsum("oh,nhwc->nowc", Ah, x)
    return jnp.einsum("pw,nowc->nopc", Aw, y)


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
