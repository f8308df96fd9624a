"""A live-torch VernierScale (BEV_type3) mirror for full-graph parity tests.

Freshly written (NOT copied) to register modules with the release
checkpoint's prefixes and ordering (reference snvc/models/vernier.py:26-56:
_init_3d_net -> vimg_feat, conv1..conv4, hg_conv3d, fg_cls_head, pool_3d,
conv5, hm1, hm2; then _init_coord_head -> coord_head; then feat_net), and to
execute the reference's released forward graph (vernier.py:323-458: stereo
grid_sample voxel construction + BEV_type3 head).  Together with THRNet
(tests/torch_hrnet.py) this is the strongest environment-feasible substitute
for the blocked epoch_80 end-to-end anchor: a real torch state_dict with the
release structure, converted by convert_vernier_checkpoint, must reproduce
the torch forward numerically.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_hrnet import TBasic, THRNet


def tconvbn3d(cin, cout, k, pad, dilation=1, gn=False):
    """convbn_3d twin (reference submodule.py:32-50)."""
    return nn.Sequential(
        nn.Conv3d(cin, cout, k, stride=1, padding=pad, dilation=dilation,
                  bias=False),
        nn.BatchNorm3d(cout) if not gn else nn.GroupNorm(32, cout),
    )


def tconvbn2d(cin, cout, k, pad, dilation=1, gn=False):
    """convbn twin (reference submodule.py:11-29)."""
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride=1, padding=pad, dilation=dilation,
                  bias=False),
        nn.BatchNorm2d(cout) if not gn else nn.GroupNorm(32, cout),
    )


def _tdown3d(cin, cout, gn, downsample=True):
    return nn.Sequential(
        nn.Conv3d(cin, cout, 3, stride=2 if downsample else 1, padding=1,
                  bias=False),
        nn.BatchNorm3d(cout) if not gn else nn.GroupNorm(32, cout),
        nn.ReLU(),
    )


def _tup3d(cin, cout, gn):
    return nn.Sequential(
        nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm3d(cout) if not gn else nn.GroupNorm(32, cout),
    )


def _tdown2d(cin, cout, gn, downsample=True):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=2 if downsample else 1, padding=1,
                  bias=False),
        nn.BatchNorm2d(cout) if not gn else nn.GroupNorm(32, cout),
        nn.ReLU(),
    )


def _tup2d(cin, cout, gn):
    return nn.Sequential(
        nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm2d(cout) if not gn else nn.GroupNorm(32, cout),
    )


class THourglassDeep3d(nn.Module):
    """hourglass_downsample_16 twin (reference submodule.py:223-268):
    four stride-2 levels, each followed by a stride-1 conv; deconv decoder
    with skip adds at every level and NO relu after the adds."""

    def __init__(self, ch, gn=False):
        super().__init__()
        c2 = ch * 2
        self.conv1 = _tdown3d(ch, c2, gn)
        self.conv2 = _tdown3d(c2, c2, gn, False)
        self.conv3 = _tdown3d(c2, c2, gn)
        self.conv4 = _tdown3d(c2, c2, gn, False)
        self.conv5 = _tdown3d(c2, c2, gn)
        self.conv6 = _tdown3d(c2, c2, gn, False)
        self.conv7 = _tdown3d(c2, c2, gn)
        self.conv8 = _tdown3d(c2, c2, gn, False)
        self.conv9 = _tup3d(c2, c2, gn)
        self.conv10 = _tup3d(c2, c2, gn)
        self.conv11 = _tup3d(c2, c2, gn)
        self.conv12 = _tup3d(c2, ch, gn)

    def forward(self, x):
        d1 = self.conv2(self.conv1(x))
        d2 = self.conv4(self.conv3(d1))
        d3 = self.conv6(self.conv5(d2))
        d4 = self.conv8(self.conv7(d3))
        u = self.conv9(d4) + d3
        u = self.conv10(u) + d2
        u = self.conv11(u) + d1
        return self.conv12(u)


class THourglassDeep2d(nn.Module):
    """hourglass2d_downsample_16 twin (reference submodule.py:270-315)."""

    def __init__(self, ch, gn=False):
        super().__init__()
        c2 = ch * 2
        self.conv1 = _tdown2d(ch, c2, gn)
        self.conv2 = _tdown2d(c2, c2, gn, False)
        self.conv3 = _tdown2d(c2, c2, gn)
        self.conv4 = _tdown2d(c2, c2, gn, False)
        self.conv5 = _tdown2d(c2, c2, gn)
        self.conv6 = _tdown2d(c2, c2, gn, False)
        self.conv7 = _tdown2d(c2, c2, gn)
        self.conv8 = _tdown2d(c2, c2, gn, False)
        self.conv9 = _tup2d(c2, c2, gn)
        self.conv10 = _tup2d(c2, c2, gn)
        self.conv11 = _tup2d(c2, c2, gn)
        self.conv12 = _tup2d(c2, ch, gn)

    def forward(self, x):
        d1 = self.conv2(self.conv1(x))
        d2 = self.conv4(self.conv3(d1))
        d3 = self.conv6(self.conv5(d2))
        d4 = self.conv8(self.conv7(d3))
        u = self.conv9(d4) + d3
        u = self.conv10(u) + d2
        u = self.conv11(u) + d1
        return self.conv12(u)


def _tcoord_head(num_parts, nl, nw):
    """_init_coord_head twin (reference vernier.py:68-93): strided residual
    blocks sized by num_ds = 4 - log2(192 / nl), then a VALID conv over the
    remaining extent (the release config lands on the hard-coded (6, 4))."""
    ch = num_parts * 2
    blocks = [TBasic(num_parts + 2, ch, stride=2)]
    num_ds = int(4 - math.log2(192 / nl))
    for _ in range(num_ds):
        blocks.append(TBasic(ch, ch, stride=2))
    n = len(blocks)
    kh, kw = nl >> n, nw >> n
    blocks.append(nn.Conv2d(ch, ch, kernel_size=(kh, kw)))
    blocks.append(nn.Sigmoid())
    return nn.Sequential(*blocks)


class TVernier(nn.Module):
    """Release-structure VernierScale twin: BEV_type3 3D/BEV head over a
    stereo grid-sampled voxel, deep hourglasses (n_sample_w > 16), coord
    head, HRNet backbone."""

    def __init__(self, stages, feat_dim, grid_resolution, resolution,
                 num_parts=9, gn=False):
        super().__init__()
        dim = feat_dim
        nh, nw, nl = grid_resolution
        self.grid_resolution = grid_resolution
        self.resolution = resolution
        self.num_parts = num_parts
        # registration order mirrors reference vernier.py:249-313
        self.vimg_feat = nn.Sequential(tconvbn3d(2 * dim, dim, 1, 0, gn=gn),
                                       nn.ReLU())
        self.conv1 = nn.Sequential(tconvbn3d(2 * dim, dim, 7, 3, gn=gn),
                                   nn.ReLU())
        self.conv2 = nn.Sequential(tconvbn3d(dim, dim, 5, 2, gn=gn),
                                   nn.ReLU())
        self.conv3 = nn.Sequential(tconvbn3d(dim, dim, 5, 4, dilation=2, gn=gn),
                                   nn.ReLU())
        self.conv4 = nn.Sequential(tconvbn3d(2 * dim, dim, 3, 1, gn=gn),
                                   nn.ReLU())
        assert nw > 16, "release path uses the deep hourglasses"
        self.hg_conv3d = THourglassDeep3d(dim, gn=gn)
        self.fg_cls_head = nn.Sequential(
            tconvbn3d(dim, dim, 3, 1, gn=gn),
            nn.ReLU(),
            nn.Conv3d(dim, 1, 3, 1, 1, bias=False),
            nn.Sigmoid(),
        )
        self.pool_3d = nn.AvgPool3d((4, 1, 1), stride=(4, 1, 1))
        dim_height = (nh // 4) * dim
        self.conv5 = nn.Sequential(tconvbn2d(dim_height, 64, 3, 1, gn=gn),
                                   nn.ReLU())
        self.hm1 = THourglassDeep2d(64, gn=gn)
        self.hm2 = nn.Conv2d(64, num_parts, 3, 1, 1, bias=False)
        self.coord_head = _tcoord_head(num_parts, nl, nw)
        self.feat_net = THRNet(stages)
        # coordinate-conv maps (reference _init_grid, vernier.py:99-114)
        xm = np.tile(np.linspace(0, 1, nw, dtype=np.float32), (nl, 1))
        zm = np.tile(np.linspace(0, 1, nl, dtype=np.float32)[:, None], (1, nw))
        # plain attribute like the reference (vernier.py:104) — the release
        # state_dict carries no coor_maps entry
        self.register_buffer(
            "coor_maps", torch.from_numpy(np.stack([xm, zm])[None]),
            persistent=False,
        )

    def _sample(self, feat, pts):
        """grid_sample at projected grid points (vernier.py:323-349).
        feat [N, C, Hf, Wf]; pts [N, P, 2] in ROI pixel coords."""
        nh, nw, nl = self.grid_resolution
        N = pts.shape[0]
        g = pts.reshape(N, nh, nw * nl, 2).clone()
        g[..., 0] = g[..., 0] / self.resolution[1] * 2 - 1
        g[..., 1] = g[..., 1] / self.resolution[0] * 2 - 1
        s = F.grid_sample(feat, g, align_corners=False, padding_mode="zeros")
        return s.reshape(N, feat.shape[1], nh, nw, nl)

    def forward(self, left_roi, right_roi, grid_proj_l, grid_proj_r):
        lf = self.feat_net(left_roi)
        rf = self.feat_net(right_roi)
        voxel = torch.cat(
            [self._sample(lf, grid_proj_l), self._sample(rf, grid_proj_r)],
            dim=1,
        )
        # BEV_type3 head (vernier.py:414-455)
        vimg = self.vimg_feat(voxel)
        x = self.conv1(voxel)
        x = self.conv2(x) + x
        x = self.conv3(x) + x
        x = self.hg_conv3d(x) + x
        occupancy = self.fg_cls_head(x)
        x = torch.cat([x, vimg * occupancy], dim=1)
        x = self.conv4(x)
        x = self.pool_3d(x)
        N, Fc, H, W, L = x.shape
        bev = x.reshape(N, Fc * H, W, L)
        bev = self.conv5(bev)
        feats = self.hm1(bev).permute(0, 1, 3, 2)
        heatmaps = self.hm2(feats)
        aug = torch.cat(
            [heatmaps, self.coor_maps.expand(N, -1, -1, -1)], dim=1
        )
        coords = self.coord_head(aug).reshape(N, -1, 2)
        return heatmaps, occupancy.squeeze(1), coords
