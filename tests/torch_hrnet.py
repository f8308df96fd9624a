"""A live-torch HRNet mirror for converter parity tests.

Freshly written (NOT copied) to register modules in the reference's order
(snvc/models/hrnet.py HighResolutionNet: conv1, bn1, conv2, bn2, layer1,
transition1, stage2, transition2, stage3, transition3, stage4), so its
state_dict enumerates tensors exactly as a released checkpoint's backbone
group does.  Used to prove that convert_module aligns a real torch HRNet
state_dict onto the flax HRNet with numeric forward parity.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.down = None
        if stride != 1 or cin != ch:
            self.down = nn.Sequential(
                nn.Conv2d(cin, ch, 1, stride, bias=False), nn.BatchNorm2d(ch)
            )
        self.relu = nn.ReLU()

    def forward(self, x):
        out = self.bn2(self.conv2(self.relu(self.bn1(self.conv1(x)))))
        res = x if self.down is None else self.down(x)
        return self.relu(out + res)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, ch, stride=1):
        super().__init__()
        cout = ch * self.expansion
        self.conv1 = nn.Conv2d(cin, ch, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.conv3 = nn.Conv2d(ch, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        self.relu = nn.ReLU()

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = x if self.down is None else self.down(x)
        return self.relu(out + res)


_TBLOCKS = {"basic": (TBasic, 1), "bottleneck": (TBottleneck, 4)}


class THRModule(nn.Module):
    def __init__(self, stage, in_channels):
        super().__init__()
        block, exp = _TBLOCKS[stage.block]
        self.nb = stage.num_branches
        branches = []
        for i in range(self.nb):
            layers = []
            cin = in_channels[i]
            for _ in range(stage.num_blocks[i]):
                layers.append(block(cin, stage.num_channels[i]))
                cin = stage.num_channels[i] * exp
            branches.append(nn.Sequential(*layers))
        self.branches = nn.ModuleList(branches)
        self.out_channels = [c * exp for c in stage.num_channels]
        fuse = []
        if self.nb > 1:
            for i in range(self.nb):
                row = []
                for j in range(self.nb):
                    if j > i:
                        row.append(
                            nn.Sequential(
                                nn.Conv2d(self.out_channels[j],
                                          self.out_channels[i], 1, bias=False),
                                nn.BatchNorm2d(self.out_channels[i]),
                                nn.Upsample(scale_factor=2 ** (j - i),
                                            mode="nearest"),
                            )
                        )
                    elif j == i:
                        row.append(nn.Identity())
                    else:
                        steps = []
                        for k in range(i - j):
                            last = k == i - j - 1
                            co = self.out_channels[i] if last else \
                                self.out_channels[j]
                            seq = [
                                nn.Conv2d(self.out_channels[j] if k == 0
                                          else self.out_channels[j],
                                          co, 3, 2, 1, bias=False),
                                nn.BatchNorm2d(co),
                            ]
                            if not last:
                                seq.append(nn.ReLU())
                            steps.append(nn.Sequential(*seq))
                        row.append(nn.Sequential(*steps))
                fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)
        self.relu = nn.ReLU()

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        if self.nb == 1:
            return xs
        outs = []
        for i in range(self.nb):
            y = xs[i]
            for j in range(self.nb):
                if j != i:
                    y = y + self.fuse_layers[i][j](xs[j])
            outs.append(self.relu(y))
        return outs


class THRNet(nn.Module):
    """Mirror of the flax HRNet 'default' head: stem -> stage1 -> stages
    with transitions, returning the highest-resolution map."""

    def __init__(self, stages):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        s1 = stages[0]
        block, exp = _TBLOCKS[s1.block]
        layers, cin = [], 64
        for _ in range(s1.num_blocks[0]):
            layers.append(block(cin, s1.num_channels[0]))
            cin = s1.num_channels[0] * exp
        self.layer1 = nn.Sequential(*layers)
        prev = [cin]
        self._stages = stages
        for si in range(1, len(stages)):
            st = stages[si]
            bexp = _TBLOCKS[st.block][1]
            cur = [c * bexp for c in st.num_channels]
            trans = []
            for i in range(len(cur)):
                if i < len(prev):
                    if cur[i] != prev[i]:
                        trans.append(
                            nn.Sequential(
                                nn.Conv2d(prev[i], cur[i], 3, 1, 1, bias=False),
                                nn.BatchNorm2d(cur[i]),
                                nn.ReLU(),
                            )
                        )
                    else:
                        trans.append(nn.Identity())
                else:
                    steps = []
                    ch = prev[-1]
                    for j in range(i + 1 - len(prev)):
                        co = cur[i] if j == i - len(prev) else ch
                        steps.append(
                            nn.Sequential(
                                nn.Conv2d(ch, co, 3, 2, 1, bias=False),
                                nn.BatchNorm2d(co),
                                nn.ReLU(),
                            )
                        )
                        ch = co
                    trans.append(nn.Sequential(*steps))
            setattr(self, f"transition{si}", nn.ModuleList(trans))
            mods = []
            cin_list = cur
            for _ in range(st.num_modules):
                m = THRModule(st, cin_list)
                cin_list = m.out_channels
                mods.append(m)
            setattr(self, f"stage{si + 1}", nn.Sequential(*mods))
            prev = cin_list

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        for si in range(1, len(self._stages)):
            trans = getattr(self, f"transition{si}")
            cur = []
            for i, t in enumerate(trans):
                src = xs[i] if i < len(xs) else xs[-1]
                cur.append(t(src))
            for m in getattr(self, f"stage{si + 1}"):
                cur = m(cur)
            xs = cur
        return xs[0]
