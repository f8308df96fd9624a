"""Fully-connected residual model (reference snvc/models/FCmodel.py:7-104).

Maps the 9 BEV part coordinates (18-d) to a 5-d BEV box refinement when
used as the optional bbox head.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

Dtype = Any


class ResidualBlock(nn.Module):
    num_neurons: int
    p_dropout: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        y = nn.Dense(self.num_neurons, dtype=self.dtype)(x)
        y = nn.relu(bn(y))
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        y = nn.Dense(self.num_neurons, dtype=self.dtype)(y)
        y = nn.relu(bn(y))
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        return x + y


class FCModel(nn.Module):
    num_neurons: int = 1024
    num_blocks: int = 2
    p_dropout: float = 0.5
    output_size: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        y = nn.Dense(self.num_neurons, dtype=self.dtype)(x)
        y = nn.relu(bn(y))
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        for _ in range(self.num_blocks):
            y = ResidualBlock(self.num_neurons, self.p_dropout, dtype=self.dtype)(
                y, train
            )
        return nn.Dense(self.output_size, dtype=self.dtype)(y)
