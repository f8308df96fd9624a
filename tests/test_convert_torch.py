"""Numerical parity of torch->flax weight conversion on live modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from snvc_tpu.utils.convert_torch import (
    conv2d_kernel,
    conv3d_kernel,
    convert_module,
    dense_kernel,
    load_torch_checkpoint,
    split_batchnorm,
)


class TestTensorConverters:
    def test_conv2d_parity(self, rng):
        import torch
        import torch.nn.functional as F

        w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
        x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        got = jax.lax.conv_general_dilated(
            jnp.array(np.transpose(x, (0, 2, 3, 1))),
            jnp.array(conv2d_kernel(w)),
            (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-4
        )

    def test_conv3d_parity(self, rng):
        import torch
        import torch.nn.functional as F

        w = rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32)
        x = rng.standard_normal((1, 2, 6, 6, 6)).astype(np.float32)
        want = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        got = jax.lax.conv_general_dilated(
            jnp.array(np.transpose(x, (0, 2, 3, 4, 1))),
            jnp.array(conv3d_kernel(w)),
            (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 4, 1, 2, 3)), want, atol=1e-4
        )

    def test_dense_parity(self, rng):
        import torch

        w = rng.standard_normal((5, 7)).astype(np.float32)
        b = rng.standard_normal(5).astype(np.float32)
        x = rng.standard_normal((3, 7)).astype(np.float32)
        want = (torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()
        got = np.asarray(jnp.array(x) @ jnp.array(dense_kernel(w)) + b)
        np.testing.assert_allclose(got, want, atol=1e-5)


class ConvBNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(4, (1, 1), padding="SAME", use_bias=True)(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(2)(x)


class TestModuleConversion:
    def test_conv_bn_dense_stack(self, rng):
        import torch
        import torch.nn as tnn

        tmodel = tnn.Sequential(
            tnn.Conv2d(3, 8, 3, padding=1, bias=False),
            tnn.BatchNorm2d(8),
            tnn.ReLU(),
            tnn.Conv2d(8, 4, 1, bias=True),
        )
        thead = tnn.Linear(4, 2)
        tmodel.eval()
        # seed BN stats with nontrivial values
        with torch.no_grad():
            tmodel[1].running_mean.uniform_(-0.5, 0.5)
            tmodel[1].running_var.uniform_(0.5, 1.5)
            tmodel[1].weight.uniform_(0.5, 1.5)
            tmodel[1].bias.uniform_(-0.2, 0.2)

        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        sd.update({f"head.{k}": v.detach().numpy() for k, v in thead.state_dict().items()})

        model = ConvBNNet()
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
        params, stats = convert_module(
            sd, variables["params"], variables["batch_stats"]
        )
        got = model.apply(
            {"params": params, "batch_stats": stats}, jnp.array(x)
        )
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            feat = tmodel(t).mean(dim=(2, 3))
            want = thead(feat).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_checkpoint_loader(self, tmp_path, rng):
        import torch

        sd = {"conv.weight": torch.randn(4, 3, 3, 3)}
        path = str(tmp_path / "epoch_1.tar")
        torch.save({"state_dict": sd}, path)
        out = load_torch_checkpoint(path)
        assert out["conv.weight"].shape == (4, 3, 3, 3)
