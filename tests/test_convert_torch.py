"""Numerical parity of torch->flax weight conversion on live modules."""

import os

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

    def test_deconv_stack_parity(self, rng):
        """convert_module routes ConvTranspose targets through the flipped
        deconv converter — including the shape-ambiguous I==O case, where
        the torch conv and deconv weights both 'fit' the flax kernel shape
        but only the flipped deconv layout is numerically right."""
        import torch
        import torch.nn as tnn

        from snvc_tpu.models.layers import DeconvNorm

        class UpNet(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(6, (3, 3, 3), padding="SAME", use_bias=False,
                            name="Conv_0")(x)
                # I == O == 6: shape-ambiguous with a plain conv weight
                x = DeconvNorm(6, ndim=3, gn=True, groups=3)(x, train)
                return x

        tmodel = tnn.Sequential(
            tnn.Conv3d(6, 6, 3, padding=1, bias=False),
            tnn.ConvTranspose3d(6, 6, 3, stride=2, padding=1,
                                output_padding=1, bias=False),
            tnn.GroupNorm(3, 6),
        )
        tmodel.eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        model = UpNet()
        x = rng.standard_normal((1, 6, 4, 6, 5)).astype(np.float32)
        xs = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
        variables = model.init(jax.random.PRNGKey(0), xs)
        params, _ = convert_module(sd, variables["params"])
        got = model.apply({"params": params}, xs)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_checkpoint_loader(self, tmp_path, rng):
        import torch

        sd = {"conv.weight": torch.randn(4, 3, 3, 3)}
        path = str(tmp_path / "epoch_1.tar")
        torch.save({"state_dict": sd}, path)
        out = load_torch_checkpoint(path)
        assert out["conv.weight"].shape == (4, 3, 3, 3)


def _torchify_shape(path, shape):
    """Expected torch tensor shape for a flax leaf (inverse converters)."""
    if path[-1] == "kernel":
        if any("ConvTranspose" in p for p in path):
            return (shape[-2], shape[-1]) + tuple(shape[:-2])
        if len(shape) >= 3:
            return (shape[-1], shape[-2]) + tuple(shape[:-2])
        return (shape[1], shape[0])  # dense
    return tuple(shape)


class TestVernierCheckpointMap:
    def test_structural_roundtrip_zero_unmatched(self, rng):
        """A synthetic state_dict with the release checkpoint's module
        grouping (vimg_feat..hm2, coord_head, feat_net — reference
        vernier.py:26-56,249-313) converts with zero unmatched tensors on
        both sides, and tensors route to the right groups (a global greedy
        alignment would cross-wire the 2D backbone with the 3D head)."""
        from snvc_tpu.config import tiny_vernier_config
        from snvc_tpu.models.vernier import VernierScale
        from snvc_tpu.utils.convert_torch import (
            _flatten,
            convert_vernier_checkpoint,
            vernier_group_map,
        )

        cfg = tiny_vernier_config(use_part_reg_head=True, use_bbox_head=True)
        model = VernierScale(cfg)
        H, W = cfg.resolution
        nh, nw, nl = cfg.grid_resolution
        P = nh * nw * nl
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        gm = vernier_group_map(params, True, True)
        sd = {}
        suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
                  "mean": "running_mean", "var": "running_var"}
        for prefix, paths in gm.items():
            j = 0
            for root, child in paths:
                for path, leaf in _flatten(params[root][child]):
                    tshape = _torchify_shape((child,) + path, np.shape(leaf))
                    sd[f"{prefix}.{j}.{suffix[path[-1]]}"] = rng.standard_normal(
                        tshape
                    ).astype(np.float32)
                    j += 1
                sub_stats = (stats.get(root) or {}).get(child)
                if sub_stats:
                    for path, leaf in _flatten(sub_stats):
                        sd[f"{prefix}.{j}.{suffix[path[-1]]}"] = rng.standard_normal(
                            np.shape(leaf)
                        ).astype(np.float32)
                        j += 1
        # a buffer nothing should consume
        sd["feat_net.0.num_batches_tracked"] = np.zeros((), np.int64)

        new_params, new_stats = convert_vernier_checkpoint(
            sd, params, stats, use_part_reg_head=True, use_bbox_head=True
        )
        # zero unmatched either way: same leaf count, same shapes
        want_p = dict(_flatten(params))
        got_p = dict(_flatten(new_params))
        assert set(got_p) == set(want_p)
        for k in want_p:
            assert np.shape(got_p[k]) == np.shape(want_p[k]), k
        if stats:
            assert set(dict(_flatten(new_stats))) == set(dict(_flatten(stats)))

        # routing check: the hm2 group's single tensor landed on the head's
        # ncf output conv, not somewhere shape-compatible in the backbone
        (root, child), = gm["hm2"]
        leaf_path, _ = _flatten(params[root][child])[0]
        got_leaf = new_params[root][child]
        for k in leaf_path:
            got_leaf = got_leaf[k]
        src = sd["hm2.0.weight"]
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.transpose(src, (2, 3, 1, 0)), atol=0
        )

    def test_abstract_init_matches_eager_order_and_shapes(self):
        """abstract_init must reproduce the eager init's creation order and
        shapes with no compute — jit/lazy_init trees come back
        alphabetized (jax pytree dicts sort keys), which the converter
        rejects; this is the scale-safe template path."""
        import jax
        import jax.numpy as jnp

        from snvc_tpu.config import BackboneConfig
        from snvc_tpu.models.hrnet import HRNet
        from snvc_tpu.utils.convert_torch import _flatten, abstract_init

        model = HRNet(BackboneConfig(name="hrnet-tiny"), head_type="default")
        x = jnp.zeros((1, 32, 32, 3))
        eager = model.init(jax.random.PRNGKey(0), x)
        template = abstract_init(model, x)
        for col in eager:
            e = _flatten(eager[col], check_order=True)
            t = _flatten(template[col], check_order=True)
            assert [p for p, _ in e] == [p for p, _ in t]
            for (_, le), (_, lt) in zip(e, t):
                assert tuple(np.shape(le)) == tuple(np.shape(lt))
        # the jit tree really is alphabetized (the hazard is real)
        jit_tree = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        jit_keys = [p for p, _ in _flatten(jit_tree["params"])]
        eager_keys = [p for p, _ in _flatten(eager["params"])]
        assert jit_keys != eager_keys

    def test_alphabetized_tree_rejected(self, rng):
        """A deserialized (alphabetically re-sorted) param tree must be
        rejected, not silently cross-wired: Conv_10 sorting before Conv_2
        breaks the creation-order assumption the greedy aligner needs
        (utils/convert_torch._flatten)."""
        from snvc_tpu.utils.convert_torch import _flatten

        scrambled = {
            f"Conv_{i}": {"kernel": np.zeros((1, 1, 2, 2))}
            for i in [0, 1, 10, 11, 2, 3]  # alphabetical order of 0..11
        }
        with pytest.raises(ValueError, match="creation order"):
            _flatten(scrambled, check_order=True)
        # creation order passes
        ordered = {
            f"Conv_{i}": {"kernel": np.zeros((1, 1, 2, 2))}
            for i in range(12)
        }
        assert len(_flatten(ordered, check_order=True)) == 12
        # convert_module (the greedy aligner) rejects scrambled trees too
        from snvc_tpu.utils.convert_torch import convert_module

        sd = {f"c{i}.weight": np.zeros((1, 1, 2, 2)) for i in range(6)}
        with pytest.raises(ValueError, match="creation order"):
            convert_module(sd, scrambled)

    def test_missing_group_raises(self, rng):
        from snvc_tpu.config import tiny_vernier_config
        from snvc_tpu.models.vernier import VernierScale
        from snvc_tpu.utils.convert_torch import convert_vernier_checkpoint

        cfg = tiny_vernier_config()
        model = VernierScale(cfg)
        H, W = cfg.resolution
        nh, nw, nl = cfg.grid_resolution
        P = nh * nw * nl
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
        )
        with pytest.raises(ValueError, match="no tensors under"):
            convert_vernier_checkpoint(
                {"feat_net.0.weight": np.zeros((4, 3, 3, 3), np.float32)},
                variables["params"], variables.get("batch_stats", {}),
            )


class TestFullGraphVernierParity:
    """Full-graph VernierScale-vs-live-torch numeric parity: a real torch
    state_dict with the release module structure (tests/torch_vernier.py)
    converted by convert_vernier_checkpoint must reproduce the torch
    forward — grid-sampled stereo voxel, BEV_type3 3D/BEV stacks, NCF,
    occupancy, and the CoordHead through its (6, 4)-style valid kernel.
    This is the strongest epoch_80 substitute runnable without the
    blocked KITTI/checkpoint mount (reference docs/INFERENCE.md:9-12)."""

    @pytest.mark.parametrize(
        "backbone,grid,res",
        [
            # small always-on config; nw=32 > 16 selects the deep
            # hourglasses and the coord head still lands on a (6, 4) kernel
            ("hrnet-tiny", (16, 32, 48), (64, 64)),
            # the release-plausible config EXACTLY: hrnet-w32 (feature
            # width 32 -> conv5 input dim_height = (32/4)*32 = 256, the
            # only width the reference's hard-coded table accepts,
            # vernier.py:291-296), grid nl=192/nw=128 -> the hard-coded
            # (6, 4) coord kernel (vernier.py:83-91).  Minutes-slow on
            # CPU, so gated: SNVC_FULL_PARITY=1 pytest -k full_graph
            pytest.param(
                "hrnet-w32", (32, 128, 192), (256, 256),
                marks=pytest.mark.skipif(
                    not os.environ.get("SNVC_FULL_PARITY"),
                    reason="release-scale full-graph proof; "
                    "set SNVC_FULL_PARITY=1",
                ),
            ),
        ],
    )
    def test_full_graph_forward_parity(self, rng, backbone, grid, res):
        import torch

        from snvc_tpu.config import BackboneConfig, VernierConfig
        from snvc_tpu.models.vernier import VernierScale
        from snvc_tpu.utils.convert_torch import (
            abstract_init,
            convert_vernier_checkpoint,
        )
        from tests.torch_vernier import TVernier

        bcfg = BackboneConfig(name=backbone)
        feat_dim = bcfg.stages()[1].num_channels[0]
        cfg = VernierConfig(
            backbone=bcfg,
            vernier_type="BEV_type3",
            gn=False,  # convbn_3d default: BatchNorm3d (submodule.py:49)
            grid_resolution=grid,
            resolution=res,
            num_parts=9,
            compute_dtype="float32",
        )
        tmodel = TVernier(bcfg.stages(), feat_dim, grid, res, gn=False)
        tmodel.eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.8, 1.3)
                    m.weight.uniform_(0.7, 1.3)
                    m.bias.uniform_(-0.1, 0.1)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        model = VernierScale(cfg)
        H, W = res
        nh, nw, nl = grid
        P = nh * nw * nl
        x_l = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        x_r = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        # projections spread over the ROI with some points out of range
        # (exercises the zeros-padding parity of the samplers)
        gl = rng.uniform(-10, max(H, W) + 10, (1, P, 2)).astype(np.float32)
        gr = gl + rng.normal(0, 3, (1, P, 2)).astype(np.float32)

        template = abstract_init(
            model, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
        )
        params, stats = convert_vernier_checkpoint(
            sd, template["params"], template.get("batch_stats", {})
        )
        out = jax.jit(
            lambda v, a, b, c, d: model.apply(v, a, b, c, d)
        )({"params": params, "batch_stats": stats},
          jnp.asarray(x_l), jnp.asarray(x_r), jnp.asarray(gl), jnp.asarray(gr))

        with torch.no_grad():
            t_hm, t_occ, t_coord = tmodel(
                torch.from_numpy(x_l.transpose(0, 3, 1, 2)),
                torch.from_numpy(x_r.transpose(0, 3, 1, 2)),
                torch.from_numpy(gl),
                torch.from_numpy(gr),
            )
        np.testing.assert_allclose(
            np.asarray(out["ncf"]), t_hm.numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["occupancy"]), t_occ.numpy(), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["coordinates"]), t_coord.numpy(), atol=1e-3
        )


class TestHRNetBackboneParity:
    @pytest.mark.parametrize(
        "backbone",
        [
            "hrnet-tiny",
            # multi-module stages (num_modules 2/3/2, 4 branches): the
            # release w48/w32 enumeration class — within-stage repeated-
            # module ordering is exactly what creation-order alignment
            # must get right (reference hrnet.py:460-500)
            "hrnet-test-multi",
            # the release epoch_80 backbone EXACTLY (modules 1/1/4/3,
            # widths 48..384); minutes-slow on CPU so gated out of CI —
            # run once per converter change: SNVC_FULL_PARITY=1 pytest
            # tests/test_convert_torch.py -k w48
            pytest.param(
                "hrnet-w48",
                marks=pytest.mark.skipif(
                    not os.environ.get("SNVC_FULL_PARITY"),
                    reason="release-scale parity proof; set SNVC_FULL_PARITY=1",
                ),
            ),
        ],
    )
    def test_hrnet_statedict_converts_with_forward_parity(self, rng, backbone):
        """A LIVE torch HRNet (registered in the reference's module order:
        conv1, bn1, conv2, bn2, layer1, transition1, stage2, ...,
        tests/torch_hrnet.py) converts onto the flax HRNet by creation-
        order greedy alignment with exact forward parity — the end-to-end
        guarantee the epoch_80 'feat_net' group needs."""
        import torch

        from snvc_tpu.config import BackboneConfig
        from snvc_tpu.models.hrnet import HRNet
        from tests.torch_hrnet import THRNet

        cfg = BackboneConfig(name=backbone)
        tmodel = THRNet(cfg.stages())
        tmodel.eval()
        # nontrivial BN statistics everywhere
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.7, 1.4)
                    m.weight.uniform_(0.6, 1.4)
                    m.bias.uniform_(-0.2, 0.2)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        model = HRNet(cfg, head_type="default")
        x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params, stats = convert_module(
            sd, variables["params"], variables["batch_stats"]
        )
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x))
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)
