"""Shape/finiteness tests for the Flax models (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.config import BackboneConfig, tiny_vernier_config
from snvc_tpu.models.fc_model import FCModel
from snvc_tpu.models.hrnet import HRNet
from snvc_tpu.models.layers import avg_pool_height, pixel_shuffle_2d
from snvc_tpu.models.vernier import VernierScale


@pytest.fixture(scope="module")
def tiny_backbone():
    return BackboneConfig(name="hrnet-tiny")


class TestLayers:
    def test_pixel_shuffle_matches_torch(self, rng):
        import torch

        x = rng.standard_normal((1, 3, 4, 8)).astype(np.float32)
        got = np.asarray(pixel_shuffle_2d(jnp.array(x), 2))
        want = (
            torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, atol=0)

    def test_avg_pool_height(self, rng):
        x = rng.standard_normal((2, 8, 3, 3, 4)).astype(np.float32)
        got = np.asarray(avg_pool_height(jnp.array(x), 4))
        assert got.shape == (2, 2, 3, 3, 4)
        np.testing.assert_allclose(got[0, 0], x[0, :4].mean(axis=0), atol=1e-6)


class TestHRNet:
    def test_default_head_stride4(self, tiny_backbone, rng):
        model = HRNet(tiny_backbone, head_type="default")
        x = jnp.array(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(vars_, x)
        assert y.shape == (1, 16, 16, 8)  # stride 4, width = stage2 ch[0]
        assert np.all(np.isfinite(np.asarray(y)))

    def test_heatmap_regression_head(self, tiny_backbone, rng):
        model = HRNet(tiny_backbone, head_type="heatmap_regression", num_heatmaps=9)
        x = jnp.array(rng.standard_normal((1, 16, 16, 64)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(vars_, x)
        # pixel-shuffle x2 on the highest-res branch
        assert y.shape == (1, 32, 32, 9)

    def test_train_mode_updates_batch_stats(self, tiny_backbone, rng):
        model = HRNet(tiny_backbone, head_type="default")
        x = jnp.array(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=True)
        y, mutated = model.apply(vars_, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in mutated
        assert y.shape[0] == 2


class TestFCModel:
    def test_shape(self, rng):
        m = FCModel(num_blocks=1, num_neurons=32, output_size=5)
        x = jnp.array(rng.standard_normal((4, 18)).astype(np.float32))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == (4, 5)


class TestVernier:
    def _run(self, cfg, rng):
        model = VernierScale(cfg)
        N = 2
        H, W = cfg.resolution
        nh, nw, nl = cfg.grid_resolution
        P = nh * nw * nl
        left = jnp.array(rng.standard_normal((N, H, W, 3)).astype(np.float32))
        right = jnp.array(rng.standard_normal((N, H, W, 3)).astype(np.float32))
        pl = jnp.array(rng.uniform(0, W, size=(N, P, 2)).astype(np.float32))
        pr = jnp.array(rng.uniform(0, W, size=(N, P, 2)).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), left, right, pl, pr)
        out = model.apply(vars_, left, right, pl, pr)
        return out

    def test_bev_type3(self, rng):
        cfg = tiny_vernier_config()
        out = self._run(cfg, rng)
        nh, nw, nl = cfg.grid_resolution
        assert out["ncf"].shape == (2, cfg.num_parts, nl, nw)
        assert out["occupancy"].shape == (2, nh, nw, nl)
        assert out["coordinates"].shape == (2, cfg.num_parts, 2)
        occ = np.asarray(out["occupancy"])
        assert occ.min() >= 0.0 and occ.max() <= 1.0
        coords = np.asarray(out["coordinates"])
        assert coords.min() >= 0.0 and coords.max() <= 1.0
        assert np.all(np.isfinite(np.asarray(out["ncf"])))

    def test_bev_type3_with_heads(self, rng):
        cfg = tiny_vernier_config(use_bbox_head=True, use_part_reg_head=True)
        out = self._run(cfg, rng)
        nh, nw, nl = cfg.grid_resolution
        assert out["bbox"].shape == (2, 5)
        assert out["offset"].shape == (2, 27, nh, nw, nl)

    def test_bev_type2(self, rng):
        cfg = tiny_vernier_config(vernier_type="BEV_type2")
        out = self._run(cfg, rng)
        nh, nw, nl = cfg.grid_resolution
        assert out["ncf"].shape == (2, cfg.num_parts, nl, nw)
        assert out["coordinates"] is None

    def test_3d_variant(self, rng):
        cfg = tiny_vernier_config(vernier_type="3D", num_parts=1)
        out = self._run(cfg, rng)
        nh, nw, nl = cfg.grid_resolution
        assert out["ncf"].shape == (2, 1, nh, nw, nl)

    def test_concat_atten_encoder(self, rng):
        """feature_aggregation='concat-atten' gates the voxel by the clamped
        cosine similarity of the two view halves (vernier.py:341-344):
        identical views pass through (cos=1); the gated voxel never has a
        larger magnitude than plain concat."""
        from snvc_tpu.models.vernier import VernierEncoder

        cfg = tiny_vernier_config()
        cfg_att = cfg.replace(feature_aggregation="concat-atten")
        N = 1
        H, W = cfg.resolution
        nh, nw, nl = cfg.grid_resolution
        P = nh * nw * nl
        left = jnp.array(rng.standard_normal((N, H, W, 3)).astype(np.float32))
        right = jnp.array(rng.standard_normal((N, H, W, 3)).astype(np.float32))
        pl = jnp.array(rng.uniform(0, W, size=(N, P, 2)).astype(np.float32))
        enc = VernierEncoder(cfg)
        enc_att = VernierEncoder(cfg_att)
        v = enc.init(jax.random.PRNGKey(0), left, right, pl, pl)
        plain = np.asarray(enc.apply(v, left, right, pl, pl))
        gated = np.asarray(enc_att.apply(v, left, right, pl, pl))
        assert gated.shape == plain.shape
        assert np.all(np.abs(gated) <= np.abs(plain) + 1e-5)
        # same image + same projections -> identical halves -> cos = 1
        same = np.asarray(enc_att.apply(v, left, left, pl, pl))
        ref = np.asarray(enc.apply(v, left, left, pl, pl))
        np.testing.assert_allclose(same, ref, atol=1e-5)
        # distinct views must actually attenuate somewhere
        assert np.abs(gated).sum() < np.abs(plain).sum()

    def test_bev_variant(self, rng):
        cfg = tiny_vernier_config(vernier_type="BEV")
        out = self._run(cfg, rng)
        nh, nw, nl = cfg.grid_resolution
        # heatmap-regression HRNet upsamples the strided BEV map back to
        # (nl, nw)
        assert out["ncf"].shape[:2] == (2, cfg.num_parts)
        assert out["occupancy"].shape == (2, nh, nw, nl)

    def test_deep_hourglass_path(self, rng):
        # n_sample_w > 16 selects the 1/16 hourglass variants
        cfg = tiny_vernier_config(grid_resolution=(8, 32, 32), resolution=(64, 64))
        out = self._run(cfg, rng)
        assert out["ncf"].shape == (2, cfg.num_parts, 32, 32)


class TestConv3dDecomposition:
    """The depth-tap decomposition must match flax's native Conv3D exactly
    across the stride/dilation variants the models use."""

    @pytest.mark.parametrize(
        "kernel,stride,dilation",
        [
            ((3, 3, 3), (1, 1, 1), 1),
            ((7, 7, 7), (1, 1, 1), 1),
            ((5, 5, 5), (1, 1, 1), 2),
            ((3, 3, 3), (2, 2, 2), 1),
            ((3, 3, 3), (2, 1, 1), 1),
            ((1, 1, 1), (1, 1, 1), 1),
            # even kernel with dilation: (k-1)//2*dil (=0) differs from
            # ((k-1)*dil)//2 (=1) — pins the uniform torch convention
            ((2, 2, 2), (1, 1, 1), 3),
        ],
    )
    # "always" must also be safe on every variant: depth-strided convs
    # (Hourglass downs, vernier compress) fall back to the per-tap path
    # rather than applying the unit-depth-stride fold formulation
    @pytest.mark.parametrize(
        "fold,fold_out",
        [
            ("never", "never"),  # per-tap baseline
            ("auto", "never"),
            ("always", "never"),
            ("never", "auto"),  # output-side fold (MXU-lane fill)
            ("never", "always"),
        ],
    )
    def test_matches_native_conv3d(self, rng, kernel, stride, dilation,
                                   fold, fold_out):
        """Reference point: native Conv3D with the torch-symmetric padding
        ((k-1)//2 * dil per side, the same formula as ConvNorm / torch
        Conv3d(pad=(k-1)//2*d)); equals SAME at stride 1 and the torch
        alignment at stride 2.  Covers the per-depth-tap, channel-folded
        (single big-input conv2d), and output-folded (kd*F-wide conv2d +
        shifted depth sum) formulations."""
        from flax import linen as nn
        from snvc_tpu.models.layers import Conv3d

        x = jnp.asarray(rng.standard_normal((2, 8, 10, 12, 6)), jnp.float32)
        mod = Conv3d(4, kernel, stride, dilation, fold_depth=fold,
                     fold_output=fold_out)
        v = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(v, x)
        pad = tuple(((k - 1) // 2 * dilation,) * 2 for k in kernel)
        ref = nn.Conv(4, kernel, strides=stride, padding=pad,
                      kernel_dilation=(dilation,) * 3, use_bias=False)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_conv3d_matches_torch_strided(self, rng):
        """End-to-end torch parity for the strided case that SAME padding
        gets wrong (one-voxel shift)."""
        import torch

        from snvc_tpu.models.layers import Conv3d
        from snvc_tpu.utils.convert_torch import conv3d_kernel

        tm = torch.nn.Conv3d(6, 4, 3, stride=2, padding=1, bias=False)
        x = rng.standard_normal((1, 6, 8, 10, 12)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        mod = Conv3d(4, (3, 3, 3), (2, 2, 2))
        got = mod.apply(
            {"params": {"kernel": jnp.asarray(conv3d_kernel(tm.weight.detach().numpy()))}},
            jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        )
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize(
        "kernel,stride,dilation",
        [
            ((3, 3, 3), (1, 1, 1), 1),
            ((7, 7, 7), (1, 1, 1), 1),  # the flagship conv1_k7 shape class
            ((3, 3, 3), (1, 1, 1), 2),
            ((3, 3, 3), (2, 2, 2), 1),  # depth-strided: falls back per-tap
        ],
    )
    def test_group_taps_matches_native(self, rng, kernel, stride, dilation):
        """The grouped-tap single-GEMM formulation (feature_group_count=kd)
        must equal native Conv3D; "always" must also be safe on
        depth-strided convs via the per-tap fallback."""
        from flax import linen as nn
        from snvc_tpu.models.layers import Conv3d

        x = jnp.asarray(rng.standard_normal((2, 8, 10, 12, 6)), jnp.float32)
        mod = Conv3d(4, kernel, stride, dilation, group_taps="always")
        v = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(v, x)
        pad = tuple(((k - 1) // 2 * dilation,) * 2 for k in kernel)
        ref = nn.Conv(4, kernel, strides=stride, padding=pad,
                      kernel_dilation=(dilation,) * 3, use_bias=False)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_tap_accum_compute_dtype(self, rng):
        """tap_accum="compute" keeps the cross-tap sum in the compute dtype;
        in f32 that is exactly the f32-accum result, and in bf16 it must
        stay within bf16 resolution of the f32-accum reference."""
        from snvc_tpu.models.layers import Conv3d

        x32 = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 6)), jnp.float32)
        ref_mod = Conv3d(4, (3, 3, 3))
        v = ref_mod.init(jax.random.PRNGKey(0), x32)
        want = ref_mod.apply(v, x32)
        got = Conv3d(4, (3, 3, 3), tap_accum="compute").apply(v, x32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
        bf_ref = Conv3d(4, (3, 3, 3), dtype=jnp.bfloat16).apply(
            v, x32.astype(jnp.bfloat16)
        )
        bf_got = Conv3d(4, (3, 3, 3), dtype=jnp.bfloat16,
                        tap_accum="compute").apply(v, x32.astype(jnp.bfloat16))
        scale = float(jnp.max(jnp.abs(bf_ref.astype(jnp.float32))))
        delta = float(jnp.max(jnp.abs(
            bf_got.astype(jnp.float32) - bf_ref.astype(jnp.float32)
        )))
        assert delta / scale < 0.02

    def test_fold_formulation_grads_match(self, rng):
        """All the exact formulations must agree in the BACKWARD pass
        too (training can run with any of them via the env hatches)."""
        from snvc_tpu.models.layers import Conv3d

        x = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 6)), jnp.float32)
        grads = {}
        for name, kw in [
            ("per_tap", {}),
            ("fold_depth", {"fold_depth": "always"}),
            ("fold_out", {"fold_output": "always"}),
            ("group_taps", {"group_taps": "always"}),
        ]:
            mod = Conv3d(4, (3, 3, 3), **kw)
            v = mod.init(jax.random.PRNGKey(0), x)

            def loss(params, xx):
                return jnp.sum(mod.apply({"params": params}, xx) ** 2)

            gw, gx = jax.grad(loss, argnums=(0, 1))(v["params"], x)
            grads[name] = (np.asarray(gw["kernel"]), np.asarray(gx))
        for name in ("fold_depth", "fold_out", "group_taps"):
            np.testing.assert_allclose(
                grads[name][0], grads["per_tap"][0], atol=1e-3
            )
            np.testing.assert_allclose(
                grads[name][1], grads["per_tap"][1], atol=1e-3
            )

    def test_convtranspose3d_fast_matches_native(self, rng):
        """The 8-parity subpixel decomposition equals flax's native
        ConvTranspose(k3, s2, pad (1,2)) — the torch (p=1, op=1)
        alignment — bit-for-bit in f32."""
        from flax import linen as nn
        from snvc_tpu.models.layers import ConvTranspose3dFast

        x = jnp.asarray(rng.standard_normal((2, 4, 6, 5, 6)), jnp.float32)
        mod = ConvTranspose3dFast(4)
        v = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(v, x)
        ref = nn.ConvTranspose(4, (3, 3, 3), strides=(2, 2, 2),
                               padding=((1, 2),) * 3, use_bias=False)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert got.shape == want.shape == (2, 8, 12, 10, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_convtranspose3d_fast_matches_torch(self, rng):
        """End-to-end torch parity: a torch ConvTranspose3d(k3,s2,p1,op1)
        weight converted via conv_transpose3d_kernel (spatial flip) loaded
        into ConvTranspose3dFast reproduces the torch output exactly."""
        import torch
        from snvc_tpu.models.layers import ConvTranspose3dFast
        from snvc_tpu.utils.convert_torch import conv_transpose3d_kernel

        tm = torch.nn.ConvTranspose3d(6, 4, 3, stride=2, padding=1,
                                      output_padding=1, bias=False)
        x = rng.standard_normal((2, 6, 4, 6, 5)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()  # NCDHW
        k = conv_transpose3d_kernel(tm.weight.detach().numpy())
        mod = ConvTranspose3dFast(4)
        got = mod.apply({"params": {"kernel": jnp.asarray(k)}},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        assert got.shape == want.shape == (2, 4, 8, 12, 10)
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("shape,groups", [((2, 6, 8, 16), 8),
                                              ((2, 4, 6, 8, 32), 32),
                                              ((3, 5, 12), 4)])
    def test_fast_group_norm_matches_flax(self, rng, shape, groups):
        from flax import linen as nn
        from snvc_tpu.models.layers import FastGroupNorm

        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        mod = FastGroupNorm(groups)
        v = mod.init(jax.random.PRNGKey(0), x)
        # non-trivial affine params
        v = {"params": {
            "scale": jnp.asarray(rng.uniform(0.5, 2.0, shape[-1]), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32),
        }}
        got = mod.apply(v, x)
        ref = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        want = ref.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


class TestAddXY:
    def test_add_xy_changes_input_channels_only(self, rng):
        """add_xy appends normalized coordinate maps before the stem
        (reference hrnet.py:550-560): output shape is unchanged, but the
        network becomes translation-variant (same crop content at a
        different position yields different features)."""
        from snvc_tpu.config import BackboneConfig
        from snvc_tpu.models.hrnet import HRNet

        cfg = BackboneConfig(name="hrnet-tiny", add_xy=True)
        model = HRNet(cfg, head_type="default")
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(v, x)
        assert y.shape[1:3] == (16, 16)
        # first conv kernel sees 5 input channels
        stem_kernel = jax.tree_util.tree_leaves(
            {k: p for k, p in v["params"].items() if k == "Conv_0"}
        )[0]
        assert stem_kernel.shape[2] == 5

    def test_roi_xy_maps_are_global_frame(self):
        """The xy channels must encode the ROI's position in the GLOBAL
        image ([-1, 1] coords, reference img_proc.generate_xy_map:184-198)
        — two different crops of the same image get different maps."""
        from snvc_tpu.geometry.imgproc import crop_affine
        from snvc_tpu.ops.assemble import roi_xy_maps

        H, W = 384, 1280
        # crop boxes [cx, cy, size] -> affines mapping source -> 32x32 ROI
        t1 = crop_affine(np.array([200.0, 100.0]), np.array([128.0, 128.0]), (32, 32))
        t2 = crop_affine(np.array([900.0, 300.0]), np.array([64.0, 64.0]), (32, 32))
        maps = np.asarray(
            roi_xy_maps(np.stack([t1, t2]), (32, 32), (H, W))
        )
        assert maps.shape == (2, 32, 32, 2)
        # ROI center pixel maps to the crop center's global coords
        c1 = maps[0, 16, 16]
        np.testing.assert_allclose(
            c1, [2 * 200.0 / W - 1, 2 * 100.0 / H - 1], atol=0.05
        )
        c2 = maps[1, 16, 16]
        np.testing.assert_allclose(
            c2, [2 * 900.0 / W - 1, 2 * 300.0 / H - 1], atol=0.05
        )
        assert not np.allclose(maps[0], maps[1])

    def test_assemble_appends_xy_channels(self, rng):
        """With add_xy the assembled ROIs carry 5 channels whose xy halves
        match roi_xy_maps of the instance's crop affine."""
        import jax.numpy as jnp

        from snvc_tpu.config import BackboneConfig, tiny_vernier_config
        from snvc_tpu.ops.assemble import assemble_instances, make_grid_local, roi_xy_maps
        from snvc_tpu.data.synthetic import synthetic_batch_arrays

        cfg = tiny_vernier_config(
            backbone=BackboneConfig(name="hrnet-tiny", add_xy=True),
            image_size=(128, 256),
        )
        arrays = synthetic_batch_arrays(cfg, seed=0)
        left, right, _, _ = assemble_instances(
            jnp.asarray(arrays["images_left"]),
            jnp.asarray(arrays["images_right"]),
            jnp.asarray(arrays["image_idx"]),
            jnp.asarray(arrays["trans_l"]),
            jnp.asarray(arrays["trans_r"]),
            jnp.asarray(arrays["samples"]),
            jnp.asarray(arrays["P_left"]),
            jnp.asarray(arrays["P_right"]),
            jnp.asarray(make_grid_local(cfg)),
            cfg,
        )
        assert left.shape[-1] == 5 and right.shape[-1] == 5
        want = np.asarray(
            roi_xy_maps(arrays["trans_l"], cfg.resolution, cfg.image_size)
        )
        np.testing.assert_allclose(np.asarray(left[..., 3:]), want, atol=1e-5)
