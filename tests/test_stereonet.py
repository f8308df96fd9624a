"""Global stereo model tests: shapes, losses, decode roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.config import tiny_stereo_config
from snvc_tpu.geometry.calib import Calibration
from snvc_tpu.inference.detect import corners24_to_box3d, decode_proposals
from snvc_tpu.models.stereo_losses import (
    assign_targets,
    depth_sl1_loss,
    depth_w1_loss,
    gt_corners_24,
    rpn3d_loss,
)
from snvc_tpu.models.stereonet import StereoNet, bev_locations, depth_hypotheses
from snvc_tpu.ops.frustum import depth_plane_coords, frustum_to_voxel


@pytest.fixture(scope="module")
def cfg():
    return tiny_stereo_config()


@pytest.fixture(scope="module")
def stereo_out(cfg, ):
    rng = np.random.default_rng(0)
    model = StereoNet(cfg)
    H, W = cfg.input_size
    left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    Pl = jnp.asarray(Calibration.default().as_array()[None])
    Pr = jnp.asarray(Calibration.default_right().as_array()[None])
    variables = model.init(jax.random.PRNGKey(0), left, right, Pl, Pr)
    out = model.apply(variables, left, right, Pl, Pr)
    return cfg, out


class TestFrustum:
    def test_depth_plane_coords(self):
        depths = jnp.array([2.0, 4.0, 6.0, 8.0])
        d = depth_plane_coords(jnp.array([2.0, 5.0, 8.0, 100.0]), depths)
        np.testing.assert_allclose(np.asarray(d), [0.0, 1.5, 3.0, 3.0], atol=1e-6)

    def test_frustum_sampling_recovers_plane_values(self):
        """A volume constant per depth-plane sampled at voxels with known
        depth returns the plane value."""
        D, H, W, C = 4, 8, 8, 2
        depths = jnp.array([5.0, 10.0, 15.0, 20.0])
        vol = jnp.broadcast_to(
            jnp.arange(D, dtype=jnp.float32)[:, None, None, None], (D, H, W, C)
        )[None]
        P = jnp.asarray(Calibration.default().as_array()[None])
        # voxel at image center, depth 10 -> plane 1
        centers = jnp.array([[0.0, 1.0, 10.0]])
        # scale u, v into the feature map: use stride so coords land inside
        out = frustum_to_voxel(vol, P, depths, centers, feature_stride=160)
        np.testing.assert_allclose(np.asarray(out)[0, 0], [1.0, 1.0], atol=1e-5)

    def test_pallas_kernel_matches_xla(self):
        """The separable Pallas frustum kernel (interpret mode on CPU)
        agrees with the XLA gather formulation on a random volume."""
        from snvc_tpu.ops.frustum_pallas import frustum_to_voxel_pallas

        rng = np.random.default_rng(3)
        D, Hf, Wf, C = 6, 16, 24, 8
        nz, nx, ny = 10, 12, 4
        depths = np.linspace(4.0, 30.0, D).astype(np.float32)
        zs = (4.0 + (np.arange(nz) + 0.5) * 2.0).astype(np.float32)
        xs = (-6.0 + (np.arange(nx) + 0.5) * 1.0).astype(np.float32)
        ys = (-1.0 + (np.arange(ny) + 0.5) * 0.8).astype(np.float32)
        vol = rng.standard_normal((1, D, Hf, Wf, C)).astype(np.float32)
        P = np.array(
            [[80.0, 0, 48.0, 2.0], [0, 80.0, 32.0, -0.3], [0, 0, 1, 0.005]],
            np.float32,
        )
        got = np.asarray(
            frustum_to_voxel_pallas(
                jnp.asarray(vol), jnp.asarray(P[None]), depths,
                zs, xs, ys, feature_stride=4, interpret=True,
            )
        )
        gz, gx, gy = np.meshgrid(zs, xs, ys, indexing="ij")
        centers = jnp.asarray(
            np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
        )
        want = np.asarray(
            frustum_to_voxel(
                jnp.asarray(vol), jnp.asarray(P[None]),
                jnp.asarray(depths), centers, feature_stride=4,
            )
        ).reshape(1, nz, nx, ny, C)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_pallas_kernel_v2_matches_v1(self):
        """The chunked MXU-shaped v2 kernel equals v1 (interpret mode)."""
        from snvc_tpu.ops.frustum_pallas import (
            frustum_to_voxel_pallas,
            frustum_to_voxel_pallas_v2,
        )

        rng = np.random.default_rng(5)
        D, Hf, Wf, C = 6, 16, 24, 8
        nz, nx, ny = 10, 12, 4
        depths = np.linspace(4.0, 30.0, D).astype(np.float32)
        zs = (4.0 + (np.arange(nz) + 0.5) * 2.0).astype(np.float32)
        xs = (-6.0 + (np.arange(nx) + 0.5) * 1.0).astype(np.float32)
        ys = (-1.0 + (np.arange(ny) + 0.5) * 0.8).astype(np.float32)
        vol = rng.standard_normal((1, D, Hf, Wf, C)).astype(np.float32)
        P = np.array(
            [[80.0, 0, 48.0, 2.0], [0, 80.0, 32.0, -0.3], [0, 0, 1, 0.005]],
            np.float32,
        )
        a = np.asarray(frustum_to_voxel_pallas(
            jnp.asarray(vol), jnp.asarray(P[None]), depths, zs, xs, ys, 4,
            interpret=True,
        ))
        b = np.asarray(frustum_to_voxel_pallas_v2(
            jnp.asarray(vol), jnp.asarray(P[None]), depths, zs, xs, ys, 4,
            interpret=True, chunk=64,
        ))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_img_to_bev_matches_grid_sample(self, cfg):
        """The separable-matmul image->BEV projection equals the explicit
        grid-sample formulation (zeros padding, align_corners=False)."""
        from snvc_tpu.models.stereonet import frustum_img_to_bev
        from snvc_tpu.ops.grid_sample import grid_sample_2d

        rng = np.random.default_rng(1)
        nz, nx = cfg.bev_size
        f = jnp.asarray(rng.standard_normal((1, 12, 40, 6)), jnp.float32)
        P = jnp.asarray(Calibration.default().as_array()[None])
        got = np.asarray(frustum_img_to_bev(f, P, cfg))

        locs = bev_locations(cfg)
        y = cfg.anchors_y[0]
        pts = np.concatenate(
            [locs[:, :1], np.full((len(locs), 1), y, np.float32), locs[:, 1:]],
            axis=1,
        )
        uvw = pts @ np.asarray(P[0, :, :3]).T + np.asarray(P[0, :, 3])
        u = uvw[:, 0] / uvw[:, 2] / 4.0
        v = uvw[:, 1] / uvw[:, 2] / 4.0
        Hf, Wf = 12, 40
        grid = jnp.asarray(
            np.stack([(2 * u + 1) / Wf - 1.0, (2 * v + 1) / Hf - 1.0], axis=-1)[
                None
            ],
            jnp.float32,
        )
        want = np.asarray(grid_sample_2d(f, grid)).reshape(1, nz, nx, 6)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestProposalRoundTrip:
    def test_ideal_outputs_decode_to_gt(self):
        """Encode->decode fidelity: RPN outputs fabricated exactly from the
        target assigner (labels/reg/centerness) must decode back to the GT
        boxes — pins the corner layout, angle-bin slicing, anchor add, and
        heading conventions between stereo_losses.assign_targets and
        inference.detect.decode_proposals."""
        from snvc_tpu.inference.detect import decode_proposals
        from snvc_tpu.models.stereo_losses import assign_targets
        from snvc_tpu.models.stereonet import bev_locations

        cfg = tiny_stereo_config(z_max=38.0, max_depth=40.0)
        loc = jnp.asarray(bev_locations(cfg))
        A, K = cfg.num_angles, cfg.num_classes
        gt = jnp.asarray(
            np.array(
                [
                    [1.5, 1.7, 3.9, 1.2, 1.62, 21.0, 0.7],
                    [1.45, 1.6, 3.6, -3.0, 1.66, 14.0, -2.2],
                ],
                np.float32,
            )
        )
        labels, reg_t, ctr = assign_targets(
            loc, jnp.asarray(cfg.anchors_y), gt,
            jnp.array([True, True]), jnp.array([0, 0]), K,
            jnp.asarray(cfg.anchor_angles[:A]),
        )
        L = loc.shape[0]
        nz, nx = cfg.bev_size
        out = dict(
            cls=jnp.where(labels > 0, 8.0, -8.0).reshape(1, nz, nx, A * K),
            reg=jnp.broadcast_to(
                reg_t[:, None, :, :], (L, A, K, 24)
            ).reshape(1, nz, nx, A * K * 24),
            centerness=jnp.where(labels.sum(-1) > 0, 8.0, -8.0).reshape(
                1, nz, nx, A
            ),
        )
        boxes, scores, kcls, valid = jax.tree.map(
            np.asarray,
            decode_proposals(out, cfg, max_boxes=8, score_threshold=0.5,
                             nms_iou=0.25),
        )
        kept = boxes[0][valid[0]]
        assert len(kept) == 2
        assert np.all(kcls[0][valid[0]] == 0)
        for g in np.asarray(gt):
            d = np.linalg.norm(kept - g[None], axis=1)
            np.testing.assert_allclose(kept[d.argmin()], g, atol=1e-3)


class TestStereoNet:
    def test_output_shapes(self, stereo_out):
        cfg, out = stereo_out
        H, W = cfg.input_size
        D = cfg.num_depths
        nz, nx = cfg.bev_size
        A, K = cfg.num_angles, cfg.num_classes
        assert out["depth"].shape == (1, H // 4, W // 4)
        assert out["depth_prob"].shape == (1, D, H // 4, W // 4)
        assert out["cls"].shape == (1, nz, nx, A * K)
        assert out["reg"].shape == (1, nz, nx, A * K * 24)
        assert out["centerness"].shape == (1, nz, nx, A)
        for k in ("depth", "cls", "reg", "centerness"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k

    def test_depth_in_range(self, stereo_out):
        cfg, out = stereo_out
        d = np.asarray(out["depth"])
        assert d.min() >= cfg.min_depth - 1e-3
        assert d.max() <= cfg.max_depth + 1e-3


class TestTargetsAndLoss:
    def test_assignment_positive_inside(self, cfg):
        locations = jnp.asarray(bev_locations(cfg))
        gt = jnp.array([[1.5, 1.6, 3.8, 0.0, 1.65, 10.0, 0.0]])
        labels, reg, ctr = assign_targets(
            locations, jnp.asarray(cfg.anchors_y), gt, jnp.ones(1, bool),
            jnp.zeros(1, jnp.int32), cfg.num_classes,
            jnp.asarray(cfg.anchor_angles[: cfg.num_angles]),
        )
        pos = np.asarray(labels).sum(axis=(1, 2)) > 0
        locs = np.asarray(locations)
        # positives are exactly the cells inside the footprint
        inside = (np.abs(locs[:, 0] - 0.0) < 1.9) & (np.abs(locs[:, 1] - 10.0) < 0.8)
        assert pos.sum() > 0
        assert np.array_equal(pos, inside)
        # centerness peaks at the center cell
        c = np.asarray(ctr)
        assert c[pos].max() > c[pos].min()
        # reg target at a positive reconstructs the gt corners
        i = int(np.argmax(c))
        anchor = np.array([locs[i, 0], cfg.anchors_y[0], locs[i, 1]])
        corners = np.asarray(reg)[i, 0].reshape(8, 3) + anchor
        want = np.asarray(gt_corners_24(gt))[0]
        np.testing.assert_allclose(corners, want, atol=1e-5)

    def test_angle_bins_distinguish_orthogonal_yaws(self, cfg):
        """Two GTs at orthogonal yaws light up different angle bins
        (reference loss3d.py:188-199 per-(location, angle) labels); a
        yaw of pi (same orientation mod pi as 0) shares bin 0."""
        locations = jnp.asarray(bev_locations(cfg))
        angles = jnp.asarray(cfg.anchor_angles[: cfg.num_angles])
        gt = jnp.array(
            [
                [1.5, 1.6, 3.8, -4.0, 1.65, 10.0, 0.05],  # ~axis-aligned
                [1.5, 1.6, 3.8, 4.0, 1.65, 10.0, np.pi / 2 - 0.05],  # ~90deg
                [1.5, 1.6, 3.8, 0.0, 1.65, 15.0, np.pi],  # 180deg == bin 0
            ]
        )
        labels, _, _ = assign_targets(
            locations, jnp.asarray(cfg.anchors_y), gt, jnp.ones(3, bool),
            jnp.zeros(3, jnp.int32), cfg.num_classes, angles,
        )
        lab = np.asarray(labels)  # [L, A, K]
        locs = np.asarray(locations)
        near0 = np.abs(locs[:, 0] + 4.0) + np.abs(locs[:, 1] - 10.0) < 1.0
        near1 = np.abs(locs[:, 0] - 4.0) + np.abs(locs[:, 1] - 10.0) < 1.0
        near2 = np.abs(locs[:, 0]) + np.abs(locs[:, 1] - 15.0) < 1.0
        assert lab[near0][:, 0].sum() > 0 and lab[near0][:, 1].sum() == 0
        assert lab[near1][:, 1].sum() > 0 and lab[near1][:, 0].sum() == 0
        assert lab[near2][:, 0].sum() > 0 and lab[near2][:, 1].sum() == 0

    def test_per_class_anchor_heights(self, cfg):
        """With per-class anchors_y, the y components of the corner targets
        differ between classes by exactly the anchor height delta."""
        locations = jnp.asarray(bev_locations(cfg))
        gt = jnp.array([[1.5, 1.6, 3.8, 0.0, 1.65, 10.0, 0.0]])
        ay = jnp.array([1.65, 0.95])
        _, reg, _ = assign_targets(
            locations, ay, gt, jnp.ones(1, bool), jnp.zeros(1, jnp.int32), 2,
        )
        r = np.asarray(reg).reshape(-1, 2, 8, 3)
        np.testing.assert_allclose(
            r[:, 1, :, 1] - r[:, 0, :, 1], 1.65 - 0.95, atol=1e-5
        )
        # x/z targets are class-independent
        np.testing.assert_allclose(r[:, 1, :, 0], r[:, 0, :, 0], atol=1e-6)

    def test_rpn_loss_finite_and_supervised(self, cfg, stereo_out):
        _, out = stereo_out
        gt = jnp.array([[[1.5, 1.6, 3.8, 0.0, 1.65, 10.0, 0.3]]])
        locations = jnp.asarray(bev_locations(cfg))
        losses = rpn3d_loss(
            out, gt, jnp.ones((1, 1), bool), jnp.zeros((1, 1), jnp.int32),
            cfg, locations,
        )
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["num_pos"]) > 0

    def test_heading_symmetric_reg_loss(self, cfg, stereo_out):
        """reg_heading_sym makes the corner loss invariant to flipping any
        GT heading by pi (the bit BEV/3D IoU cannot see — on geometry
        alone it is unlearnable, and the asymmetric loss drives
        predictions toward the degenerate average of the two orderings),
        and it never exceeds the asymmetric loss."""
        _, out = stereo_out
        locations = jnp.asarray(bev_locations(cfg))
        gt = jnp.array([[[1.5, 1.6, 3.8, 0.0, 1.65, 10.0, 0.3]]])
        valid = jnp.ones((1, 1), bool)
        cls0 = jnp.zeros((1, 1), jnp.int32)
        scfg = cfg.replace(reg_heading_sym=True)
        r1 = rpn3d_loss(out, gt, valid, cls0, scfg, locations)["reg"]
        gt_flip = gt.at[..., 6].add(np.pi)
        r2 = rpn3d_loss(out, gt_flip, valid, cls0, scfg, locations)["reg"]
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-5)
        r_asym = rpn3d_loss(out, gt, valid, cls0, cfg, locations)["reg"]
        assert float(r1) <= float(r_asym) + 1e-7

    def test_depth_losses(self, cfg):
        rng = np.random.default_rng(0)
        gt = jnp.asarray(rng.uniform(5, 15, (1, 8, 8)), jnp.float32)
        pred = gt + 0.5
        mask = jnp.ones((1, 8, 8), bool)
        # |err| = 0.5 < beta=1 -> 0.5 * err^2 / beta = 0.125
        assert float(depth_sl1_loss(pred, gt, mask)) == pytest.approx(0.125, abs=1e-5)
        depths = jnp.asarray(depth_hypotheses(cfg))
        prob = jnp.full((1, cfg.num_depths, 8, 8), 1.0 / cfg.num_depths)
        w1 = float(depth_w1_loss(prob, depths, gt, mask))
        assert w1 > 0 and np.isfinite(w1)

    def test_multistage_sl1_weights(self, cfg):
        from snvc_tpu.models.stereo_losses import depth_multistage_sl1_loss

        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.uniform(5, 15, (1, 8, 8)), jnp.float32)
        pred = gt + 0.5
        mask = jnp.ones((1, 8, 8), bool)
        one = float(depth_sl1_loss(pred, gt, mask))
        # one stage == plain sl1; identical stages sum reference weights
        # 0.5/0.7/1.0 (loss3d.py:432-438)
        assert float(
            depth_multistage_sl1_loss((pred,), gt, mask)
        ) == pytest.approx(one, rel=1e-6)
        assert float(
            depth_multistage_sl1_loss((pred, pred, pred), gt, mask)
        ) == pytest.approx(2.2 * one, rel=1e-5)
        assert float(
            depth_multistage_sl1_loss((pred, pred), gt, mask)
        ) == pytest.approx(1.7 * one, rel=1e-5)

    def test_w1_offset_corrects_grid(self, cfg):
        """An offset that moves every hypothesis plane onto the GT zeroes
        the W1 loss regardless of the probability mass."""
        rng = np.random.default_rng(2)
        gt = jnp.asarray(rng.uniform(5, 15, (1, 4, 4)), jnp.float32)
        depths = jnp.asarray(depth_hypotheses(cfg))
        logits = jnp.asarray(rng.standard_normal((1, cfg.num_depths, 4, 4)))
        prob = jax.nn.softmax(logits, axis=1)
        offset = gt[:, None] - depths[None, :, None, None]
        mask = jnp.ones((1, 4, 4), bool)
        w1 = float(depth_w1_loss(prob, depths, gt, mask, offset=offset))
        assert w1 == pytest.approx(0.0, abs=1e-5)
        # and without the offset it is strictly positive
        assert float(depth_w1_loss(prob, depths, gt, mask)) > 0.1


class TestStackedHourglass:
    def test_stacked_outputs_and_single_stage_equivalence(self):
        """num_hourglasses=3 emits 3 intermediate depth maps whose final
        entry is out['depth']; num_hourglasses=1 keeps the original
        single-hourglass parameter tree (checkpoint compatibility)."""
        cfg1 = tiny_stereo_config()
        cfg3 = tiny_stereo_config(num_hourglasses=3, depth_offset=True)
        rng = np.random.default_rng(3)
        H, W = cfg1.input_size
        left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        Pl = jnp.asarray(Calibration.default().as_array()[None])
        Pr = jnp.asarray(Calibration.default_right().as_array()[None])

        m3 = StereoNet(cfg3)
        v3 = m3.init(jax.random.PRNGKey(0), left, right, Pl, Pr)
        out3 = m3.apply(v3, left, right, Pl, Pr)
        assert len(out3["depth_preds"]) == 3
        np.testing.assert_array_equal(
            np.asarray(out3["depth_preds"][-1]), np.asarray(out3["depth"])
        )
        D = cfg3.num_depths
        assert out3["depth_offset"].shape == (1, D, H // 4, W // 4)
        for dp in out3["depth_preds"]:
            assert np.all(np.isfinite(np.asarray(dp)))
        head3 = v3["params"]["head"]
        # three 3D hourglasses + one BEV hourglass; 3 cost classifiers
        # + 1 offset branch
        hg = [k for k in head3 if k.startswith("Hourglass_")]
        conv1 = [k for k in head3 if k.startswith("Conv3d_")]
        assert len(hg) == 4 and len(conv1) == 4

        m1 = StereoNet(cfg1)
        v1 = jax.eval_shape(
            lambda: m1.init(jax.random.PRNGKey(0), left, right, Pl, Pr)
        )
        head1 = v1["params"]["head"]
        # the original graph: Hourglass_0 (3D) / Hourglass_1 (BEV), one
        # cost classifier Conv3d_0 — old checkpoints load unchanged
        assert sorted(k for k in head1 if k.startswith("Hourglass_")) == [
            "Hourglass_0", "Hourglass_1",
        ]
        assert [k for k in head1 if k.startswith("Conv3d_")] == ["Conv3d_0"]

    def test_stacked_grads_reach_every_stage(self):
        """The multi-stage depth loss backpropagates into every stacked
        hourglass (intermediate supervision is not dead)."""
        from snvc_tpu.models.stereo_losses import depth_multistage_sl1_loss

        cfg = tiny_stereo_config(num_hourglasses=2, rpn3d_enable=False)
        rng = np.random.default_rng(4)
        H, W = cfg.input_size
        left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        Pl = jnp.asarray(Calibration.default().as_array()[None])
        Pr = jnp.asarray(Calibration.default_right().as_array()[None])
        model = StereoNet(cfg)
        variables = model.init(jax.random.PRNGKey(0), left, right, Pl, Pr)
        gt = jnp.full((1, H // 4, W // 4), 10.0)
        mask = jnp.ones_like(gt, bool)

        def loss(params):
            out = model.apply(
                dict(variables, params=params), left, right, Pl, Pr
            )
            return depth_multistage_sl1_loss(out["depth_preds"], gt, mask)

        grads = jax.grad(loss)(variables["params"])
        head = grads["head"]
        for name in ("Hourglass_0", "Hourglass_1", "Conv3d_0", "Conv3d_1"):
            leaves = jax.tree_util.tree_leaves(head[name])
            assert any(float(jnp.abs(g).max()) > 0 for g in leaves), name


class TestDecode:
    def test_corner_roundtrip(self):
        boxes = jnp.array(
            [
                [1.5, 1.7, 4.0, 2.0, 1.6, 20.0, 0.4],
                [1.4, 1.6, 3.6, -3.0, 1.7, 35.0, -2.0],
            ]
        )
        corners = gt_corners_24(boxes).reshape(2, 24)
        back = corners24_to_box3d(corners)
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-5)

    def test_decode_proposals_shapes(self, cfg, stereo_out):
        _, out = stereo_out
        boxes, scores, classes, valid = decode_proposals(out, cfg, max_boxes=16)
        assert boxes.shape == (1, 16, 7)
        assert scores.shape == (1, 16)
        assert classes.shape == (1, 16)
        assert np.all(np.isfinite(np.asarray(boxes)))


class TestBackboneOps:
    def test_avgpool_matches_nn(self, rng):
        import flax.linen as fnn
        from snvc_tpu.models.stereo_backbone import _avgpool

        x = jnp.asarray(rng.standard_normal((2, 96, 312, 8)), jnp.float32)
        for k in (8, 16, 32, 64):
            got = np.asarray(_avgpool(x, k))
            want = np.asarray(fnn.avg_pool(x, (k, k), strides=(k, k)))
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bilinear_resize_matches_torch_align_corners(self, rng):
        import torch
        import torch.nn.functional as F

        from snvc_tpu.models.stereo_backbone import _bilinear_resize

        for src in [(1, 4), (3, 9), (6, 19), (12, 39)]:
            x = rng.standard_normal((2, src[0], src[1], 5)).astype(np.float32)
            got = np.asarray(_bilinear_resize(jnp.asarray(x), (96, 312)))
            want = (
                F.interpolate(
                    torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    size=(96, 312), mode="bilinear", align_corners=True,
                )
                .numpy()
                .transpose(0, 2, 3, 1)
            )
            np.testing.assert_allclose(got, want, atol=2e-5), src
