"""Global-model training: pipeline batching + loss decreases."""

import numpy as np
import pytest

import jax

from snvc_tpu.config import TrainConfig, tiny_stereo_config
from snvc_tpu.data.kitti import KittiDataset
from snvc_tpu.data.stereo_pipeline import StereoPipeline, rasterize_depth
from snvc_tpu.data.synthetic import make_synthetic_kitti
from snvc_tpu.geometry.calib import Calibration
from snvc_tpu.models.stereonet import StereoNet
from snvc_tpu.training.train_stereo import create_stereo_state, make_stereo_train_step


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_stereo"))
    make_synthetic_kitti(root, num_frames=2, boxes_per_frame=2, seed=7)
    return root


def _cfg():
    # widen the depth/BEV range so the synthetic boxes (z in 12..35) are
    # inside the detection range
    return tiny_stereo_config(z_max=38.0, max_depth=40.0)


class TestStereoPipeline:
    def test_batch_shapes(self, kitti_root):
        cfg = _cfg()
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=2, max_gt=8)
        b = next(pipe.batches())
        H, W = cfg.input_size
        assert b.images_left.shape == (2, H, W, 3)
        assert b.gt_boxes.shape == (2, 8, 7)
        assert b.gt_valid.any()
        assert b.depth_gt.shape == (2, H // 4, W // 4)
        # images are downscaled (not cropped) to the tiny window, so the
        # LiDAR depth must actually land in it somewhere
        assert np.all((b.depth_gt == -1.0) | (b.depth_gt > 0))
        if b.gt_valid.any():
            assert (b.depth_gt > 0).any()

    def test_flip_augmentation_exact_geometry(self, kitti_root):
        """The stereo flip mirrors the WORLD and swaps mirrored views:
        (a) projecting a flipped GT center through the flipped P_left must
        land exactly at the content-mirrored pixel of the original center
        through the original P_RIGHT (new left view = mirrored old right),
        (b) flipped image content equals the mirrored swap, (c) the
        flipped pair keeps a positive plane-sweep baseline, (d) yaw maps
        ry -> pi - ry (footprint mirror)."""
        cfg = _cfg()
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=1, max_gt=8)
        b0 = pipe.make_batch([0], flips=[False])
        bf = pipe.make_batch([0], flips=[True])

        nh, nw = ds.scene(0).native_image_size()
        H, W = cfg.input_size
        s = min(H / nh, W / nw)
        wc = int(round(nw * s))

        def project(P, xyz):
            uvw = P @ np.append(xyz, 1.0)
            return uvw[:2] / uvw[2]

        n = int(b0.gt_valid[0].sum())
        assert n and int(bf.gt_valid[0].sum()) == n
        for i in range(n):
            g0, gf = b0.gt_boxes[0, i], bf.gt_boxes[0, i]
            np.testing.assert_allclose(gf[3], -g0[3], atol=1e-5)
            np.testing.assert_allclose(gf[[0, 1, 2, 4, 5]],
                                       g0[[0, 1, 2, 4, 5]], atol=1e-5)
            dyaw = (gf[6] - (np.pi - g0[6]) + np.pi) % (2 * np.pi) - np.pi
            assert abs(dyaw) < 1e-5
            c0 = g0[[3, 4, 5]] - [0, g0[0] / 2, 0]  # mid-height center
            cf = gf[[3, 4, 5]] - [0, gf[0] / 2, 0]
            u0, v0 = project(b0.P_right[0], c0)
            uf, vf = project(bf.P_left[0], cf)
            np.testing.assert_allclose(uf, (wc - 1) - u0, atol=1e-3)
            np.testing.assert_allclose(vf, v0, atol=1e-3)
        # (b) image content: new left = horizontally mirrored old right
        np.testing.assert_array_equal(
            bf.images_left[0][:, :wc], b0.images_right[0][:, wc - 1 :: -1]
        )
        # (c) positive baseline for the plane sweep
        def bx(P):
            return P[0, 3] / (-P[0, 0])
        assert bx(bf.P_right[0]) - bx(bf.P_left[0]) > 0
        # (d) LiDAR depth supervision still lands on the flipped raster
        assert (bf.depth_gt > 0).any()

    def test_rasterize_depth(self):
        cal = Calibration.default()
        pts = np.array([[0.0, 1.0, 20.0], [0.0, 1.0, 10.0]], np.float32)
        d = rasterize_depth(pts, cal.as_array(), (384, 1248))
        got = d[d > 0]
        # both points project to the same stride-4 cell: z-buffer keeps 10
        assert len(got) >= 1
        assert got.min() == pytest.approx(10.0, abs=1e-5)


class TestStereoTraining:
    def test_loss_decreases(self, kitti_root):
        cfg = _cfg()
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=1, max_gt=8)
        batch = next(pipe.batches()).arrays()
        model = StereoNet(cfg)
        state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        step = make_stereo_train_step(model, cfg, tc)
        losses = []
        for _ in range(4):
            state, m = step(state, batch)
            losses.append(float(m["total"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        assert float(m["num_pos"]) > 0


    def test_w1_offset_train_step_runs(self, kitti_root):
        """depth_loss='w1' + the learned per-plane offset branch must
        train end-to-end: finite losses, a finite gradient reaching the
        offset conv, and the split step agreeing with the monolithic one
        (the A/B recipe in ROADMAP runs exactly this config)."""
        from snvc_tpu.training.train_stereo import make_stereo_train_step_split

        cfg = _cfg().replace(depth_loss="w1", depth_offset=True,
                             num_hourglasses=2)
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=1, max_gt=8)
        batch = next(pipe.batches()).arrays()
        model = StereoNet(cfg)
        state_m = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        state_s = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        p0 = jax.tree_util.tree_map(np.asarray, state_m.params)
        mono = make_stereo_train_step(model, cfg, tc)
        split = make_stereo_train_step_split(model, cfg, tc)
        # two steps: the warmup schedule makes the very first update ~0
        for _ in range(2):
            state_m, mm = mono(state_m, batch)
            state_s, ms = split(state_s, batch)
            assert np.isfinite(float(mm["total"]))
            np.testing.assert_allclose(
                float(mm["total"]), float(ms["total"]), rtol=1e-4
            )
        # parameters must move under the w1+offset gradients
        after = jax.tree_util.tree_map(np.asarray, state_m.params)
        moved = [
            1
            for a, b in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(after))
            if a.shape == b.shape and not np.allclose(a, b)
        ]
        assert moved, "no parameter moved under the w1+offset step"

    def test_split_step_matches_monolithic(self, kitti_root):
        """The three-program split step (the TPU compile-time fix:
        encoder fwd | head value_and_grad | encoder vjp + update) computes
        exactly the fused step's gradients — same losses, same updated
        params, step after step."""
        from snvc_tpu.training.train_stereo import make_stereo_train_step_split

        cfg = _cfg()
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=1, max_gt=8)
        batch = next(pipe.batches()).arrays()
        model = StereoNet(cfg)
        state_s = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        state_m = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        split = make_stereo_train_step_split(model, cfg, tc)
        mono = make_stereo_train_step(model, cfg, tc)
        for _ in range(2):
            state_s, ms = split(state_s, batch)
            state_m, mm = mono(state_m, batch)
            np.testing.assert_allclose(
                float(ms["total"]), float(mm["total"]), rtol=1e-5
            )
            np.testing.assert_allclose(
                float(ms["grad_norm"]), float(mm["grad_norm"]), rtol=1e-4
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(state_s.params),
            jax.tree_util.tree_leaves(state_m.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )

    def test_split_matches_monolithic_with_photometric_aug(self, kitti_root):
        """With photometric_aug the jitter is keyed from state.step, so the
        split step's program-3 encoder rematerialization must reproduce
        program 1's jittered images bit-exactly — otherwise the encoder
        gradients silently diverge from the fused step's."""
        from snvc_tpu.training.train_stereo import make_stereo_train_step_split

        cfg = _cfg().replace(photometric_aug=True)
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=1, max_gt=8)
        batch = next(pipe.batches()).arrays()
        model = StereoNet(cfg)
        state_s = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        state_m = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        split = make_stereo_train_step_split(model, cfg, tc)
        mono = make_stereo_train_step(model, cfg, tc)
        # two steps: step 0 and step 1 draw different jitters
        totals = []
        for _ in range(2):
            state_s, ms = split(state_s, batch)
            state_m, mm = mono(state_m, batch)
            np.testing.assert_allclose(
                float(ms["total"]), float(mm["total"]), rtol=1e-5
            )
            np.testing.assert_allclose(
                float(ms["grad_norm"]), float(mm["grad_norm"]), rtol=1e-4
            )
            totals.append(float(ms["total"]))
        for a, b in zip(
            jax.tree_util.tree_leaves(state_s.params),
            jax.tree_util.tree_leaves(state_m.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_split_step_on_mesh(self, kitti_root):
        """Split programs accept the data-parallel mesh shardings."""
        from snvc_tpu.parallel.api import make_mesh
        from snvc_tpu.training.train_stereo import make_stereo_train_step_split

        cfg = _cfg()
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=2, max_gt=8)
        batch = next(pipe.batches()).arrays()
        mesh = make_mesh(n_data=2, n_model=1)
        model = StereoNet(cfg)
        state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        step = make_stereo_train_step_split(model, cfg, tc, mesh=mesh)
        state, m = step(state, batch)
        assert np.isfinite(float(m["total"]))

    def test_data_parallel_step_on_mesh(self, kitti_root):
        """The sharded stereo step runs on a data-parallel mesh and matches
        the unsharded step's loss on the same batch."""
        import jax.numpy as jnp

        from snvc_tpu.parallel.api import make_mesh

        cfg = _cfg()
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=2, max_gt=8)
        batch = next(pipe.batches()).arrays()
        mesh = make_mesh(n_data=2, n_model=1)
        model = StereoNet(cfg)
        state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        ref_state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        step = make_stereo_train_step(model, cfg, tc, mesh=mesh)
        ref_step = make_stereo_train_step(model, cfg, tc)
        state, m = step(state, batch)
        ref_state, ref_m = ref_step(ref_state, batch)
        assert np.isfinite(float(m["total"]))
        np.testing.assert_allclose(
            float(m["total"]), float(ref_m["total"]), rtol=1e-4
        )
        # params advanced identically (data-parallel grads are averaged)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(ref_state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_depth_tensor_parallel_step_matches_unsharded(self, kitti_root):
        """Depth-axis tensor parallelism (StereoHead.volume_sharding over
        the plane-sweep D axis, mesh data2 x model4): the sharded split
        train step must reproduce the unsharded step's loss and update —
        GSPMD partitions the 3D stack with halo exchange along D and
        psums the depth softmax, changing nothing numerically beyond
        reduction order."""
        from snvc_tpu.parallel.api import make_mesh
        from snvc_tpu.training.train_stereo import make_stereo_train_step_split

        cfg = _cfg()
        assert cfg.num_depths % 4 == 0
        tc = TrainConfig(lr=3e-4, warmup_steps=1, total_steps=20, grad_clip=5.0)
        ds = KittiDataset(kitti_root, "val")
        pipe = StereoPipeline(ds, cfg, batch_size=2, max_gt=8)
        batch = next(pipe.batches()).arrays()
        mesh = make_mesh(n_data=2, n_model=4)
        model = StereoNet(cfg)
        state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        ref_state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(0))
        step = make_stereo_train_step_split(model, cfg, tc, mesh=mesh)
        ref_step = make_stereo_train_step_split(model, cfg, tc)
        state, m = step(state, batch)
        ref_state, ref_m = ref_step(ref_state, batch)
        assert np.isfinite(float(m["total"]))
        np.testing.assert_allclose(
            float(m["total"]), float(ref_m["total"]), rtol=1e-4
        )
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(ref_state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestScaledLoading:
    def test_load_image_scaled_geometry(self, kitti_root):
        """Downscaled image + scaled projection keep a GT box's projected
        center at the same relative position (pinhole under uniform s)."""
        from snvc_tpu.geometry.calib import Calibration

        ds = KittiDataset(kitti_root, "val")
        scene = ds.scene(ds.indices[0])
        img, s = scene.load_image_scaled("left", (96, 312))
        assert img.shape == (96, 312, 3)
        assert 0 < s < 1
        native = scene.load_image("left")
        h, w = native.shape[:2]
        assert abs(s - min(96 / h, 312 / w)) < 1e-6
        cal = scene.calibration("left")
        P = np.diag([s, s, 1.0]).astype(np.float32) @ cal.as_array()
        pt = np.array([[0.0, 1.65, 15.0]], np.float32)
        uv_native = cal.rect_to_image(pt)[0]
        uvw = pt[0] @ P[:, :3].T + P[:, 3]
        uv_scaled = uvw[:2] / uvw[2]
        np.testing.assert_allclose(uv_scaled, uv_native * s, rtol=1e-5)

    def test_no_upscale_beyond_native(self, kitti_root):
        ds = KittiDataset(kitti_root, "val")
        scene = ds.scene(ds.indices[0])
        img, s = scene.load_image_scaled("left", (2000, 4000))
        assert s == 1.0 and img.shape == (2000, 4000, 3)
