#!/usr/bin/env python
"""Per-stage timing of the global stereo model on the real TPU.

Times each stage as its own jitted program (backbone, cost volume, 3D
stack, depth head, frustum->BEV, BEV head) with elision-safe distinct
inputs, so the 3.0 s/frame budget (BENCH.md) is attributed precisely.
Only same-window A/B numbers are meaningful on this dev service (~40%
drift between windows) — run stages together in one invocation.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_list, warmup=2):
    """Median seconds per call over distinct-input calls."""
    import jax

    for a in args_list[:warmup]:
        jax.block_until_ready(fn(*a))
    ts = []
    for a in args_list[warmup:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from snvc_tpu.config import StereoConfig
    from snvc_tpu.geometry.calib import Calibration
    from snvc_tpu.models.layers import Conv3d, ConvNorm, ConvNorm3d, Hourglass
    from snvc_tpu.models.stereo_backbone import StereoFeatureNet
    from snvc_tpu.models.stereonet import (
        StereoNet,
        depth_hypotheses,
        frustum_img_to_bev,
    )
    from snvc_tpu.ops.cost_volume import build_cost_volume
    from snvc_tpu.ops.frustum_pallas import frustum_to_voxel_pallas
    from snvc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = StereoConfig(compute_dtype=args.dtype)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    H, W = cfg.input_size
    Hf, Wf = H // 4, W // 4
    D = cfg.num_depths
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def dput(x):
        return jax.device_put(jnp.asarray(x), dev)

    n = args.iters + 2
    imgs = [
        (dput(rng.standard_normal((1, H, W, 3)).astype(np.float32)),)
        for _ in range(n)
    ]
    report = {}

    # --- stage 1: backbone (runs twice per frame) -------------------------
    net = StereoFeatureNet(
        backbone=cfg.backbone, gn=cfg.gn, branch=cfg.branch,
        plane_sweep=True, rpn_feature=True, rpn_convdim=cfg.rpn_convdim,
        dtype=dt,
    )
    with jax.default_device(jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.devices("cpu")
    ) else dev):
        nv = jax.jit(net.init)(jax.random.PRNGKey(0), imgs[0][0], False)
    nv = jax.device_put(nv, dev)
    bb = jax.jit(lambda v, x: net.apply(v, x, False))
    report["backbone_ms"] = timed(lambda x: bb(nv, x), imgs) * 1e3

    feats = [
        (
            dput(rng.standard_normal((1, Hf, Wf, cfg.cv_feature_dim)).astype(dt)),
            dput(rng.standard_normal((1, Hf, Wf, cfg.cv_feature_dim)).astype(dt)),
        )
        for _ in range(n)
    ]
    shifts = dput(
        (707.0 * 0.54 / depth_hypotheses(cfg) / 4.0).astype(np.float32)
    )

    # --- stage 2: plane-sweep cost volume ---------------------------------
    cv = jax.jit(lambda l, r: build_cost_volume(l, r, shifts, 1))
    report["cost_volume_ms"] = timed(cv, feats) * 1e3

    # --- stage 3: 3D conv stack (2x ConvNorm3d + hourglass + residual) ----
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, vol):
            g = 32
            vol = nn.relu(ConvNorm3d(32, 3, gn=True, groups=g, dtype=dt)(vol, False))
            vol = nn.relu(ConvNorm3d(32, 3, gn=True, groups=g, dtype=dt)(vol, False))
            hg, _, _ = Hourglass(32, ndim=3, gn=True, dtype=dt)(vol, None, None, False)
            return vol + hg

    vols = [
        (dput(rng.standard_normal((1, D, Hf, Wf, 2 * cfg.cv_feature_dim)).astype(dt)),)
        for _ in range(n)
    ]
    stack = Stack()
    sv = jax.jit(stack.init)(jax.random.PRNGKey(0), vols[0][0])
    sfn = jax.jit(lambda v, x: stack.apply(v, x))
    report["stack3d_ms"] = timed(lambda x: sfn(sv, x), vols) * 1e3

    # --- stage 4: depth head (k3 Conv3d -> softmax expectation) ----------
    class DepthHead(nn.Module):
        @nn.compact
        def __call__(self, vol):
            cost = Conv3d(1, (3, 3, 3), dtype=dt)(vol)[..., 0].astype(jnp.float32)
            prob = jax.nn.softmax(cost, axis=1)
            depths = jnp.asarray(depth_hypotheses(cfg))
            return jnp.sum(prob * depths[None, :, None, None], axis=1), prob

    vols32 = [
        (dput(rng.standard_normal((1, D, Hf, Wf, 32)).astype(dt)),)
        for _ in range(n)
    ]
    dh = DepthHead()
    dv = jax.jit(dh.init)(jax.random.PRNGKey(0), vols32[0][0])
    dfn = jax.jit(lambda v, x: dh.apply(v, x))
    report["depth_head_ms"] = timed(lambda x: dfn(dv, x), vols32) * 1e3

    # --- stage 5: frustum -> voxel (pallas) -------------------------------
    nz, nx = cfg.bev_size
    ny = cfg.ny
    zs = cfg.z_min + (np.arange(nz) + 0.5) * cfg.voxel_z
    xs = cfg.x_min + (np.arange(nx) + 0.5) * cfg.voxel_x
    ys = cfg.y_min + (np.arange(ny) + 0.5) * cfg.voxel_y
    P = dput(Calibration.default().as_array()[None])
    fr = jax.jit(
        lambda v: frustum_to_voxel_pallas(
            v, P, depth_hypotheses(cfg), zs, xs, ys, 4
        )
    )
    report["frustum_ms"] = timed(fr, vols32) * 1e3

    # --- stage 6: BEV head ------------------------------------------------
    class BevHead(nn.Module):
        @nn.compact
        def __call__(self, bev, img_bev):
            g = 32
            bev = nn.relu(ConvNorm(64, 3, gn=True, groups=g, dtype=dt)(bev, False))
            bev = jnp.concatenate([bev, img_bev.astype(dt)], axis=-1)
            bev = nn.relu(ConvNorm(64, 3, gn=True, groups=g, dtype=dt)(bev, False))
            hg, _, _ = Hourglass(64, ndim=2, gn=True, dtype=dt)(bev, None, None, False)
            bev = bev + hg
            A, K = cfg.num_angles, cfg.num_classes
            return (
                nn.Conv(A * K, (3, 3), padding="SAME", dtype=dt)(bev),
                nn.Conv(A * K * 24, (3, 3), padding="SAME", dtype=dt)(bev),
                nn.Conv(A, (3, 3), padding="SAME", dtype=dt)(bev),
            )

    bevs = [
        (
            dput(rng.standard_normal((1, nz, nx, ny * 32)).astype(dt)),
            dput(rng.standard_normal((1, nz, nx, cfg.rpn_convdim)).astype(dt)),
        )
        for _ in range(n)
    ]
    bh = BevHead()
    bv = jax.jit(bh.init)(jax.random.PRNGKey(0), *bevs[0])
    bfn = jax.jit(lambda v, a, b: bh.apply(v, a, b))
    report["bev_head_ms"] = timed(lambda a, b: bfn(bv, a, b), bevs) * 1e3

    # --- full model (split-free reference point) --------------------------
    model = StereoNet(cfg)
    Pl = dput(Calibration.default().as_array()[None])
    Pr = dput(Calibration.default_right().as_array()[None])
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        mv = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0][0], imgs[0][0], Pl, Pr)
    mv = jax.device_put(mv, dev)
    mf = jax.jit(lambda v, l, r: model.apply(v, l, r, Pl, Pr))
    pairs = [
        (
            dput(rng.standard_normal((1, H, W, 3)).astype(np.float32)),
            dput(rng.standard_normal((1, H, W, 3)).astype(np.float32)),
        )
        for _ in range(n)
    ]
    report["full_model_ms"] = timed(lambda l, r: mf(mv, l, r), pairs) * 1e3

    accounted = (
        2 * report["backbone_ms"]
        + report["cost_volume_ms"]
        + report["stack3d_ms"]
        + report["depth_head_ms"]
        + report["frustum_ms"]
        + report["bev_head_ms"]
    )
    report["accounted_ms"] = accounted
    report = {k: round(v, 2) for k, v in report.items()}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
