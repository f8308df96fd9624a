#!/usr/bin/env python
"""Per-stage timing of the flagship Vernier refinement step on real TPU.

BENCH.md round-4 accounting shows the flagship at 14 % MFU / 45 % HBM —
not roofline-bound — so the next lever must come from knowing where the
~94 ms/instance-batch actually goes.  Times each stage as its own jitted
program with elision-safe distinct inputs (the same methodology as
tools/profile_stereo.py): the full encoder (HRNet on both ROI views +
voxel sampling) and each layer block of the BEV_type3 head (reference
vernier.py:249-313).

Only same-window comparisons are meaningful (±40 % service drift);
stage shares of the fused total are the useful output, not absolutes.

`--config tiny` is a CPU-runnable mechanics smoke (numbers meaningless).
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
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--config", default="flagship",
                   choices=["flagship", "small", "tiny"])
    args = p.parse_args()

    if args.config == "tiny":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build

    from snvc_tpu.models.hrnet import HRNet
    from snvc_tpu.models.layers import ConvNorm, ConvNorm3d, Hourglass, HourglassDeep
    from snvc_tpu.models.vernier import VernierEncoder
    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build(args.config)
    B = args.batch if args.config != "tiny" else 1
    nh, nw, nl = cfg.grid_resolution
    Hr, Wr = cfg.resolution
    dim = cfg.backbone.output_channel  # voxel carries 2*dim
    rng = np.random.default_rng(0)
    n = args.iters + 2
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def inputs(shape):
        return [
            (jnp.asarray(rng.standard_normal(shape), dt),) for _ in range(n)
        ]

    stages = {}

    def stage(name, mod, shape, nargs=2):
        x0 = jnp.asarray(rng.standard_normal(shape), dt)
        extra = (None, None) if nargs == 4 else ()
        prm = mod.init(jax.random.PRNGKey(0), x0, *extra, False)

        def fwd(x):
            y = mod.apply(prm, x, *extra, False)
            return y[0] if isinstance(y, tuple) else y

        t = timed(jax.jit(fwd), inputs(shape))
        stages[name] = round(t * 1000, 2)
        print(f"{name:28s} {t*1000:8.2f} ms", flush=True)

    g = cfg.gn_groups
    vox_shape = (B, nh, nw, nl, 2 * dim)
    mid_shape = (B, nh, nw, nl, dim)

    # --- head blocks (reference vernier.py:249-313 structure) ---------
    stage("head.conv1_k7 (2C->C)",
          ConvNorm3d(dim, 7, 1, 1, cfg.gn, g, dtype=dt), vox_shape)
    stage("head.conv2_k5", ConvNorm3d(dim, 5, 1, 1, cfg.gn, g, dtype=dt),
          mid_shape)
    stage("head.conv3_k5_d2", ConvNorm3d(dim, 5, 1, 2, cfg.gn, g, dtype=dt),
          mid_shape)
    if cfg.n_sample_w > 16:
        stage("head.hourglass3d",
              HourglassDeep(dim, ndim=3, gn=cfg.gn, dtype=dt), mid_shape)
        stage("head.hourglass2d",
              HourglassDeep(64, ndim=2, gn=cfg.gn, dtype=dt),
              (B, nw, nl, 64))
    else:
        stage("head.hourglass3d",
              Hourglass(dim, ndim=3, gn=cfg.gn, dtype=dt), mid_shape,
              nargs=4)
        stage("head.hourglass2d",
              Hourglass(64, ndim=2, gn=cfg.gn, dtype=dt), (B, nw, nl, 64),
              nargs=4)
    stage("head.occ_conv_k3", ConvNorm3d(dim, 3, 1, 1, cfg.gn, g, dtype=dt),
          mid_shape)
    stage("head.conv4_k3 (2C->C)",
          ConvNorm3d(dim, 3, 1, 1, cfg.gn, g, dtype=dt), vox_shape)
    stage("head.bev_conv",
          ConvNorm(64, 3, gn=cfg.gn, groups=g, dtype=dt),
          (B, nw, nl, max(nh // 4, 1) * dim))

    # --- encoder: HRNet (both views stacked) and the full voxel build --
    stage("enc.hrnet_2views", HRNet(cfg.backbone, dtype=dt),
          (2 * B, Hr, Wr, 3))

    enc = VernierEncoder(cfg)
    P = nh * nw * nl
    el = jnp.asarray(rng.standard_normal((B, Hr, Wr, 3)), dt)
    er = jnp.asarray(rng.standard_normal((B, Hr, Wr, 3)), dt)
    gl = jnp.asarray(rng.uniform(0, Wr, (B, P, 2)), jnp.float32)
    gr = jnp.asarray(rng.uniform(0, Wr, (B, P, 2)), jnp.float32)
    ev = enc.init(jax.random.PRNGKey(0), el, er, gl, gr, False)
    ef = jax.jit(lambda a, b: enc.apply(ev, a, b, gl, gr, False))
    eargs = [
        (jnp.asarray(rng.standard_normal((B, Hr, Wr, 3)), dt),
         jnp.asarray(rng.standard_normal((B, Hr, Wr, 3)), dt))
        for _ in range(n)
    ]
    t = timed(ef, eargs)
    stages["encoder_full"] = round(t * 1000, 2)
    print(f"{'encoder_full':28s} {t*1000:8.2f} ms", flush=True)

    total = sum(v for k, v in stages.items()
                if k.startswith("head.")) + stages["encoder_full"]
    stages["sum_of_stages_ms"] = round(total, 2)
    stages["batch"] = B
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
