#!/usr/bin/env python
"""Same-window A/B of the Conv3d formulations on the real TPU.

Compares the per-depth-tap decomposition against the channel-folded single
conv2d (models/layers.Conv3d fold_depth) on the stereo 3D-stack shapes and
the vernier head shapes.  Prints one JSON line per case.

Usage: python tools/bench_conv3d.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def bench_case(name, shape, kernel, dtype, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snvc_tpu.models.layers import Conv3d

    rng = np.random.default_rng(0)
    feats = shape[-1]
    results = {}
    for mode in ("never", "always"):
        mod = Conv3d(feats, kernel, fold_depth=mode, dtype=dtype)
        x0 = jnp.asarray(rng.standard_normal(shape), dtype)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)
        f = jax.jit(lambda v, x: mod.apply(v, x))
        # distinct device-resident inputs (the axon runtime elides repeated
        # identical dispatches; eager ops in the loop would serialize)
        xs = [
            jax.device_put(
                jnp.asarray(rng.standard_normal(shape), dtype),
                jax.devices()[0],
            )
            for _ in range(iters + 2)
        ]
        jax.block_until_ready(xs)
        ts = []
        for x in xs:
            t0 = time.perf_counter()
            jax.block_until_ready(f(v, x))
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts[2:])
        results[mode] = ts[len(ts) // 2]
    print(
        json.dumps(
            {
                "case": name,
                "shape": list(shape),
                "kernel": list(kernel),
                "per_tap_ms": round(results["never"] * 1e3, 2),
                "folded_ms": round(results["always"] * 1e3, 2),
                "speedup": round(results["never"] / results["always"], 2),
            }
        ),
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    import jax.numpy as jnp

    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # stereo 3D stack: [N, D, Hf, Wf, C] at KITTI scale
    bench_case("stereo_k3_c32", (1, 64, 96, 312, 32), (3, 3, 3), jnp.bfloat16,
               args.iters)
    bench_case("stereo_k3_c64", (1, 64, 96, 312, 64), (3, 3, 3), jnp.bfloat16,
               args.iters)
    # vernier head convs at flagship grid
    bench_case("vernier_k3_c32", (4, 32, 192, 192, 32), (3, 3, 3),
               jnp.bfloat16, args.iters)
    bench_case("vernier_k5_c32", (4, 32, 192, 192, 32), (5, 5, 5),
               jnp.bfloat16, args.iters)


if __name__ == "__main__":
    main()
