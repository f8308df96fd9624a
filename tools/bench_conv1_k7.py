#!/usr/bin/env python
"""Same-window formulation shoot-out on the hot 3D-conv shapes.

BENCH.md round-4b profiling puts `head.conv1_k7` (voxel 2C=64 -> C=32,
k=7^3, grid 32x192x192) at ~98 ms — 26 % of the flagship step and 55 % of
its FLOPs at 34 % MXU.  Standalone it is neither compute-bound (6.63 TF
needs 34 ms at the v5e peak) nor HBM-bound (~5 GB of per-tap traffic needs
~6 ms), so the formulation leaves time on the table.  The k5 pair is
another 14 % of the step, and the stereo 3D stack (k3, C=32) is the
biggest block of the global model (BENCH.md round-3 profile), so each hot
shape gets the same treatment.  Variants (all exact):

  per_tap      current default: kd shifted-slice conv2ds, f32 cross-tap sum
               (models/layers.Conv3d per-tap path)
  per_tap_bf16 same, cross-tap accumulation in the compute dtype
               (Conv3d tap_accum="compute") — isolates the f32-accum cost
  grouped_tap  ONE conv2d dispatch: kd shifted slabs concatenated on
               channels, kernel [kh,kw,Cin,kd*F] with feature_group_count=
               kd, then a tap-axis f32 reduce (Conv3d group_taps="always")
  native3d     XLA's native Conv3D lowering — the round-2 "3x slower"
               measurement was on one shape; re-measured per shape here
  fold_out     one conv2d with kd*F output channels over the padded depth
               extent + shifted output-block sum (Conv3d.fold_output)
  fold_depth   one conv2d with kd*Cin input channels (Conv3d.fold_depth)

Every variant is numerically gated against an f32 native-3D reference on a
small slice before timing (rel max|delta| must stay within bf16 tolerance).
One JSON line per (case, variant); same-window relative order is the
decision signal (±40 % service drift across windows).

Memory note: the folded/grouped variants materialize a kd x input-volume
slab; at the flagship batch 4 that OOMs next to the resident distinct-input
pool, so the default cases run batch 2 (relative order is the signal).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

# case -> (B, D, H, W, Cin, F, k)
CASES = {
    "conv1_k7": (2, 32, 192, 192, 64, 32, 7),
    "conv2_k5": (2, 32, 192, 192, 32, 32, 5),
    "stereo_k3": (1, 64, 96, 312, 32, 32, 3),
}


def make_variants(B, D, H, W, Cin, F, k, w, dt):
    import jax
    import jax.numpy as jnp

    pad = (k - 1) // 2

    def conv2d(x, kern, groups=1):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    def pad_d(x):
        return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))

    def per_tap(x, accum_f32=True):
        xp = pad_d(x)
        out = None
        for dz in range(k):
            xs = xp[:, dz : dz + D].reshape(B * D, H, W, Cin)
            o = conv2d(xs, w[dz])
            if accum_f32:
                o = o.astype(jnp.float32)
            out = o if out is None else out + o
        return out.astype(dt).reshape(B, D, H, W, F)

    def grouped_tap(x):
        xp = pad_d(x)
        slabs = jnp.concatenate(
            [xp[:, dz : dz + D] for dz in range(k)], axis=-1
        ).reshape(B * D, H, W, k * Cin)
        wg = jnp.concatenate([w[dz] for dz in range(k)], axis=-1)
        ys = conv2d(slabs, wg, groups=k).reshape(B * D, H, W, k, F)
        return jnp.sum(ys.astype(jnp.float32), axis=3).astype(dt).reshape(
            B, D, H, W, F
        )

    def native3d(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((pad, pad), (pad, pad), (pad, pad)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(dt)

    def fold_out(x):
        xp = pad_d(x)
        Dp = D + 2 * pad
        wf = jnp.moveaxis(w, 0, 3).reshape(k, k, Cin, k * F)
        ys = conv2d(xp.reshape(B * Dp, H, W, Cin), wf)
        ys = ys.reshape(B, Dp, H, W, k, F)
        out = None
        for dz in range(k):
            o = ys[:, dz : dz + D, :, :, dz].astype(jnp.float32)
            out = o if out is None else out + o
        return out.astype(dt)

    def fold_depth(x):
        xp = pad_d(x)
        folded = jnp.concatenate(
            [xp[:, dz : dz + D] for dz in range(k)], axis=-1
        )
        wk = jnp.moveaxis(w, 0, 2).reshape(k, k, k * Cin, F)
        return conv2d(folded.reshape(B * D, H, W, k * Cin), wk).astype(
            dt
        ).reshape(B, D, H, W, F)

    variants = {
        "per_tap": lambda x: per_tap(x, True),
        "per_tap_bf16": lambda x: per_tap(x, False),
        "grouped_tap": grouped_tap,
        "native3d": native3d,
        "fold_out": fold_out,
        "fold_depth": fold_depth,
    }

    # round-5: the in-VMEM fold_out Pallas kernel (the widened GEMM tile
    # and tap accumulator never leave the chip — ops/conv3d_fold_pallas)
    from snvc_tpu.ops.conv3d_fold_pallas import (
        conv3d_fold_vmem,
        fold_vmem_available,
    )

    if fold_vmem_available((B, D, H, W, Cin), (k, k, k, Cin, F)):
        variants["fold_vmem"] = lambda x: conv3d_fold_vmem(x, w, 1)
    return variants


def run_case(case, args, rng):
    import jax
    import jax.numpy as jnp

    B, D, H, W, Cin, F, k = CASES[case]
    if args.cpu:
        B, D, H, W, Cin, F = 1, 8, 16, 16, 8, 4
    if args.batch:
        B = args.batch
    dt = jnp.bfloat16
    w = jnp.asarray(rng.standard_normal((k, k, k, Cin, F)) * 0.05, dt)
    pad = (k - 1) // 2

    # --- numerics gate vs f32 native-3D on a small slice -------------------
    Bs, Ds, Hs, Ws = 1, max(8, k + 1), 16, 16
    small = make_variants(Bs, Ds, Hs, Ws, Cin, F, k, w, dt)
    x_small = jnp.asarray(rng.standard_normal((Bs, Ds, Hs, Ws, Cin)), dt)
    ref = jax.lax.conv_general_dilated(
        x_small.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1),
        ((pad, pad), (pad, pad), (pad, pad)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    scale = float(jnp.max(jnp.abs(ref)))
    numerics = {}
    for name, fn in small.items():
        d = float(jnp.max(jnp.abs(jax.jit(fn)(x_small).astype(jnp.float32) - ref)))
        numerics[name] = round(d / scale, 5)
        # bf16 has ~3 decimal digits; rel 2% catches wrong math, admits
        # accumulation-order noise
        assert d / scale < 0.02, (case, name, d, scale)
    print(json.dumps({"case": case, "numerics_rel_maxdelta": numerics}),
          flush=True)

    # --- timing -------------------------------------------------------------
    variants = make_variants(B, D, H, W, Cin, F, k, w, dt)
    if args.only:
        keep = set(args.only.split(","))
        variants = {n: v for n, v in variants.items() if n in keep}
    n = args.iters + 2
    xs = [
        jax.device_put(jnp.asarray(rng.standard_normal((B, D, H, W, Cin)), dt))
        for _ in range(n)
    ]
    jax.block_until_ready(xs)

    results = {}
    for name, fn in variants.items():
        f = jax.jit(fn)
        try:
            ts = []
            for x in xs:
                t0 = time.perf_counter()
                jax.block_until_ready(f(x))
                ts.append(time.perf_counter() - t0)
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED — keep measuring
            print(json.dumps({"case": case, "variant": name,
                              "error": type(e).__name__}), flush=True)
            continue
        ts = sorted(ts[2:])
        med = ts[len(ts) // 2]
        results[name] = med
        print(json.dumps({"case": case, "variant": name,
                          "ms": round(med * 1e3, 2)}), flush=True)

    base = results.get("per_tap")
    print(json.dumps({
        "case": case, "shape": [B, D, H, W, Cin], "features": F, "k": k,
        **{f"{n}_ms": round(v * 1e3, 2) for n, v in results.items()},
        **({f"{n}_speedup": round(base / v, 2) for n, v in results.items()}
           if base else {}),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=0,
                   help="override the case's batch (0 = per-case default)")
    p.add_argument("--cases", default="conv1_k7,conv2_k5,stereo_k3")
    p.add_argument("--only", default="",
                   help="comma-separated variant subset (default: all)")
    p.add_argument("--cpu", action="store_true",
                   help="mechanics/numerics smoke on a tiny shape")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for case in args.cases.split(","):
        run_case(case, args, rng)


if __name__ == "__main__":
    main()
