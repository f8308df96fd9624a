#!/usr/bin/env python
"""Same-window formulation shoot-out on the flagship conv1_k7 shape.

BENCH.md round-4b profiling puts `head.conv1_k7` (voxel 2C=64 -> C=32,
k=7^3, grid 32x192x192, batch 4) at ~98 ms — 26 % of the flagship step and
55 % of its FLOPs at 34 % MXU.  Standalone it is neither compute-bound
(6.63 TF needs 34 ms at the v5e peak) nor HBM-bound (~5 GB of per-tap
traffic needs ~6 ms), so the formulation leaves time on the table.  This
benchmarks every exact formulation of that one conv in one window:

  per_tap      current default: 7 shifted-slice conv2ds, f32 cross-tap sum
               (models/layers.Conv3d per-tap path)
  per_tap_bf16 same, but the cross-tap accumulation stays bf16 — isolates
               the cost of the f32 accumulate traffic (admissible only if
               the numerics gate passes)
  grouped_tap  ONE conv2d dispatch: the 7 shifted slabs concatenated on
               channels, kernel [kh,kw,Cin,7F] with feature_group_count=7
               (group dz contracts slab dz against w[dz]), then a tap-axis
               f32 reduce over the 7F output groups — exact, single GEMM
               phase instead of 7
  native3d     XLA's native Conv3D lowering (lax.conv_general_dilated,
               NDHWC) — the round-2 "3x slower" measurement was on a
               different shape ([8,16,96,96,64]); re-measured on THIS one
  fold_out     one conv2d with kd*F output channels over the padded depth
               extent + shifted output-block sum (Conv3d.fold_output)
  fold_depth   one conv2d with kd*Cin input channels (Conv3d.fold_depth)

Every variant is numerically gated against an f32 native-3D reference on a
small slice before timing (max|delta| must stay within bf16 tolerance).
One JSON line per variant; same-window relative order is the decision
signal (±40 % service drift across windows).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

KD = KH = KW = 7
PAD = 3


def make_variants(B, D, H, W, Cin, F, w, dt):
    import jax
    import jax.numpy as jnp

    def conv2d(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((PAD, PAD), (PAD, PAD)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    def pad_d(x):
        return jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0), (0, 0), (0, 0)))

    def per_tap(x, accum_f32=True):
        xp = pad_d(x)
        out = None
        for dz in range(KD):
            xs = xp[:, dz : dz + D].reshape(B * D, H, W, Cin)
            o = conv2d(xs, w[dz])
            if accum_f32:
                o = o.astype(jnp.float32)
            out = o if out is None else out + o
        return out.astype(dt).reshape(B, D, H, W, F)

    def grouped_tap(x):
        xp = pad_d(x)
        slabs = jnp.concatenate(
            [xp[:, dz : dz + D] for dz in range(KD)], axis=-1
        ).reshape(B * D, H, W, KD * Cin)
        # group dz: input channels [dz*Cin:(dz+1)*Cin] -> outputs
        # [dz*F:(dz+1)*F] against w[dz]; kernel I axis holds Cin per group
        wg = jnp.concatenate([w[dz] for dz in range(KD)], axis=-1)
        ys = conv2d(slabs, wg, groups=KD).reshape(B * D, H, W, KD, F)
        return jnp.sum(ys.astype(jnp.float32), axis=3).astype(dt).reshape(
            B, D, H, W, F
        )

    def native3d(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((PAD, PAD), (PAD, PAD), (PAD, PAD)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(dt)

    def fold_out(x):
        xp = pad_d(x)
        Dp = D + 2 * PAD
        wf = jnp.moveaxis(w, 0, 3).reshape(KH, KW, Cin, KD * F)
        ys = conv2d(xp.reshape(B * Dp, H, W, Cin), wf)
        ys = ys.reshape(B, Dp, H, W, KD, F)
        out = None
        for dz in range(KD):
            o = ys[:, dz : dz + D, :, :, dz].astype(jnp.float32)
            out = o if out is None else out + o
        return out.astype(dt)

    def fold_depth(x):
        xp = pad_d(x)
        folded = jnp.concatenate(
            [xp[:, dz : dz + D] for dz in range(KD)], axis=-1
        )  # [B, D, H, W, kd*Cin]
        wk = jnp.moveaxis(w, 0, 2).reshape(KH, KW, KD * Cin, F)
        return conv2d(folded.reshape(B * D, H, W, KD * Cin), wk).astype(
            dt
        ).reshape(B, D, H, W, F)

    return {
        "per_tap": lambda x: per_tap(x, True),
        "per_tap_bf16": lambda x: per_tap(x, False),
        "grouped_tap": grouped_tap,
        "native3d": native3d,
        "fold_out": fold_out,
        "fold_depth": fold_depth,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--only", default="",
                   help="comma-separated variant subset (default: all)")
    p.add_argument("--cpu", action="store_true",
                   help="mechanics/numerics smoke on a tiny shape")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.cpu:
        B, D, H, W, Cin, F = 1, 8, 16, 16, 8, 4
    else:
        B, D, H, W, Cin, F = args.batch, 32, 192, 192, 64, 32

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    w = jnp.asarray(rng.standard_normal((KD, KH, KW, Cin, F)) * 0.05, dt)

    # --- numerics gate: every variant vs f32 native-3D on a small slice ---
    Bs, Ds, Hs, Ws = 1, 8, 16, 16
    small = make_variants(Bs, Ds, Hs, Ws, Cin, F, w, dt)
    x_small = jnp.asarray(rng.standard_normal((Bs, Ds, Hs, Ws, Cin)), dt)
    ref = jax.lax.conv_general_dilated(
        x_small.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1),
        ((PAD, PAD), (PAD, PAD), (PAD, PAD)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    scale = float(jnp.max(jnp.abs(ref)))
    numerics = {}
    for name, fn in small.items():
        d = float(jnp.max(jnp.abs(jax.jit(fn)(x_small).astype(jnp.float32) - ref)))
        numerics[name] = round(d / scale, 5)
        # bf16 has ~3 decimal digits; rel 2% catches wrong math, admits
        # accumulation-order noise
        assert d / scale < 0.02, (name, d, scale)
    print(json.dumps({"numerics_rel_maxdelta": numerics}), flush=True)

    # --- timing on the flagship shape --------------------------------------
    # memory note: the folded variants materialize a kd x input-volume slab
    # (4.2 GB at batch 4) — at batch 4 that OOMs next to the resident
    # distinct-input pool, so run them at --batch 2 (relative order is the
    # signal; absolute ms scales ~linearly in batch)
    variants = make_variants(B, D, H, W, Cin, F, w, dt)
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
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
            print(json.dumps({"variant": name,
                              "error": type(e).__name__}), flush=True)
            continue
        ts = sorted(ts[2:])
        med = ts[len(ts) // 2]
        results[name] = med
        print(json.dumps({"variant": name, "ms": round(med * 1e3, 2)}),
              flush=True)

    base = results.get("per_tap")
    print(json.dumps({
        "case": "conv1_k7_flagship",
        "shape": [B, D, H, W, Cin], "features": F,
        **{f"{k}_ms": round(v * 1e3, 2) for k, v in results.items()},
        **({f"{k}_speedup": round(base / v, 2) for k, v in results.items()}
           if base else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
