#!/usr/bin/env python
"""Probe Mosaic's alignment rules for the conv1_k7 Pallas formulations.

The round-5 fused-conv design space (BENCH.md round-4b: conv1_k7 at 34 %
MXU with ~2.5x stage headroom) reduces to three Mosaic capability
questions; each probe is a minimal kernel that either compiles+runs or
reports the rejection, so the formulation choice is made on evidence
rather than speculation:

  1. sublane-offset load: can a kernel read ref[:, dw:dw+W, :] at dw not
     a multiple of the sublane tile (8/16)?  Needed to express the kw-tap
     shift in VMEM (per-tap W shifts).
  2. lane-offset load at 64: can a kernel read a 64-channel lane slice at
     offset 64 from a 128-lane-tiled ref?  Needed for in-VMEM depth-fold
     (concatenating C=64 planes on lanes).
  3. unaligned-size depth window: a size-7 block over a stride-1 depth
     axis (the overlapping halo window) — expected to be inexpressible
     with block-index maps; confirms the size-1-plane / grid-dim design.

Usage: python tools/probe_mosaic_align.py   (real TPU; seconds)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    H, W, C = 32, 192, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W + 8, C)), jnp.bfloat16)

    results = {}

    # --- probe 1: sublane-offset dynamic slice (dw = 3) ------------------
    def k_sublane(x_ref, o_ref):
        o_ref[...] = x_ref[:, 3 : 3 + W, :]

    try:
        out = pl.pallas_call(
            k_sublane,
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.bfloat16),
        )(x)
        ref = x[:, 3 : 3 + W, :]
        ok = bool(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))) == 0)
        results["sublane_offset_3"] = "OK exact" if ok else "RAN but WRONG"
    except Exception as e:  # noqa: BLE001
        results["sublane_offset_3"] = f"REJECTED: {str(e)[:200]}"

    # --- probe 2: 64-lane offset slice from a 128-lane ref ---------------
    x2 = jnp.asarray(rng.standard_normal((H, W, 128)), jnp.bfloat16)

    def k_lane(x_ref, o_ref):
        o_ref[...] = x_ref[:, :, 64:128]

    try:
        out = pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((H, W, 64), jnp.bfloat16),
        )(x2)
        ref = x2[:, :, 64:128]
        ok = bool(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))) == 0)
        results["lane_offset_64"] = "OK exact" if ok else "RAN but WRONG"
    except Exception as e:  # noqa: BLE001
        results["lane_offset_64"] = f"REJECTED: {str(e)[:200]}"

    # --- probe 3: 64-lane-offset STORE into a 128-lane scratch -----------
    def k_lane_store(x_ref, o_ref):
        o_ref[:, :, 0:64] = x_ref[...]
        o_ref[:, :, 64:128] = x_ref[...] * 2.0

    x3 = jnp.asarray(rng.standard_normal((H, W, 64)), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            k_lane_store,
            out_shape=jax.ShapeDtypeStruct((H, W, 128), jnp.bfloat16),
        )(x3)
        ref = jnp.concatenate([x3, (x3.astype(jnp.float32) * 2).astype(jnp.bfloat16)], -1)
        ok = bool(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))) == 0)
        results["lane_store_64"] = "OK exact" if ok else "RAN but WRONG"
    except Exception as e:  # noqa: BLE001
        results["lane_store_64"] = f"REJECTED: {str(e)[:200]}"

    for k, v in results.items():
        print(f"{k}: {v}", flush=True)


if __name__ == "__main__":
    main()
