"""Benchmark: instance-refinement throughput on one chip.

Measures the fully-jitted end-to-end refinement step (on-device ROI warp +
grid projection + VernierScale forward + NCF->pose update) in instances
per second, the framework's north-star serving metric (BASELINE.md: the
reference publishes no numbers; its documented operating point is
batch<=10 on a 12 GB TITAN Xp).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6)
and no measured anchor exists yet, so the ratio is computed against a
DECLARED (not measured) anchor and the JSON labels it as such via
"baseline_anchor"/"baseline_kind" — see BASELINE.md's measurement plan.

Prints one JSON line per benchmarked configuration:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The bare invocation (the driver's) runs the FULL surface — vernier small,
vernier flagship (release-scale 32x192x192 grid), and the global stereo
model — one line each, each in its OWN subprocess (hermetic: the same
fresh-process methodology the in-repo single-config numbers use; round-5
ruled out cross-config interaction, but hermetic keeps the driver capture
and the iterating methodology identical by construction).
--config/--model narrow to a single line for iterating.

Every JSON line also carries a calibration co-measurement
(``calib_tflops``: a fixed 64-step chained-matmul program timed in the
same process/window as the model loop).  The dev-tunnel service's
speed drifts and has transient degraded windows (BENCH.md round-5: a
capture read 0.36x the same-commit healthy number); the calibration
number pins the window's health next to every throughput it produced.
"""

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

# make a CPU backend available next to the TPU so parameter init runs
# host-side (eager/jitted init through the axon tunnel is minutes-slow)
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REFERENCE_ANCHOR_INSTANCES_PER_SEC = 10.0

# assumed per-chip peak for the MFU readout (bf16 matmul); v5e = 197
# TFLOP/s.  Override with SNVC_PEAK_TFLOPS when benching other chips.
PEAK_TFLOPS = float(os.environ.get("SNVC_PEAK_TFLOPS", "197"))


PEAK_HBM_GBPS = float(os.environ.get("SNVC_PEAK_HBM_GBPS", "819"))


def mfu_fields(cost, seconds_per_step):
    """Roofline readout from the XLA cost model: model-FLOPs-utilization
    against the assumed compute peak AND achieved HBM bandwidth against
    the assumed memory peak (v5e: 197 bf16 TFLOP/s, 819 GB/s).  Whichever
    utilization is higher names the binding roofline.  ``cost`` is either
    the {"flops", "bytes_accessed"} dict from _compiled_cost/cost_stats or
    a bare FLOPs float (legacy).  Returns {} when the backend exposes no
    cost model."""
    if not cost or not seconds_per_step:
        return {}
    if not isinstance(cost, dict):
        cost = {"flops": cost, "bytes_accessed": 0.0}
    tflops = cost["flops"] / seconds_per_step / 1e12
    out = {
        "tflops_per_sec": round(tflops, 2),
        "mfu": round(tflops / PEAK_TFLOPS, 4),
        "peak_tflops_assumed": PEAK_TFLOPS,
    }
    if cost.get("bytes_accessed"):
        gbps = cost["bytes_accessed"] / seconds_per_step / 1e9
        out.update(
            hbm_gb_per_sec=round(gbps, 1),
            hbm_util=round(gbps / PEAK_HBM_GBPS, 4),
            peak_hbm_gbps_assumed=PEAK_HBM_GBPS,
        )
    return out


_CALIB = {}


def calibrate(iters: int = 6):
    """Window-health co-measurement: a fixed known-cost program (64
    chained 2048x2048 bf16 matmuls under one jit, ~1.1 TFLOP) timed on
    distinct device inputs, median of ``iters``.  Returns achieved TF/s
    for the calibration program — a service-window constant independent
    of the model being benchmarked; cached per process."""
    if "tflops" in _CALIB:
        return _CALIB["tflops"]
    import jax
    import jax.numpy as jnp

    K = 64
    n = 2048
    flops = 2.0 * K * n * n * n

    def prog(a):
        def body(_, x):
            y = x @ x
            # cheap renormalization keeps values finite across 64 matmuls
            return y * (1.0 / jnp.float32(n).astype(jnp.bfloat16))

        return jax.lax.fori_loop(0, K, body, a)

    f = jax.jit(prog)
    rng = np.random.default_rng(3)
    xs = [
        jax.device_put(
            jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16),
            jax.devices()[0],
        )
        for _ in range(iters + 2)
    ]
    jax.block_until_ready(xs)
    ts = []
    for x in xs:
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    med = ts[len(ts) // 2]
    _CALIB["tflops"] = round(flops / med / 1e12, 1)
    return _CALIB["tflops"]


def build(config: str):
    from snvc_tpu.config import VernierConfig, BackboneConfig

    if config == "flagship":
        # full release-scale geometry (32 x 192 x 192 grid, hrnet-w32)
        cfg = VernierConfig(
            backbone=BackboneConfig(name="hrnet-w32"),
            grid_resolution=(32, 192, 192),
            x_range=(-2.4, 2.4),
            y_range=(-1.0, 1.0),
            z_range=(-2.4, 2.4),
            resolution=(256, 256),
            max_instances=4,
            compute_dtype="bfloat16",
            remat=True,
        )
    elif config == "small":
        cfg = VernierConfig(
            backbone=BackboneConfig(name="hrnet-w32"),
            grid_resolution=(16, 96, 96),
            resolution=(256, 256),
            max_instances=16,
            compute_dtype="bfloat16",
            remat=True,
        )
    else:  # tiny smoke
        from snvc_tpu.config import tiny_vernier_config

        cfg = tiny_vernier_config(max_instances=4, image_size=(128, 256))
    return cfg


def bench_stereo(iters: int, batch: int = 1):
    """Global-model throughput: stereo pairs/sec/chip on KITTI-sized
    inputs (the SURVEY north-star for the main scale).

    ``batch`` > 1 amortizes per-dispatch overhead and deepens MXU
    batching for offline/throughput-oriented serving; the driver metric
    stays batch=1 (online per-frame latency regime)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from snvc_tpu.config import StereoConfig
    from snvc_tpu.geometry.calib import Calibration
    from snvc_tpu.models.stereonet import StereoNet

    cfg = StereoConfig()  # KITTI scale: 384x1248, D=64
    model = StereoNet(cfg)
    H, W = cfg.input_size
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((batch, H, W, 3)), jnp.float32)
    Pl = jnp.asarray(
        np.repeat(Calibration.default().as_array()[None], batch, axis=0)
    )
    Pr = jnp.asarray(
        np.repeat(Calibration.default_right().as_array()[None], batch, axis=0)
    )
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right, Pl, Pr)
    variables = jax.device_put(variables, jax.devices()[0])
    f = jax.jit(lambda v, l, r, a, b: model.apply(v, l, r, a, b))
    # distinct inputs per request (elision-safe), PRECOMPUTED outside the
    # timed region: any eager op (even `left + c`) in the loop is its own
    # serialized tunnel dispatch and dominates the measurement
    base = np.asarray(left)
    lefts = [
        jax.device_put(
            jnp.asarray(base + np.float32(1e-4 * (i + 1))), jax.devices()[0]
        )
        for i in range(iters + 2)
    ]
    jax.block_until_ready(lefts)
    # steady-state per-call latency, median over distinct inputs: the
    # first call after process start pays one-time cache-load/warmup costs
    # (measured ~8-100 s) that must not leak into the throughput number
    ts = []
    for i in range(iters + 2):
        t0 = time.perf_counter()
        out = f(variables, lefts[i], right, Pl, Pr)
        jax.block_until_ready((out["depth"], out["cls"], out["reg"]))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    from snvc_tpu.inference.refine import _compiled_cost

    cost = _compiled_cost(f, variables, lefts[0], right, Pl, Pr)
    return 1.0 / ts[len(ts) // 2], cost


def emit_stereo(iters: int, batch: int = 1):
    rate, cost = bench_stereo(iters, batch)
    pps = rate * batch
    metric = "stereonet_throughput" + (f"_b{batch}" if batch != 1 else "")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pps, 2),
                "unit": "stereo_pairs/sec/chip",
                "vs_baseline": round(pps / 1.0, 3),
                "baseline_anchor": 1.0,
                "baseline_kind": "declared_not_measured",
                "calib_tflops": calibrate(),
                **mfu_fields(cost, 1.0 / rate),
            }
        ),
        flush=True,
    )


_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.rand(256, 256).astype("float32"))
jax.jit(lambda a: (a @ a).sum())(x).block_until_ready()
print("ok")
"""


def check_tpu_reachable(timeout_s: float = 360.0):
    """Fail fast when the axon tunnel is wedged/down.

    A dead tunnel makes the first device op block forever (observed
    2026-08-17: service-side outage froze a run mid-loop at 0% CPU); a
    bounded subprocess probe turns an indefinite hang into a clear
    non-zero exit within minutes.  Skipped off-axon (CPU/TPU-direct)."""
    import subprocess

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    try:
        subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        sys.exit(
            "bench: TPU unreachable (device probe hung %.0fs; axon tunnel "
            "down or wedged) — no metrics emitted" % timeout_s
        )
    except subprocess.CalledProcessError as e:
        sys.exit(
            "bench: device probe failed — no metrics emitted\n"
            + e.stderr.decode(errors="replace")[-2000:]
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config", default="all", choices=["all", "tiny", "small", "flagship"]
    )
    p.add_argument("--model", default=None, choices=["vernier", "stereo"],
                   help="narrow to one model (default: the full surface "
                   "when --config all, else vernier)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=1,
                   help="stereo-model batch size (throughput serving A/B; "
                   "the driver metric stays batch=1)")
    args = p.parse_args()

    check_tpu_reachable()

    # an explicit --model always wins; the bare/--config-all invocation is
    # the driver's full three-line surface
    if args.model == "stereo":
        emit_stereo(args.iters, args.batch)
        return
    if args.batch != 1:
        sys.exit("bench: --batch applies to the stereo model; pass "
                 "--model stereo")
    if args.config == "all":
        # full driver surface: three JSON lines, each config in its OWN
        # subprocess (hermetic — identical to the single-config
        # methodology; stdout passes straight through)
        import subprocess

        me = os.path.abspath(__file__)
        rc = 0
        for sub in (
            ["--config", "small"],
            ["--config", "flagship"],
            ["--model", "stereo"],
        ):
            r = subprocess.run(
                [sys.executable, me, *sub, "--iters", str(args.iters)]
            )
            rc = rc or r.returncode
        sys.exit(rc)
    bench_vernier(args.config, args.iters)


def bench_vernier(config: str, iters: int):
    import jax

    from snvc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from snvc_tpu.data.synthetic import synthetic_batch_arrays
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.models.vernier import VernierScale
    import jax.numpy as jnp

    cfg = build(config)
    model = VernierScale(cfg)
    H, W = cfg.resolution
    nh, nw, nl = cfg.grid_resolution
    P = nh * nw * nl
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, P, 2)),
            jnp.zeros((1, P, 2)),
        )
    params = jax.device_put(params, jax.devices()[0])
    runner = RefineRunner(model, params, cfg)

    from snvc_tpu.data.pipeline import InstanceBatch

    arrays = synthetic_batch_arrays(cfg, seed=0)
    batch = InstanceBatch(**arrays, scene_names=["000000"] * cfg.max_instances,
                          box2d=np.zeros((cfg.max_instances, 4), np.float32),
                          scores=np.ones(cfg.max_instances, np.float32))

    # warmup/compile
    out = runner.step(batch)
    assert np.all(np.isfinite(out["all_parts"])), "non-finite refinement output"

    # measure pipelined on-chip throughput: inputs resident on device
    # (serving would stream fresh frames over PCIe; the dev-env tunnel's
    # bandwidth is not the number of interest), all steps dispatched
    # asynchronously, one sync at the end
    import jax as _jax

    device_batch = _jax.device_put(batch.arrays(), _jax.devices()[0])

    class _DevBatch:
        def arrays(self):
            return device_batch

    db = _DevBatch()
    out = runner.step(db, host_outputs=())  # re-warm with device inputs
    # serving measurement: every request gets DISTINCT inputs (the axon
    # runtime elides repeated identical dispatches), but requests stay
    # independent so the pipeline overlaps dispatch latency; block on all
    # outputs at the end
    # distinct per-iteration inputs PRECOMPUTED on device (an eager add
    # inside the loop would be its own serialized tunnel dispatch and
    # dominate the measurement); steady-state per-call latency, median
    # over distinct inputs (first calls pay one-time warmup costs)
    base_samples = np.asarray(device_batch["samples"])
    sample_variants = [
        _jax.device_put(
            base_samples + np.float32(1e-4 * (i + 1)), _jax.devices()[0]
        )
        for i in range(iters + 2)
    ]
    _jax.block_until_ready(sample_variants)
    ts = []
    for i in range(iters + 2):
        device_batch["samples"] = sample_variants[i]
        t0 = time.perf_counter()
        out = runner.step(db, host_outputs=())
        _jax.block_until_ready(out["all_parts"])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    sec_per_step = ts[len(ts) // 2]
    inst_per_sec = cfg.max_instances / sec_per_step
    cost = runner.cost_stats(batch)

    print(
        json.dumps(
            {
                "metric": f"vernier_refinement_throughput_{config}",
                "value": round(inst_per_sec, 2),
                "unit": "instances/sec/chip",
                "vs_baseline": round(
                    inst_per_sec / REFERENCE_ANCHOR_INSTANCES_PER_SEC, 3
                ),
                "baseline_anchor": REFERENCE_ANCHOR_INSTANCES_PER_SEC,
                "baseline_kind": "declared_not_measured",
                "calib_tflops": calibrate(),
                **mfu_fields(cost, sec_per_step),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
