"""Training loop for the global stereo detector.

One pjit-compiled step: image normalization, StereoNet forward, on-device
RPN target assignment, depth supervision (masked smooth-L1 on the LiDAR
z-buffer), grad, and optimizer update; data-parallel over the mesh's
"data" axis.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from snvc_tpu.config import StereoConfig, TrainConfig
from snvc_tpu.models.stereo_losses import (
    depth_multistage_sl1_loss,
    depth_sl1_loss,
    depth_w1_loss,
    rpn3d_loss,
)
from snvc_tpu.models.stereonet import (
    StereoEncoder,
    StereoHead,
    StereoNet,
    bev_locations,
)
from snvc_tpu.training.train import TrainState, make_optimizer

_IMG_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMG_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_images(img_u8):
    x = img_u8.astype(jnp.float32) / 255.0
    return (x - _IMG_MEAN) / _IMG_STD


def augment_normalize(img_l_u8, img_r_u8, cfg: StereoConfig, step):
    """Photometric jitter (cfg.photometric_aug) + ImageNet normalization.

    The SAME jitter is applied to both views (keyed by the step counter):
    the plane-sweep cost volume compares left/right features directly, so
    view-consistent photometrics perturb appearance without corrupting
    the stereo-matching signal (reference ColorJitter/Lighting,
    snvc/utils/preprocess.py:21-179, applied per sample).  Keying from
    ``step`` keeps the split train step's program-3 rematerialization
    bit-identical to program 1 with no extra rng plumbing.  The factors
    are per-step scalars (shared across the batch dim)."""
    l = img_l_u8.astype(jnp.float32) / 255.0
    r = img_r_u8.astype(jnp.float32) / 255.0
    if cfg.photometric_aug:
        from snvc_tpu.ops.augment import color_jitter

        key = jax.random.PRNGKey(step)
        l = color_jitter(key, l)
        r = color_jitter(key, r)
    return (l - _IMG_MEAN) / _IMG_STD, (r - _IMG_MEAN) / _IMG_STD


def _depth_loss(out, depth_gt, cfg: StereoConfig):
    """Depth supervision dispatch (reference calc_disp_loss, loss3d.py:425-450):
    'sl1' = multi-stage smooth-L1 over the stacked-hourglass depth_preds,
    'w1' = Wasserstein-1 over the final depth distribution with the
    optional per-plane offset branch."""
    mask = depth_gt > 0
    if cfg.depth_loss == "w1":
        return depth_w1_loss(
            out["depth_prob"], out["depth_levels"], depth_gt, mask,
            offset=out.get("depth_offset"),
        )
    if cfg.depth_loss != "sl1":
        raise ValueError(f"unknown depth_loss {cfg.depth_loss!r}")
    preds = out.get("depth_preds")
    if preds is None or len(preds) == 1:
        return depth_sl1_loss(out["depth"], depth_gt, mask)
    return depth_multistage_sl1_loss(preds, depth_gt, mask)


def create_stereo_state(model: StereoNet, cfg: StereoConfig, tc: TrainConfig, rng):
    import contextlib

    H, W = cfg.input_size
    # init host-side when a CPU backend is available (JAX_PLATFORMS=axon,cpu):
    # an eager init through the TPU tunnel is minutes-slow, and jitting it
    # on-device compiles a throwaway full-forward program
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        variables = jax.jit(model.init, static_argnames=("train",))(
            rng,
            jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, H, W, 3)),
            jnp.eye(3, 4)[None],
            jnp.eye(3, 4)[None],
            train=True,
        )
    if cpu is not None and jax.devices()[0] is not cpu:
        variables = jax.device_put(variables, jax.devices()[0])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(tc).init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def stereo_train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model: StereoNet,
    cfg: StereoConfig,
    tc: TrainConfig,
    locations,
    depth_weight: float = 1.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    left, right = augment_normalize(
        batch["images_left"], batch["images_right"], cfg, state.step
    )

    def loss_fn(params):
        variables = {"params": params}
        # mutable must be False (not []) when there are no batch stats:
        # flax returns an (out, vars) tuple for ANY list, empty included
        mutable = False
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        res = model.apply(
            variables, left, right, batch["P_left"], batch["P_right"],
            train=True, mutable=mutable,
        )
        out, new_vars = res if mutable else (res, {})
        losses = rpn3d_loss(
            out, batch["gt_boxes"], batch["gt_valid"], batch["gt_classes"],
            cfg, locations,
        )
        dloss = _depth_loss(out, batch["depth_gt"], cfg)
        total = losses["total"] + depth_weight * dloss
        losses = dict(losses, depth=dloss, total=total)
        return total, (losses, new_vars.get("batch_stats", {}))

    (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = make_optimizer(tc).update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(losses)
    metrics["grad_norm"] = optax.global_norm(grads)
    return (
        state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats if new_stats else state.batch_stats,
            opt_state=new_opt,
        ),
        metrics,
    )


def make_stereo_train_step_split(
    model: StereoNet,
    cfg: StereoConfig,
    tc: TrainConfig,
    mesh=None,
    depth_weight: float = 1.0,
):
    """Split-program train step: three chained XLA programs instead of one
    monolith.

    The monolithic stereo train step compiles in ~18 min on TPU — the 2D
    feature extractor fused with the 3D conv stack blows up XLA's schedule
    search the same way it does for the Vernier model (BENCH.md
    optimization log #1; inference already splits, inference/refine.py).
    Training splits along the same seam with manual VJP chaining:

      1. encode:      feats = encoder(enc_params, images)
      2. head_grads:  loss, d(head_params), d(feats)   [value_and_grad]
      3. bwd_update:  d(enc_params) via jax.vjp (recomputes the encoder
                      forward — rematerialization, not waste) + optimizer
                      update for the whole param tree

    Device arrays flow between programs with no host syncs.  Gradients are
    exactly those of the fused step (chain rule at the feats boundary).
    Encoder batch_stats (backbone variants whose stem keeps BatchNorm) are
    updated by program 1 and carried through; the head itself must be
    BatchNorm-free (true for cfg.gn, which GroupNorms the 3D/BEV stacks).

    Returns ``step(state, batch) -> (state, metrics)``.
    """
    assert cfg.gn, "split training requires a GroupNorm (BatchNorm-free) head"
    locations = jnp.asarray(bev_locations(cfg))
    encoder = StereoEncoder(cfg)
    head = StereoHead(cfg, volume_sharding=_volume_sharding(mesh))

    def enc_fwd(enc_params, enc_stats, img_l_u8, img_r_u8, step):
        left, right = augment_normalize(img_l_u8, img_r_u8, cfg, step)
        variables = {"params": enc_params}
        mutable = False
        if enc_stats:
            variables["batch_stats"] = enc_stats
            mutable = ["batch_stats"]
        res = encoder.apply(variables, left, right, train=True, mutable=mutable)
        feats, new_vars = res if mutable else (res, {})
        return feats, new_vars.get("batch_stats", {})

    def head_loss(head_params, feats, P_left, P_right, gt_boxes, gt_valid,
                  gt_classes, depth_gt):
        lf, rf, rpn_img = feats
        out = head.apply(
            {"params": head_params}, lf, rf, rpn_img, P_left, P_right,
            train=True,
        )
        losses = rpn3d_loss(out, gt_boxes, gt_valid, gt_classes, cfg, locations)
        dloss = _depth_loss(out, depth_gt, cfg)
        total = losses["total"] + depth_weight * dloss
        return total, dict(losses, depth=dloss, total=total)

    def prog_encode(enc_params, enc_stats, batch, step):
        return enc_fwd(
            enc_params, enc_stats, batch["images_left"],
            batch["images_right"], step,
        )

    def prog_head_grads(head_params, feats, batch):
        (_, losses), (g_head, ct_feats) = jax.value_and_grad(
            head_loss, argnums=(0, 1), has_aux=True
        )(
            head_params, feats, batch["P_left"], batch["P_right"],
            batch["gt_boxes"], batch["gt_valid"], batch["gt_classes"],
            batch["depth_gt"],
        )
        return losses, g_head, ct_feats

    def prog_bwd_update(state, batch, ct_feats, g_head, new_enc_stats, losses):
        # rematerialize the encoder forward for its VJP (train-mode
        # BatchNorm normalizes by batch statistics, so the recomputation is
        # bit-identical to program 1 and independent of the running stats)
        enc_stats = (state.batch_stats or {}).get("encoder", {})
        _, vjp = jax.vjp(
            lambda p: enc_fwd(
                p, enc_stats, batch["images_left"], batch["images_right"],
                state.step,  # pre-update: same jitter key as program 1
            )[0],
            state.params["encoder"],
        )
        (g_enc,) = vjp(ct_feats)
        grads = {"encoder": g_enc, "head": g_head}
        updates, new_opt = make_optimizer(tc).update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats={"encoder": new_enc_stats}
            if new_enc_stats
            else state.batch_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    if mesh is None:
        j_encode = jax.jit(prog_encode)
        j_grads = jax.jit(prog_head_grads)
        j_update = jax.jit(prog_bwd_update, donate_argnums=(0,))
    else:
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        bspec = {
            k: data
            for k in (
                "images_left", "images_right", "P_left", "P_right",
                "gt_boxes", "gt_valid", "gt_classes", "depth_gt",
            )
        }
        j_encode = jax.jit(
            prog_encode,
            in_shardings=(repl, repl, bspec, repl),
            out_shardings=(data, repl),
        )
        j_grads = jax.jit(
            prog_head_grads, in_shardings=(repl, data, bspec),
            out_shardings=(repl, repl, data),
        )
        j_update = jax.jit(
            prog_bwd_update,
            in_shardings=(repl, bspec, data, repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def step(state: TrainState, batch):
        stats = state.batch_stats or {}
        assert set(stats.keys()) <= {"encoder"}, (
            "split stereo training requires a BatchNorm-free head; "
            f"found batch_stats under {sorted(stats)}"
        )
        feats, new_enc_stats = j_encode(
            state.params["encoder"], stats.get("encoder", {}), batch,
            state.step,
        )
        losses, g_head, ct_feats = j_grads(state.params["head"], feats, batch)
        return j_update(state, batch, ct_feats, g_head, new_enc_stats, losses)

    return step


def _volume_sharding(mesh):
    """Depth-axis tensor-parallel sharding for the plane-sweep volume when
    the mesh has a "model" axis: P("data", "model") over [N, D, Hf, Wf, C]
    (StereoHead.volume_sharding docstring; vernier voxel analog)."""
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    return NamedSharding(mesh, P("data", "model"))


def make_stereo_train_step(model: StereoNet, cfg: StereoConfig, tc: TrainConfig,
                           mesh=None):
    locations = jnp.asarray(bev_locations(cfg))
    vs = _volume_sharding(mesh)
    if vs is not None:
        import dataclasses

        model = dataclasses.replace(model, volume_sharding=vs)
    fn = functools.partial(
        stereo_train_step, model=model, cfg=cfg, tc=tc, locations=locations
    )
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch_shardings = {
        k: data
        for k in (
            "images_left", "images_right", "P_left", "P_right",
            "gt_boxes", "gt_valid", "gt_classes", "depth_gt",
        )
    }
    return jax.jit(
        fn,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
