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
from snvc_tpu.models.stereo_losses import depth_sl1_loss, rpn3d_loss
from snvc_tpu.models.stereonet import StereoNet, bev_locations
from snvc_tpu.training.train import TrainState, make_optimizer

_IMG_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMG_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_images(img_u8):
    x = img_u8.astype(jnp.float32) / 255.0
    return (x - _IMG_MEAN) / _IMG_STD


def create_stereo_state(model: StereoNet, cfg: StereoConfig, tc: TrainConfig, rng):
    H, W = cfg.input_size
    variables = model.init(
        rng,
        jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, H, W, 3)),
        jnp.eye(3, 4)[None],
        jnp.eye(3, 4)[None],
        train=True,
    )
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
    left = normalize_images(batch["images_left"])
    right = normalize_images(batch["images_right"])

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
        mask = batch["depth_gt"] > 0
        dloss = depth_sl1_loss(out["depth"], batch["depth_gt"], mask)
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


def make_stereo_train_step(model: StereoNet, cfg: StereoConfig, tc: TrainConfig,
                           mesh=None):
    locations = jnp.asarray(bev_locations(cfg))
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
