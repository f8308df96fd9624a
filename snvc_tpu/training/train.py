"""Training loop for the Vernier (instance) model.

The reference's training CLI was never released (SURVEY.md §2.4); this
implements it TPU-first: one pjit-compiled train step covering device-side
batch assembly, forward, loss, grad, and optimizer update, data-parallel
over a jax.sharding.Mesh, with optax (AdamW + warmup-cosine + clip) and
Orbax checkpoints whose config travels with the weights.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from snvc_tpu.config import TrainConfig, VernierConfig, save_config
from snvc_tpu.models.losses import vernier_losses
from snvc_tpu.models.vernier import VernierScale
from snvc_tpu.ops.assemble import assemble_instances, make_grid_local, make_targets
from snvc_tpu.parallel.api import instance_batch_specs, make_mesh


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.lr,
        warmup_steps=tc.warmup_steps,
        decay_steps=max(tc.total_steps, tc.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(schedule, weight_decay=tc.weight_decay),
    )


def create_train_state(
    model: VernierScale, cfg: VernierConfig, tc: TrainConfig, rng
) -> TrainState:
    H, W = cfg.resolution
    nh, nw, nl = cfg.grid_resolution
    Pn = nh * nw * nl
    variables = model.init(
        rng,
        jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, Pn, 2)),
        jnp.zeros((1, Pn, 2)),
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


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng,
    model: VernierScale,
    cfg: VernierConfig,
    tc: TrainConfig,
    grid_local,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One full step: assemble -> forward -> loss -> grad -> update."""
    left, right, gpl, gpr = assemble_instances(
        batch["images_left"],
        batch["images_right"],
        batch["image_idx"],
        batch["trans_l"],
        batch["trans_r"],
        batch["samples"],
        batch["P_left"],
        batch["P_right"],
        grid_local,
        cfg,
    )
    targets = make_targets(
        batch["samples"],
        batch["gt_boxes"],
        batch["points"],
        batch["points_valid"],
        grid_local,
        cfg,
    )

    def loss_fn(params):
        variables = {"params": params}
        # mutable must be False (not []) when there are no batch stats:
        # flax returns an (out, vars) tuple for ANY list, empty included
        mutable = False
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out = model.apply(
            variables,
            left,
            right,
            gpl,
            gpr,
            train=True,
            mutable=mutable,
            rngs={"dropout": rng},
        )
        outputs, new_vars = out if mutable else (out, {})
        losses = vernier_losses(
            outputs,
            targets,
            batch["valid"],
            cfg,
            occupancy_weight=tc.occupancy_weight,
            coordinate_weight=tc.coordinate_weight,
        )
        return losses["total"], (losses, new_vars.get("batch_stats", {}))

    (total, (losses, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = make_optimizer(tc).update(
        grads, state.opt_state, state.params
    )
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(losses)
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats if new_stats else state.batch_stats,
        opt_state=new_opt,
    )
    return new_state, metrics


def make_train_step(model: VernierScale, cfg: VernierConfig, tc: TrainConfig, mesh=None):
    """jit (or pjit over a mesh) the train step with instance-batch
    shardings.

    With a mesh whose "model" axis is >1, the object voxel is additionally
    shard-constrained over its length axis (tensor parallelism: GSPMD
    partitions the 3D convs with halo exchange)."""
    grid_local = jnp.asarray(make_grid_local(cfg))
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        import dataclasses

        model = dataclasses.replace(
            model,
            voxel_sharding=NamedSharding(
                mesh, P("data", None, None, "model", None)
            ),
        )
    fn = functools.partial(
        train_step, model=model, cfg=cfg, tc=tc, grid_local=grid_local
    )
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    specs = instance_batch_specs()
    batch_shardings = {k: NamedSharding(mesh, v) for k, v in specs.items()}
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# ---------------------------------------------------------------------------
# Checkpointing (Orbax): config travels with the weights, replacing the
# reference's save_config.py-in-model-dir convention (exp_utils.py:22-28).
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState, cfg: VernierConfig, step: int):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(
            step,
            args=ocp.args.StandardSave(
                dict(
                    params=state.params,
                    batch_stats=state.batch_stats,
                    opt_state=state.opt_state,
                )
            ),
        )
    save_config(cfg, os.path.join(ckpt_dir, "config.json"))


def load_checkpoint(ckpt_dir: str, state: Optional[TrainState] = None):
    """Returns (tree, step). With a template state, restores into it."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step()
        if state is None:
            tree = mgr.restore(step)
        else:
            template = dict(
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=state.opt_state,
            )
            tree = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return tree, step
