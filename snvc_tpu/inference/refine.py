"""End-to-end jitted refinement step + host driver.

One compiled XLA program covers the reference's whole per-batch path
(tools/inference_agnostic.py:366-432): device-side batch assembly (ROI
warps + grid projection), the Vernier forward, the NCF->pose update, and —
when targets are present — the loss report.  The host only feeds padded
numpy batches and collects [I, 7] refined boxes.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from snvc_tpu.config import VernierConfig
from snvc_tpu.data.pipeline import InstanceBatch
from snvc_tpu.models.losses import vernier_losses
from snvc_tpu.models.vernier import VernierScale
from snvc_tpu.ops.assemble import assemble_instances, make_grid_local, make_targets
from snvc_tpu.ops.registration import ncf_to_update


def refinement_step(
    params,
    batch: Dict[str, jnp.ndarray],
    model: VernierScale,
    cfg: VernierConfig,
    grid_local,
    with_targets: bool = False,
):
    """Pure function: batch arrays -> updates (+ losses).  jit/pjit me."""
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
    outputs = model.apply(params, left, right, gpl, gpr)
    upd = ncf_to_update(
        outputs["ncf"],
        batch["samples"],
        cfg.x_range,
        cfg.z_range,
        coordinates=outputs.get("coordinates"),
    )
    result = dict(
        one_part=upd.one_part,
        all_parts=upd.all_parts,
        confidence=upd.confidence,
        keep=upd.keep,
        occupancy=outputs.get("occupancy"),
        ncf=outputs["ncf"],
        coordinates=outputs.get("coordinates"),
    )
    if with_targets:
        targets = make_targets(
            batch["samples"],
            batch["gt_boxes"],
            batch["points"],
            batch["points_valid"],
            grid_local,
            cfg,
        )
        result["losses"] = vernier_losses(outputs, targets, batch["valid"], cfg)
    return result


class RefineRunner:
    """Compiles and drives the refinement step over a pipeline."""

    def __init__(self, model: VernierScale, params, cfg: VernierConfig):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.grid_local = jnp.asarray(make_grid_local(cfg))
        self._step = {}

    def step(self, batch: InstanceBatch, with_targets: bool = False) -> Dict:
        key = bool(with_targets)
        if key not in self._step:
            self._step[key] = jax.jit(
                functools.partial(
                    refinement_step,
                    model=self.model,
                    cfg=self.cfg,
                    grid_local=self.grid_local,
                    with_targets=key,
                )
            )
        out = self._step[key](self.params, batch.arrays())
        return jax.tree.map(np.asarray, out)

    def run(
        self,
        pipeline,
        writer=None,
        with_targets: bool = False,
        progress: bool = True,
        max_batches: Optional[int] = None,
    ):
        """Reference inference loop (inference_agnostic.py:366-432)."""
        loss_log = []
        for bi, batch in enumerate(pipeline.batches()):
            if max_batches is not None and bi >= max_batches:
                break
            out = self.step(batch, with_targets=with_targets)
            if writer is not None:
                writer.add_batch(batch, out)
            if with_targets and "losses" in out:
                loss_log.append({k: float(v) for k, v in out["losses"].items()})
                if progress:
                    msg = ", ".join(f"{k}={v:.4f}" for k, v in loss_log[-1].items())
                    print(f"batch {bi}: {msg}")
            elif progress:
                print(f"batch {bi}")
        return loss_log
