"""End-to-end jitted refinement + host driver.

Covers the reference's whole per-batch path
(tools/inference_agnostic.py:366-432) on device: batch assembly (ROI warps
+ grid projection), the Vernier forward, the NCF->pose update, and — when
targets are present — the loss report.

The pipeline is deliberately split into THREE chained XLA programs
(assemble+encode | 3D head | update+losses): device arrays flow between
them with no host sync, while keeping each program small — fusing the 2D
extractor and the 3D conv stack into one program inflates TPU compile time
from ~40 s to tens of minutes (measured on v5e).  ``monolithic=True``
restores the single-program path (used by training, where autodiff needs
one traced function anyway).
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
from snvc_tpu.models.vernier import (
    VernierEncoder,
    VernierHead,
    VernierScale,
    scope_variables,
)
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
    """Single-program step (training / dryrun).  jit/pjit me."""
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
    return _finalize(outputs, batch, cfg, grid_local, with_targets)


def _compiled_cost(jitted, *args, **kwargs):
    """Analytical cost of one dispatch from the compiled executable's
    cost analysis: {"flops", "bytes_accessed"} (None when the backend has
    no cost model).  bytes_accessed is XLA's HBM-traffic estimate — the
    numerator of the memory-roofline readout."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


def _compiled_flops(jitted, *args, **kwargs):
    cost = _compiled_cost(jitted, *args, **kwargs)
    return None if cost is None else cost["flops"]


def _finalize(outputs, batch, cfg, grid_local, with_targets):
    upd = ncf_to_update(
        outputs["ncf"],
        batch["samples"],
        cfg.x_range,
        cfg.z_range,
        coordinates=outputs.get("coordinates"),
        filter_min=cfg.filter_min,
        filter_max=cfg.filter_max,
        decode=cfg.ncf_decode,
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
    """Compiles and drives the refinement pipeline."""

    def __init__(self, model: VernierScale, params, cfg: VernierConfig,
                 monolithic: bool = False, mesh=None):
        """``mesh``: a jax.sharding.Mesh with a "data" axis for
        data-parallel serving — params replicate, instances shard over
        the axis with the SAME specs training uses (shared frame images
        replicated, per-instance arrays split on their leading axis);
        max_instances must divide the axis size."""
        self.model = model
        self.params = params
        self.cfg = cfg
        self.grid_local = jnp.asarray(make_grid_local(cfg))
        self.monolithic = monolithic
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = jax.device_put(
                params, NamedSharding(mesh, PartitionSpec())
            )
        else:
            # pin host param trees on device once: numpy args to a jitted
            # fn re-upload per dispatch (whole param set, every batch)
            self.params = jax.device_put(params)
        self.encoder = VernierEncoder(cfg)
        self.head = VernierHead(cfg)
        self._progs = {}

    # -- split-program path -------------------------------------------
    def _build_programs(self, with_targets: bool):
        cfg, grid_local = self.cfg, self.grid_local

        @jax.jit
        def encode(enc_vars, batch):
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
            return self.encoder.apply(enc_vars, left, right, gpl, gpr)

        @jax.jit
        def heads(head_vars, voxel):
            return self.head.apply(head_vars, voxel)

        @functools.partial(jax.jit, static_argnames=("wt",))
        def finalize(outputs, batch, wt):
            return _finalize(outputs, batch, cfg, grid_local, wt)

        return encode, heads, finalize

    # outputs pulled to host by default: the serving payload only — the
    # dense NCF/occupancy stay on device unless asked for (their transfer
    # dominates step latency through the axon tunnel)
    HOST_OUTPUTS = ("one_part", "all_parts", "confidence", "keep", "losses")

    def step(
        self,
        batch: InstanceBatch,
        with_targets: bool = False,
        host_outputs=None,
    ) -> Dict:
        arrays = batch.arrays()
        if self.mesh is not None:
            from snvc_tpu.parallel.api import shard_instance_batch

            arrays = shard_instance_batch(arrays, self.mesh)
        if self.monolithic:
            key = ("mono", with_targets)
            if key not in self._progs:
                self._progs[key] = jax.jit(
                    functools.partial(
                        refinement_step,
                        model=self.model,
                        cfg=self.cfg,
                        grid_local=self.grid_local,
                        with_targets=with_targets,
                    )
                )
            out = self._progs[key](self.params, arrays)
        else:
            if "split" not in self._progs:
                self._progs["split"] = self._build_programs(with_targets)
            encode, heads, finalize = self._progs["split"]
            enc_vars = scope_variables(self.params, "encoder")
            head_vars = scope_variables(self.params, "head")
            voxel = encode(enc_vars, arrays)
            outputs = heads(head_vars, voxel)
            out = finalize(outputs, arrays, with_targets)
        wanted = self.HOST_OUTPUTS if host_outputs is None else host_outputs
        return {
            k: (jax.tree.map(np.asarray, v) if (k in wanted and v is not None) else v)
            for k, v in out.items()
        }

    def cost_stats(self, batch: InstanceBatch, with_targets: bool = False):
        """Analytical cost of one refinement step (sum over the three
        chained XLA programs), from the compiled executables'
        cost_analysis: {"flops", "bytes_accessed"}.  Returns None when the
        backend exposes no cost model.  Used by bench.py's MFU/HBM
        roofline accounting."""
        arrays = batch.arrays()
        if "split" not in self._progs:
            self._progs["split"] = self._build_programs(with_targets)
        encode, heads, finalize = self._progs["split"]
        enc_vars = scope_variables(self.params, "encoder")
        head_vars = scope_variables(self.params, "head")
        voxel = encode(enc_vars, arrays)
        outputs = heads(head_vars, voxel)
        total = {"flops": 0.0, "bytes_accessed": 0.0}
        for fn, args, kw in (
            (encode, (enc_vars, arrays), {}),
            (heads, (head_vars, voxel), {}),
            (finalize, (outputs, arrays), {"wt": with_targets}),
        ):
            c = _compiled_cost(fn, *args, **kw)
            if c is None:
                return None
            for k in total:
                total[k] += c[k]
        return total


    def run(
        self,
        pipeline,
        writer=None,
        with_targets: bool = False,
        progress: bool = True,
        max_batches: Optional[int] = None,
        prefetch: int = 0,
    ):
        """Reference inference loop (inference_agnostic.py:366-432).

        ``prefetch > 0`` pipelines serving: up to that many batches are
        dispatched ahead before the oldest outputs are pulled to host, so
        host batch prep and the per-program dispatch RTT overlap device
        compute (JAX dispatch is async; only the host transfer blocks).
        Measured 31 -> 500 inst/s on tiny configs through the ~25 ms
        axon tunnel RTT (BENCH.md).  Output order is preserved."""
        from collections import deque

        loss_log = []

        def finish(bi, batch, out):
            out = {
                k: (
                    jax.tree.map(np.asarray, v)
                    if (k in self.HOST_OUTPUTS and v is not None)
                    else v
                )
                for k, v in out.items()
            }
            if writer is not None:
                writer.add_batch(batch, out)
            if with_targets and "losses" in out:
                loss_log.append({k: float(v) for k, v in out["losses"].items()})
                if progress:
                    msg = ", ".join(
                        f"{k}={v:.4f}" for k, v in loss_log[-1].items()
                    )
                    print(f"batch {bi}: {msg}")
            elif progress:
                print(f"batch {bi}")

        pending = deque()
        for bi, batch in enumerate(pipeline.batches()):
            if max_batches is not None and bi >= max_batches:
                break
            if prefetch > 0:
                pending.append(
                    (bi, batch, self.step(batch, with_targets=with_targets,
                                          host_outputs=()))
                )
                while len(pending) > prefetch:
                    finish(*pending.popleft())
            else:
                finish(bi, batch, self.step(batch, with_targets=with_targets))
        while pending:
            finish(*pending.popleft())
        return loss_log
