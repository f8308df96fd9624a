"""Device-mesh parallelism for snvc_tpu.

The reference's only parallelism is single-process DataParallel
(tools/inference_agnostic.py:472, SURVEY.md §2.3).  Here scaling is a
single pjit program over a jax.sharding.Mesh:

  * axis "data": instances (Vernier) or stereo pairs (global model) are
    sharded across ICI; gradients all-reduce via XLA-inserted psums,
  * axis "model": optional tensor parallelism — sharding constraints on
    the voxel/cost-volume channel axis let XLA partition the 3D convs,

with no explicit communication library — the XLA runtime is the backend.
Multi-host runs initialize jax.distributed and use the same code path
(DCN between hosts, ICI within).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    n_model: int = 1,
) -> Mesh:
    """Initialize multi-host (DCN) execution and build the global mesh.

    Calls jax.distributed.initialize (a no-op degenerate case when the
    arguments resolve to a single process — e.g. on TPU pods the
    coordinator/process topology is auto-detected from the environment,
    and a 1-process job needs no coordinator), then lays out the mesh so
    the "data" axis's inter-host boundaries ride DCN while the "model"
    axis stays inside a host's ICI domain: jax.devices() enumerates local
    devices of each process contiguously, and make_mesh's row-major
    reshape therefore keeps each host's devices on adjacent "data" rows
    with "model" varying fastest (never crossing hosts for n_model <=
    local device count).

    Replaces the reference's single-process DataParallel ceiling
    (tools/inference_agnostic.py:472) — the train steps themselves are
    topology-agnostic pjit programs and need no change.
    """
    explicit_multi = coordinator_address or (
        num_processes is not None and num_processes > 1
    )
    # auto-detection is only meaningful inside a managed pod environment;
    # calling jax.distributed.initialize with all-defaults on a plain
    # single-host machine raises (or hangs waiting for a coordinator)
    pod_env = any(
        os.environ.get(k)
        for k in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "SLURM_JOB_NUM_NODES",
            "OMPI_COMM_WORLD_SIZE",
        )
    )
    if explicit_multi or (num_processes is None and pod_env):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    # else: single process (explicit num_processes=1 or no detectable pod
    # environment) — jax works without a coordinator
    local = jax.local_device_count()
    assert n_model <= local, (
        f"model axis {n_model} would cross host boundaries "
        f"(local devices: {local}); keep tensor parallelism on ICI"
    )
    return make_mesh(n_data=-1, n_model=n_model)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


# Per-field layout of an InstanceBatch: instance-indexed arrays shard over
# "data"; frame-level images and calibs are replicated (each data shard
# gathers its own ROIs from the same frame).
_INSTANCE_FIELDS = (
    "image_idx",
    "trans_l",
    "trans_r",
    "samples",
    "valid",
    "gt_boxes",
    "points",
    "points_valid",
)


def instance_batch_specs() -> Dict[str, P]:
    specs = {k: P("data") for k in _INSTANCE_FIELDS}
    for k in ("images_left", "images_right", "P_left", "P_right"):
        specs[k] = P()
    return specs


def shard_instance_batch(arrays: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = instance_batch_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in arrays.items()
    }
