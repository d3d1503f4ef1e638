"""Multi-host (multi-node) device meshes over DCN.

The TPU-native replacement for the reference's RPC backend
(ggml/src/ggml-rpc/ggml-rpc.cpp: a socket protocol shipping tensors to
worker processes): JAX's runtime already federates hosts into one global
device set via `jax.distributed`, so multi-node is a MESH-SHAPE decision,
not a wire protocol.  Slow DCN (data-center network) axes go OUTERMOST
and carry only batch-granular collectives (data parallelism / pipeline
stage hops); fast ICI axes stay innermost and carry the per-layer
tensor-parallel collectives.  This is the hybrid-mesh recipe of the
scaling playbook ("How to Scale Your Model"): dp over DCN, tp over ICI.

init_distributed() is env-driven (COORDINATOR_ADDRESS / NUM_PROCESSES /
PROCESS_ID, the standard jax.distributed variables) so the same binary
serves single-host and multi-host launches.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or environment; no-op (False)
    for single-process runs.  Env: JAX_COORDINATOR_ADDRESS (host:port),
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — or the standard cloud-TPU
    auto-detection when none are set but multiple hosts exist."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0") or 0
    )
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(dcn: int = 1, dp: int = 1, tp: int | None = None,
                     devices=None) -> Mesh:
    """("dcn", "dp", "tp") mesh: `dcn` outermost (crosses hosts when the
    device set spans hosts), then dp, then tp innermost on ICI.

    With a true multi-host device set this uses
    mesh_utils.create_hybrid_device_mesh so the dcn axis aligns with host
    boundaries; on one host (or the virtual CPU mesh) it reshapes —
    semantically identical, collectives just ride one fabric."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dcn * dp)
    assert dcn * dp * tp == n, f"dcn({dcn})*dp({dp})*tp({tp}) != {n} devices"

    n_hosts = len({getattr(d, "process_index", 0) for d in devices})
    arr = None
    if n_hosts > 1 and dcn == n_hosts:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(dp, tp), dcn_mesh_shape=(dcn, 1), devices=devices,
            )  # -> (dcn*dp, tp), dcn varying slowest
            arr = np.asarray(arr).reshape(dcn, dp, tp)
        except ValueError:
            # multi-process CPU clusters report a single slice; order by
            # process so the dcn axis still aligns with host boundaries
            arr = np.asarray(sorted(
                devices, key=lambda d: (getattr(d, "process_index", 0), d.id)
            )).reshape(dcn, dp, tp)
    if arr is None:
        arr = np.asarray(devices).reshape(dcn, dp, tp)
    return Mesh(arr, axis_names=("dcn", "dp", "tp"))


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh axes that shard the batch dimension (all non-tp, non-pp
    axes): ("dcn", "dp") on hybrid meshes, ("dp",) on single-host."""
    return tuple(a for a in mesh.axis_names if a in ("dcn", "dp"))
