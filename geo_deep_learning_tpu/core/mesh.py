"""Device mesh and topology management.

TPU-native replacement for the reference's NCCL/DDP strategy layer
(reference: Lightning ``DDPStrategy`` wiring in configs/dofa_config_RGB.yaml:6-10
and ``torch.distributed`` rank queries in datasets/wds_dataset.py:397-401).

On TPU there is no user-level NCCL analog: collectives are emitted by XLA
from sharding annotations. This module owns the things the reference
scattered across Lightning:

- ``jax.distributed`` initialization for multi-host (DCN) runs,
- the global ``Mesh`` whose axes name every parallelism dimension,
- canonical shardings (batch-sharded vs replicated),
- host-0-only execution guards (reference: ``rank_zero_only``).

Mesh convention: axes ``("data", "model")``. The reference only ever uses
data parallelism (SURVEY.md §2.3), so ``model`` defaults to size 1, but the
mesh is always 2-D so tensor-parallel shardings can be enabled without
re-plumbing call sites. Data parallelism rides ICI within a slice and DCN
across hosts automatically via device order.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import threading
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"

# --- trace-time compute-mesh context ---------------------------------------
# Pallas custom calls are opaque to GSPMD: under a multi-device jit XLA
# cannot infer a partitioning for a ``pallas_call``, so kernels must be
# wrapped in ``shard_map`` to run per-shard. The kernels live deep inside
# Flax modules that know nothing about meshes; this context communicates
# the active mesh to them at TRACE time (the jitted step bodies enter it,
# see training/steps.py), so kernel wrappers (ops/pallas/spmd.py) can
# shard_map themselves over their embarrassingly-parallel dims.
_COMPUTE_MESH = threading.local()


def compute_mesh() -> Mesh | None:
    """The mesh the current trace is being partitioned over (or None)."""
    return getattr(_COMPUTE_MESH, "mesh", None)


@contextlib.contextmanager
def use_compute_mesh(mesh: Mesh | None) -> Iterator[None]:
    """Declare ``mesh`` as the ambient compute mesh for code traced inside.

    A no-op for ``None`` or single-device meshes at the consumer side;
    nesting restores the previous value on exit.
    """
    prev = compute_mesh()
    _COMPUTE_MESH.mesh = mesh
    try:
        yield
    finally:
        _COMPUTE_MESH.mesh = prev


@dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh shape. ``data=-1`` means "all remaining devices"."""

    data: int = -1
    model: int = 1


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX if requested via args or env.

    Single-host runs (the common case, incl. tests) are a no-op. The
    reference relied on Lightning to spawn one process per GPU; on TPU
    each host process sees its local chips and XLA handles cross-host
    collectives over DCN once ``jax.distributed`` is initialized.
    """
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )


def create_mesh(config: MeshConfig | None = None, devices: list | None = None) -> Mesh:
    """Build the global 2-D ``("data", "model")`` mesh.

    Device order follows ``jax.devices()`` which enumerates ICI-contiguous
    devices first, so the (fast-moving) model axis lands on ICI neighbors
    and the data axis spans the remainder.
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = config.model
    data = config.data if config.data != -1 else n // model
    if data * model != n:
        msg = f"mesh {data}x{model} does not match {n} devices"
        raise ValueError(msg)
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: shard dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, scalars) for pure-DP runs."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host-side batch pytree onto the mesh, sharded on dim 0.

    Non-array leaves (e.g. lists of image names) pass through untouched.
    Arrays whose leading dim does not divide the data-axis size (e.g. a
    small debug batch on a big mesh) are replicated instead — correct,
    just not parallel; size your global batch as a multiple of the data
    axis for real runs.
    """
    data_size = mesh.shape[DATA_AXIS]
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)

    def _put(leaf):
        if isinstance(leaf, (np.ndarray, jax.Array)):
            fits = leaf.ndim > 0 and leaf.shape[0] % data_size == 0
            return jax.device_put(leaf, sharded if fits else replicated)
        return leaf

    return jax.tree.map(_put, batch)


def local_batch_to_global(batch: Any, mesh: Mesh) -> Any:
    """Assemble per-process local batches into a global sharded array.

    Multi-host equivalent of ``shard_batch``: each process contributes its
    local shard (reference analog: per-rank DataLoader shards under DDP).
    """
    sharding = batch_sharding(mesh)

    def _put(leaf):
        if isinstance(leaf, (np.ndarray, jax.Array)):
            return jax.make_array_from_process_local_data(sharding, np.asarray(leaf))
        return leaf

    return jax.tree.map(_put, batch)


def is_host0() -> bool:
    """True on the coordinating process (reference analog: global rank 0).

    Resilient to an uninitializable backend (e.g. host-side data tooling
    run with a broken accelerator env): logging/config paths must not
    require a device, so failures default to True (single process).
    """
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


def host0_only(fn: Callable) -> Callable:
    """Decorator: run ``fn`` only on process 0 (reference: ``rank_zero_only``,
    datasets/csv_dataset.py:19-22)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_host0():
            return fn(*args, **kwargs)
        return None

    return wrapper
