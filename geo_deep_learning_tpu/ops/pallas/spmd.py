"""GSPMD integration for the Pallas kernels (multi-chip execution).

Pallas ``pallas_call``s lower to custom calls that XLA's SPMD partitioner
cannot split: under a multi-device jit they would force a full reshard
(or fail to partition) instead of running per-chip. The idiomatic fix is
``shard_map`` — each device runs the kernel on its local shard and GSPMD
sees only ordinary per-device ops (reference analog: none; the reference
delegates all kernels to cuDNN, which NCCL/DDP never partitions either —
SURVEY.md §2.2).

All three kernel families in this framework are embarrassingly parallel
over their leading dims:

- attention (ops/pallas/mha.py, sr_attention.py): independent per
  (batch, head) — maps to the mesh's (data, model) axes. With tensor
  parallelism active (parallel/placement.py), the QKV projections are
  column-sharded over heads, so the head dim arrives already sharded
  over ``model`` and the shard_map constraint is a no-op.
- fused preprocessing (ops/pallas/preprocess.py): independent per batch
  row — maps to ``data``.

``maybe_shard_map`` consults the trace-time compute mesh
(core/mesh.use_compute_mesh, entered by the jitted step bodies in
training/steps.py) and wraps the kernel call when a multi-device mesh is
active. Mesh axes that do not divide the corresponding array dim are
dropped from the spec (that dim is then computed replicated — correct,
just not parallel). On single-device runs (the common bench path) the
kernel is called directly with zero overhead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

from geo_deep_learning_tpu.core.mesh import compute_mesh

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _prune_specs(
    mesh: Mesh, args: Sequence[jax.Array], specs: Sequence[P]
) -> list[P] | None:
    """Drop mesh axes that don't divide their dim; None if nothing maps.

    ``specs`` is the concatenation of in-specs (one per arg) and
    out-specs; only the in-specs are divisibility-checked — out dims are
    not known here, so every axis named in an out spec MUST also be named
    by an in spec (it then inherits that verdict). An axis appearing
    solely in out specs raises: silently pruning it would declare a
    device-varying output replicated, which corrupts results.

    Pruning is consistent across args: an axis is kept only if it divides
    the mapped dim of EVERY arg that names it (attention's q/k/v share
    batch and head dims, so in practice this is all-or-nothing).
    """
    keep: dict[str, bool] = {}
    for a, spec in zip(args, specs[: len(args)]):
        for dim, ax in enumerate(spec):
            if ax is None:
                continue
            ok = a.ndim > dim and a.shape[dim] % mesh.shape[ax] == 0
            keep[ax] = keep.get(ax, True) and ok
    for spec in specs[len(args):]:
        for ax in spec:
            if ax is not None and ax not in keep:
                msg = (
                    f"out spec names mesh axis {ax!r} that no in spec "
                    "names; shard_map out specs must reuse input-named "
                    "axes so their divisibility is established"
                )
                raise ValueError(msg)
    if not any(keep.get(ax, False) and mesh.shape[ax] > 1 for ax in keep):
        return None
    pruned = []
    for spec in specs:
        pruned.append(
            P(*[ax if ax is not None and keep.get(ax, False) else None
                for ax in spec])
        )
    return pruned


def maybe_shard_map(
    fn: Callable,
    args: Sequence[jax.Array],
    in_specs: Sequence[P],
    out_spec: P | tuple[P, ...],
):
    """Run ``fn(*args)`` per-device over the ambient compute mesh.

    ``in_specs``/``out_spec`` name the INTENDED mapping (e.g.
    ``P("data", "model")`` over [B, H, L, D]); axes that don't divide or
    aren't active are pruned. ``out_spec`` may be a tuple for multi-output
    kernels. Returns ``fn(*args)`` unwrapped when no multi-device mesh is
    ambient — the single-chip hot path pays nothing.
    """
    mesh = compute_mesh()
    if mesh is None or mesh.size == 1:
        return fn(*args)
    outs = list(out_spec) if isinstance(out_spec, tuple) else [out_spec]
    pruned = _prune_specs(mesh, args, list(in_specs) + outs)
    if pruned is None:
        return fn(*args)
    n_in = len(in_specs)
    out_pruned = (
        tuple(pruned[n_in:]) if isinstance(out_spec, tuple) else pruned[n_in]
    )
    return _shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(pruned[:n_in]),
        out_specs=out_pruned,
        check_vma=False,
    )(*args)
