"""Fused spatial-reduction attention kernel (MiT stage-1 hot path).

At 512² inputs, MiT stage 1 attends 128×128 = 16384 query tokens against
sr-reduced 256 KV tokens (SURVEY.md §3.1 hot loop). XLA materializes the
[B, H, 16384, 256] probability matrix in HBM between the two matmuls
(bf16: 8 MB per image) — pure bandwidth waste since the KV block easily
fits VMEM. This kernel tiles queries and computes scores → softmax → PV
in one VMEM pass, never writing probabilities to HBM.

Because the KV length after spatial reduction is small (≤1024 for every
MiT config at practical sizes), no online-softmax streaming over KV
blocks is needed — a single-block softmax is exact.

Backward: a `jax.custom_vjp` recomputes probabilities with plain einsums
(exactly what XLA's backward would do); the memory win is in the forward.

Falls back to the einsum composition on non-TPU backends, unsupported
shapes, or Pallas compile failure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# query tile: rows per grid step (8-divisible; 512 divides every MiT Lq)
_TQ = 512
_INTERPRET = False  # True in tests: pallas interpreter mode on CPU


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # [TQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [Lk, D]
    v = v_ref[0, 0].astype(jnp.float32)  # [Lk, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [TQ, Lk]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [TQ, D]
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _pallas_attention(q, k, v, scale):
    """q [B, H, Lq, D]; k/v [B, H, Lk, D] → [B, H, Lq, D]."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    grid = (b, h, lq // _TQ)
    kv_spec = pl.BlockSpec(
        (1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, _TQ, d),
                lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _TQ, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        interpret=_INTERPRET,
    )(q, k, v)


def _einsum_attention(q, k, v, scale):
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, scale):
    return _pallas_attention(q, k, v, scale)


def _attention_fwd(q, k, v, scale):
    return _pallas_attention(q, k, v, scale), (q, k, v)


def _attention_bwd(scale, res, g):
    q, k, v = res
    # recompute probabilities (standard attention backward, XLA einsums)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention.defvjp(_attention_fwd, _attention_bwd)


def _supported(q, k) -> bool:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if lq % _TQ != 0 or lq < _TQ:
        return False
    if lk % 8 != 0:  # KV rows feed the 8-sublane tile
        return False
    # KV + scores tile must fit comfortably in VMEM
    vmem_bytes = 4 * (2 * lk * d + _TQ * lk + 2 * _TQ * d)
    if vmem_bytes > 8 * 1024 * 1024:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def sr_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Attention over [B, H, L, D] tensors; fused on TPU when supported."""
    if not _supported(q, k):
        return _einsum_attention(q, k, v, scale)
    # multi-chip: run per-device over (batch, head) via shard_map — the
    # pallas custom call is opaque to GSPMD (ops/pallas/spmd.py)
    from jax.sharding import PartitionSpec as P

    from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

    spec = P("data", "model")
    return maybe_shard_map(
        lambda q, k, v: _attention(q, k, v, scale), (q, k, v),
        (spec, spec, spec), spec,
    )
