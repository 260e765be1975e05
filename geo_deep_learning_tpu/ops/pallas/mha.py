"""Fused multi-head attention (forward AND backward on-chip).

Used by the DOFA ViT blocks (1297 tokens at 512² input, reference
dofa_v2.py:435-487 hot loop) and offered to MiT's SR attention. XLA's
attention materializes the [B, H, Lq, Lk] probability matrix in HBM
between the two matmuls — at DOFA-base bs8 that is ~320 MB per block per
direction, pure bandwidth. Here scores → softmax → PV run in one VMEM
pass per query tile, and the backward recomputes probabilities on-chip
from the saved logsumexp (flash-attention style), so probabilities never
touch HBM in either direction.

Scope: KV must fit VMEM whole (L ≤ ~4k at D ≤ 128) — true for every
model in this framework (DOFA 1297+pad, MiT KV ≤ 1024). No online
softmax streaming is needed at these lengths; a single-block softmax is
exact.

Falls back to the einsum composition (identical numerics) on non-TPU
backends or unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TQ = 256   # query rows per fwd grid step (also the pad granularity).
            # Swept on-chip at DOFA shapes (1297 tokens): 256 beats 128
            # (5.17 vs 5.65 ms fwd+bwd) — the larger tile's extra MXU/VPU
            # overlap outweighs the extra padding (1536 vs 1408).
_TQB = 256  # query rows per bwd inner tile (keeps bwd under the VMEM cap)
_TQB_PACKED = 128  # bwd tile rows for the packed kernel
_BWD_UNROLL = True  # fully unroll the packed bwd tile loop: Mosaic only
                    # supports unroll=1 or full, and full unroll at
                    # 128-row tiles overlaps chains across iterations —
                    # on-chip A/B: 2.71 (128/full) vs 3.49 (256/serial)
                    # vs 3.58 (128/serial) ms/call; 256/full fails to
                    # compile (vmem stack)
_TQ_PACKED = 256    # fwd tile rows for the packed kernel
_FWD_UNROLL = 1     # fwd loop unroll (full unroll at 256 rows blew the
                    # 16M scoped-vmem stack; see kernel docstring)
_NEG = -1e30
_INTERPRET = False  # set True (tests) to run the kernels in pallas
                    # interpreter mode on CPU — validates kernel logic
                    # without TPU hardware

# MXU inputs stay bf16 with f32 accumulation (preferred_element_type) —
# same contraction numerics as the XLA einsum path, and 2x the MXU rate
# of f32xf32. Softmax/statistics run in f32; probabilities are cast to
# bf16 for the PV / dV / dQ / dK matmuls exactly as _einsum_attention
# casts p to q.dtype.


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, valid, subtiles):
    k = k_ref[0, 0]  # [L, D] bf16
    v = v_ref[0, 0]  # [L, D] bf16
    # Straight-line code over SUBTILES of the query block: the per-tile
    # chain (QK matmul -> softmax -> PV matmul) strictly alternates MXU
    # and VPU; two independent chains in one program let Mosaic overlap
    # tile A's softmax with tile B's matmuls.
    for i in range(subtiles):
        sl = pl.ds(i * _TQ, _TQ)
        q = q_ref[0, 0, sl]  # [TQ, D] bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TQ, L] f32
        if valid < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, 0, sl] = o.astype(o_ref.dtype)
        # lse is [TQ] logically; stored [TQ, 8] because TPU blocks need a
        # tileable trailing pair (8 == the array's own last dim)
        lse_ref[0, 0, sl] = jnp.broadcast_to(m + jnp.log(denom), (_TQ, 8))


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, scale, valid, n_q,
):
    k = k_ref[0, 0]  # [L, D] bf16
    v = v_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (_TQB, k.shape[0]), 1)

    def body(i, carry):
        dk, dv = carry
        sl = pl.ds(i * _TQB, _TQB)
        q = q_ref[0, 0, sl]                           # [TQB, D] bf16
        g = g_ref[0, 0, sl]
        o = o_ref[0, 0, sl]
        lse = lse_ref[0, 0, sl, 0]                    # [TQB]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if valid < k.shape[0]:
            s = jnp.where(col < valid, s, _NEG)
        p = jnp.exp(s - lse[:, None])                 # [TQB, L] f32
        pb = p.astype(k.dtype)
        dv = dv + jax.lax.dot_general(
            pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(
            g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        dq_ref[0, 0, sl] = (
            jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        return dk, dv

    # UNROLLED over query tiles (n_q is small and static): straight-line
    # code lets Mosaic overlap iteration i's VPU work (exp, ds) with
    # iteration i±1's MXU matmuls, which a fori_loop body serializes —
    # measured as part of the round-2 attention-serialization follow-up.
    carry = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    for i in range(n_q):
        carry = body(i, carry)
    dk, dv = carry
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_len(n: int) -> int:
    return -(-n // _TQ) * _TQ


@functools.partial(jax.jit, static_argnames=("scale", "valid"))
def _fwd(q, k, v, scale, valid):
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    # two query tiles per program when the padded length allows (the
    # interleaved chains hide softmax VPU latency behind the matmuls)
    subtiles = 2 if lq % (2 * _TQ) == 0 else 1
    qblk = subtiles * _TQ
    grid = (b, h, lq // qblk)
    kv_spec = pl.BlockSpec(
        (1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, 1, qblk, d), lambda bi, hi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, valid=valid, subtiles=subtiles
        ),
        grid=grid,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(
            q_spec,
            pl.BlockSpec(
                (1, 1, qblk, 8), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, 8), jnp.float32),
        ),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "valid"))
def _bwd_pallas(q, k, v, o, g, lse, scale, valid):
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    full_q = pl.BlockSpec(
        (1, 1, lq, d), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    full_kv = pl.BlockSpec(
        (1, 1, lk, d), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, 1, lq, 8), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, valid=valid, n_q=lq // _TQB
        ),
        grid=(b, h),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[full_q, full_kv, full_kv, full_q, full_q, lse_spec],
        out_specs=(full_q, full_kv, full_kv),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
    )(q, k, v, o, g, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, scale, valid):
    o, _ = _fwd(q, k, v, scale, valid)
    return o


def _attention_fwd(q, k, v, scale, valid):
    o, lse = _fwd(q, k, v, scale, valid)
    return o, (q, k, v, o, lse)


def _attention_bwd(scale, valid, res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _bwd_pallas(q, k, v, o, g, lse, scale, valid)
    return dq, dk, dv


_attention.defvjp(_attention_fwd, _attention_bwd)


# --- packed token-major variant ---------------------------------------------
#
# The head-major entry point above takes q/k/v as [B, H, L, D], which the
# caller must produce with three [B, L, H, hd] -> [B, H, L, hd] transposes
# plus pads to the 256-row tile granularity — profiled at ~13-19 ms/step of
# pure layout copies around the custom calls at DOFA bs16. This variant
# consumes the QKV projection's NATURAL output — one packed [B, L, 3·H·hd]
# tensor — directly: per-GROUP [L, 128] column slices are expressed as
# BlockSpec column index maps (strided DMA folded into the kernel's own
# operand fetch; Mosaic requires the block's lane dim to be a multiple of
# 128, so ``pair = 128/hd`` heads ride in one block and are split by
# static lane slices in-kernel), and ragged lengths are handled with a
# static tile list (the edge tile is simply smaller), so NO transpose and
# NO pad ever materializes in HBM in either direction.


def _fwd_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, l, hd, pair
):
    # VMEM-stack discipline: a fully unrolled (head, tile) loop keeps
    # every chain's [TQ, L] f32 score buffer live at once and blows the
    # 16M scoped-vmem limit (measured: 17.9M at DOFA-base shapes). A
    # fori_loop body's stack is reused across iterations, so the loop
    # runs over FULL tiles with the ``pair`` head-chains interleaved
    # inside each body (independent chains -> MXU/VPU overlap), and the
    # ragged edge tile is a small straight-line epilogue.
    def chain(j, sl, size):
        cs = slice(j * hd, (j + 1) * hd)
        k = k_ref[0, :, cs]  # [L, hd] bf16
        v = v_ref[0, :, cs]
        q = q_ref[0, sl, cs]  # [size, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [size, L] f32 — L exact, no padded columns to mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, sl, cs] = o.astype(o_ref.dtype)
        lse_ref[0, j, sl] = jnp.broadcast_to(m + jnp.log(denom), (size, 8))

    tq = _TQ_PACKED

    def body(i, carry):
        sl = pl.ds(i * tq, tq)
        for j in range(pair):
            chain(j, sl, tq)
        return carry

    n_full, edge = divmod(l, tq)
    unroll = n_full if _FWD_UNROLL is True else _FWD_UNROLL
    jax.lax.fori_loop(0, n_full, body, 0, unroll=unroll)
    if edge:
        for j in range(pair):
            chain(j, pl.ds(n_full * tq, edge), edge)


def _bwd_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, scale, l, hd, pair,
):
    # Same fori-loop stack discipline as _fwd_kernel_packed; dk/dv
    # accumulators ride the loop carry. 128-row tiles keep the working
    # set (4 score-sized buffers x pair chains) under the vmem cap.
    tqb = _TQB_PACKED

    def chain(j, sl, size, dk, dv):
        cs = slice(j * hd, (j + 1) * hd)
        k = k_ref[0, :, cs]  # [L, hd] bf16
        v = v_ref[0, :, cs]
        q = q_ref[0, sl, cs]
        g = g_ref[0, sl, cs]
        o = o_ref[0, sl, cs]
        lse = lse_ref[0, j, sl, 0]  # [size]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse[:, None])  # [size, L] f32
        pb = p.astype(k.dtype)
        dv = dv + jax.lax.dot_general(
            pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(
            g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        dq_ref[0, sl, cs] = (
            jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        return dk, dv

    zero = lambda: jnp.zeros((l, hd), jnp.float32)
    carry0 = tuple(zero() for _ in range(2 * pair))

    def body(i, carry):
        sl = pl.ds(i * tqb, tqb)
        out = []
        for j in range(pair):
            dk, dv = chain(j, sl, tqb, carry[2 * j], carry[2 * j + 1])
            out += [dk, dv]
        return tuple(out)

    n_full, edge = divmod(l, tqb)
    unroll = n_full if _BWD_UNROLL is True else _BWD_UNROLL
    carry = jax.lax.fori_loop(0, n_full, body, carry0, unroll=unroll)
    acc = list(carry)
    if edge:
        sl = pl.ds(n_full * tqb, edge)
        for j in range(pair):
            acc[2 * j], acc[2 * j + 1] = chain(
                j, sl, edge, acc[2 * j], acc[2 * j + 1]
            )
    for j in range(pair):
        cs = slice(j * hd, (j + 1) * hd)
        dk_ref[0, :, cs] = acc[2 * j].astype(dk_ref.dtype)
        dv_ref[0, :, cs] = acc[2 * j + 1].astype(dv_ref.dtype)


def _pair(hd: int) -> int:
    """Heads per block so the lane dim is a 128 multiple (Mosaic rule)."""
    return max(1, 128 // hd)


@functools.partial(jax.jit, static_argnames=("h", "scale"))
def _fwd_packed(qkv, h, scale):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // h
    pair = _pair(hd)
    groups = h // pair
    chunk = lambda off: pl.BlockSpec(  # [L, pair*hd] column slice
        (1, l, pair * hd), lambda bi, gi, _o=off: (bi, 0, _o + gi),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, scale=scale, l=l, hd=hd, pair=pair
        ),
        grid=(b, groups),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[chunk(0), chunk(groups), chunk(2 * groups)],
        out_specs=(
            chunk(0),
            pl.BlockSpec(
                (1, pair, l, 8), lambda bi, gi: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, h, l, 8), jnp.float32),
        ),
    )(qkv, qkv, qkv)


@functools.partial(jax.jit, static_argnames=("h", "scale"))
def _bwd_packed(qkv, o, g, lse, h, scale):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // h
    pair = _pair(hd)
    groups = h // pair
    chunk = lambda off: pl.BlockSpec(
        (1, l, pair * hd), lambda bi, gi, _o=off: (bi, 0, _o + gi),
        memory_space=pltpu.VMEM,
    )
    lse_spec = pl.BlockSpec(
        (1, pair, l, 8), lambda bi, gi: (bi, gi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_packed, scale=scale, l=l, hd=hd, pair=pair
        ),
        grid=(b, groups),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[
            chunk(0), chunk(groups), chunk(2 * groups),
            chunk(0), chunk(0), lse_spec,
        ],
        out_specs=(chunk(0), chunk(0), chunk(0)),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        ),
    )(qkv, qkv, qkv, o, g, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _attention_packed(qkv, h, scale):
    o, _ = _fwd_packed(qkv, h, scale)
    return o


def _attention_packed_fwd(qkv, h, scale):
    o, lse = _fwd_packed(qkv, h, scale)
    return o, (qkv, o, lse)


def _attention_packed_bwd(h, scale, res, g):
    qkv, o, lse = res
    dq, dk, dv = _bwd_packed(qkv, o, g, lse, h, scale)
    # dqkv column order = [q heads | k heads | v heads] — exactly the
    # packing order, so one concat feeds the QKV GEMM's backward.
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_attention_packed.defvjp(_attention_packed_fwd, _attention_packed_bwd)


def _packed_supported(h: int, l: int, hd: int) -> bool:
    if 128 % hd != 0 or h % _pair(hd) != 0:
        return False  # blocks must tile the lane dim in 128-multiples
    # bwd VMEM per program (pair heads per block, x2 for Mosaic's block
    # double-buffering): q/k/v/o/g/dq bf16 + dk/dv f32 at [L, pair*hd]
    # + s/p/dp/ds [TQ, L] working tiles (bound by 4xf32)
    blk = l * _pair(hd) * hd
    vmem = 2 * (6 * 2 + 2 * 4) * blk + 4 * 4 * _TQ * l
    if vmem > 14 * 1024 * 1024:
        return False
    from geo_deep_learning_tpu.core.mesh import compute_mesh

    mesh = compute_mesh()
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        # tensor-parallel runs shard HEADS over the model axis — the
        # head-major path's shard_map handles that; the packed column
        # layout does not split cleanly over model.
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def fused_attention_packed(
    qkv: jnp.ndarray, num_heads: int, scale: float
) -> jnp.ndarray:
    """Attention over a packed [B, L, 3·H·hd] QKV tensor -> [B, L, H·hd].

    Column layout is the natural fused-GEMM output: all of q's heads,
    then k's, then v's. On TPU the kernel reads per-head slices straight
    from this layout (no transpose/pad materialization); elsewhere, or
    under a model-sharded mesh, it falls back to the head-major path with
    identical numerics.
    """
    b, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    if not _packed_supported(num_heads, l, hd):
        q, k, v = (
            t.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        o = fused_attention(q, k, v, scale)
        return o.transpose(0, 2, 1, 3).reshape(b, l, d)
    from jax.sharding import PartitionSpec as P

    from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

    spec = P("data", None, None)
    return maybe_shard_map(
        lambda t: _attention_packed(t, num_heads, scale), (qkv,), (spec,), spec
    )


def _einsum_attention(q, k, v, scale):
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def _supported(q, k) -> bool:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if d % 8 != 0 or d > 128:
        return False
    lq_pad, lk_pad = _pad_len(lq), max(_pad_len(lk), 8)
    # backward VMEM: k/v bf16 + dk/dv f32 [Lk,D], q/o/g/dq bf16 [Lq,D]
    # + s/p/dp/ds [TQB, Lk] working tiles (mixed f32/bf16; bound by 4xf32)
    vmem = (
        (2 * 2 + 2 * 4) * lk_pad * d
        + 4 * 2 * lq_pad * d
        + 4 * 4 * _TQB * lk_pad
    )
    if vmem > 12 * 1024 * 1024:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Attention over [B, H, L, D]; fully fused (fwd+bwd) on TPU.

    Non-multiple-of-512 lengths are zero-padded internally; padded KV
    columns are masked out of the softmax, so numerics match the unpadded
    einsum composition exactly.
    """
    if not _supported(q, k):
        return _einsum_attention(q, k, v, scale)
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_pad, lk_pad = _pad_len(lq), max(_pad_len(lk), 8)

    def pad(x, target):
        if x.shape[2] == target:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, target - x.shape[2]), (0, 0)))

    def call(q, k, v):
        out = _attention(
            pad(q, lq_pad), pad(k, lk_pad), pad(v, lk_pad), scale, lk
        )
        return out[:, :, :lq, :]

    # multi-chip: run per-device over (batch, head) via shard_map — the
    # pallas custom call is opaque to GSPMD (ops/pallas/spmd.py)
    from jax.sharding import PartitionSpec as P

    from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

    spec = P("data", "model")
    return maybe_shard_map(call, (q, k, v), (spec, spec, spec), spec)
