"""Fused LayerNorm (forward AND backward on-chip) for the ViT stacks.

The DOFA encoder applies LayerNorm over D=768 at 16x1297 tokens 26+
times per step (reference dofa_v2.py ViT blocks, norm1/norm2 + final
norm). XLA's lowering is correct but slow: the per-token mean/variance
are LANE-dimension reductions, which the VPU does with log2(128)
cross-lane shuffles, and the backward splits into separate
multiply_reduce fusions for dgamma/dbeta — the device profile at DOFA
bs16 showed 117 token-dim LN-family fusions costing 44.6 ms/step, ~4x
the HBM speed-of-light for the bytes they touch.

This kernel makes every lane reduction an MXU matvec (dot with a ones
matrix — the systolic array reduces the D lanes at full rate), runs
normalize/scale/bias in the same VMEM pass, and in the backward emits
dx plus per-tile dgamma/dbeta partials in one read of (x, dy).
Statistics are f32 throughout (flax promotes to f32 too,
use_fast_variance semantics: var = E[x^2] - E[x]^2).

Layout: tokens are tiled straight from [B, L, D] with (1, TN, D)
blocks — Mosaic's block rule only constrains the BLOCK's trailing dims
(TN % 8, D % 128), not divisibility of L, so DOFA's ragged 1297 needs
no padding: the edge block's out-of-bounds rows are undefined on input
and dropped on write, which is safe per-row (LayerNorm is row-local);
the only cross-row outputs — the dgamma/dbeta partials — mask edge rows
with an iota test before summing.

Falls back to a plain XLA composition (identical math) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TN = 256  # token rows per block
_INTERPRET = False  # True in tests: pallas interpreter mode on CPU


def _lane_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the lane (last) dim as an MXU matvec -> [rows, 1]."""
    ones = jnp.ones((x.shape[-1], 8), x.dtype)
    return jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, :1]


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps):
    d = x_ref.shape[-1]
    gamma = g_ref[0, 0].astype(jnp.float32)  # [D]
    beta = b_ref[0, 0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)  # [TN, D]
    mu = _lane_sum(x) / d
    var = jnp.maximum(_lane_sum(x * x) / d - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x - mu) * rstd) * gamma + beta
    y_ref[0] = y.astype(y_ref.dtype)
    mu_ref[0] = jnp.broadcast_to(mu, (x.shape[0], 8))
    rs_ref[0] = jnp.broadcast_to(rstd, (x.shape[0], 8))


def _bwd_kernel(
    x_ref, dy_ref, g_ref, mu_ref, rs_ref, dx_ref, dg_ref, db_ref, *, l
):
    d = x_ref.shape[-1]
    gamma = g_ref[0, 0].astype(jnp.float32)  # [D]
    x = x_ref[0].astype(jnp.float32)  # [TN, D]
    dy = dy_ref[0].astype(jnp.float32)
    mu = mu_ref[0, :, :1]  # [TN, 1]
    rstd = rs_ref[0, :, :1]
    xhat = (x - mu) * rstd
    a = dy * gamma
    t1 = _lane_sum(a) / d  # mean(a)
    t2 = _lane_sum(a * xhat) / d  # mean(a * xhat)
    dx_ref[0] = (rstd * (a - t1 - xhat * t2)).astype(dx_ref.dtype)
    # Edge-block rows beyond L hold undefined input data; their dx rows
    # are dropped by the out-of-bounds write, but the partials SUM over
    # rows, so mask them out explicitly.
    rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    valid = rows + pl.program_id(1) * x.shape[0] < l
    # mask the PRODUCTS (not just dy): undefined edge data may be NaN,
    # and 0 * NaN would still poison the sums. Partials are stored
    # broadcast over 8 sublanes (blocks need a tileable (8, D) trailing
    # pair); the caller reads sublane 0.
    dg = jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0)
    db = jnp.sum(jnp.where(valid, dy, 0.0), axis=0)
    dg_ref[0, 0] = jnp.broadcast_to(dg, (8, d))
    db_ref[0, 0] = jnp.broadcast_to(db, (8, d))


def _fwd_res_kernel(
    x_ref, br_ref, g_ref, b_ref, s_ref, y_ref, mu_ref, rs_ref, *, eps
):
    """Residual-fused forward: s = x + branch; y = LN(s).

    Folding the residual add into the kernel recovers the fusion XLA
    loses at the custom-call boundary (the add otherwise runs as its own
    HBM pass — measured 5.6 ms/step of multiply_add fusions at DOFA bs16).
    """
    d = x_ref.shape[-1]
    gamma = g_ref[0, 0].astype(jnp.float32)
    beta = b_ref[0, 0].astype(jnp.float32)
    s = x_ref[0].astype(jnp.float32) + br_ref[0].astype(jnp.float32)
    mu = _lane_sum(s) / d
    var = jnp.maximum(_lane_sum(s * s) / d - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((s - mu) * rstd) * gamma + beta
    s_ref[0] = s.astype(s_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)
    mu_ref[0] = jnp.broadcast_to(mu, (s.shape[0], 8))
    rs_ref[0] = jnp.broadcast_to(rstd, (s.shape[0], 8))


def _bwd_res_kernel(
    s_ref, dy_ref, ds_in_ref, g_ref, mu_ref, rs_ref,
    dx_ref, dg_ref, db_ref, *, l,
):
    """Residual-fused backward: dx = dbranch = ds_in + LN_dx(dy)."""
    d = s_ref.shape[-1]
    gamma = g_ref[0, 0].astype(jnp.float32)
    s = s_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    mu = mu_ref[0, :, :1]
    rstd = rs_ref[0, :, :1]
    xhat = (s - mu) * rstd
    a = dy * gamma
    t1 = _lane_sum(a) / d
    t2 = _lane_sum(a * xhat) / d
    dx = rstd * (a - t1 - xhat * t2) + ds_in_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
    valid = rows + pl.program_id(1) * s.shape[0] < l
    dg = jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0)
    db = jnp.sum(jnp.where(valid, dy, 0.0), axis=0)
    dg_ref[0, 0] = jnp.broadcast_to(dg, (8, d))
    db_ref[0, 0] = jnp.broadcast_to(db, (8, d))


def _n_tiles(l: int) -> int:
    return -(-l // _TN)


@functools.partial(jax.jit, static_argnames=("eps",))
def _fwd(x, gamma, beta, eps):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = x.shape
    nt = _n_tiles(l)
    row = lambda: pl.BlockSpec(
        (1, _TN, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    vec = lambda: pl.BlockSpec(
        (1, 1, d), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
    )
    stat = lambda: pl.BlockSpec(
        (1, _TN, 8), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(b, nt),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[row(), vec(), vec()],
        out_specs=(row(), stat(), stat()),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, l, 8), jnp.float32),
        ),
    )(x, gamma.reshape(1, 1, d), beta.reshape(1, 1, d))


@jax.jit
def _bwd(x, dy, gamma, mu, rstd):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = x.shape
    nt = _n_tiles(l)
    row = lambda: pl.BlockSpec(
        (1, _TN, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    vec = lambda: pl.BlockSpec(
        (1, 1, d), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
    )
    stat = lambda: pl.BlockSpec(
        (1, _TN, 8), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    part = lambda: pl.BlockSpec(
        (1, 1, 8, d), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
    )
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, l=l),
        grid=(b, nt),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[row(), row(), vec(), stat(), stat()],
        out_specs=(row(), part(), part()),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, nt, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 8, d), jnp.float32),
        ),
    )(x, dy, gamma.reshape(1, 1, d), mu, rstd)
    return (
        dx,
        dgp[:, :, 0, :].sum(axis=(0, 1)),
        dbp[:, :, 0, :].sum(axis=(0, 1)),
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def _fwd_res(x, branch, gamma, beta, eps):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = x.shape
    nt = _n_tiles(l)
    row = lambda: pl.BlockSpec(
        (1, _TN, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    vec = lambda: pl.BlockSpec(
        (1, 1, d), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
    )
    stat = lambda: pl.BlockSpec(
        (1, _TN, 8), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_res_kernel, eps=eps),
        grid=(b, nt),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[row(), row(), vec(), vec()],
        out_specs=(row(), row(), stat(), stat()),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, l, 8), jnp.float32),
        ),
    )(x, branch, gamma.reshape(1, 1, d), beta.reshape(1, 1, d))


@jax.jit
def _bwd_res(s, dy, ds_in, gamma, mu, rstd):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = s.shape
    nt = _n_tiles(l)
    row = lambda: pl.BlockSpec(
        (1, _TN, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    vec = lambda: pl.BlockSpec(
        (1, 1, d), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
    )
    stat = lambda: pl.BlockSpec(
        (1, _TN, 8), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    part = lambda: pl.BlockSpec(
        (1, 1, 8, d), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
    )
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_bwd_res_kernel, l=l),
        grid=(b, nt),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        in_specs=[row(), row(), row(), vec(), stat(), stat()],
        out_specs=(row(), part(), part()),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), s.dtype),
            jax.ShapeDtypeStruct((b, nt, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 8, d), jnp.float32),
        ),
    )(s, dy, ds_in, gamma.reshape(1, 1, d), mu, rstd)
    return (
        dx,
        dgp[:, :, 0, :].sum(axis=(0, 1)),
        dbp[:, :, 0, :].sum(axis=(0, 1)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _layernorm_res(x, branch, gamma, beta, eps):
    s, y, _, _ = _fwd_res(x, branch, gamma, beta, eps)
    return s, y


def _layernorm_res_fwd(x, branch, gamma, beta, eps):
    s, y, mu, rstd = _fwd_res(x, branch, gamma, beta, eps)
    return (s, y), (s, gamma, mu, rstd)


def _layernorm_res_bwd(eps, res, g):
    s, gamma, mu, rstd = res
    g_s, g_y = g
    dx, dgamma, dbeta = _bwd_res(s, g_y, g_s, gamma, mu, rstd)
    return dx, dx, dgamma, dbeta


_layernorm_res.defvjp(_layernorm_res_fwd, _layernorm_res_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layernorm(x, gamma, beta, eps):
    y, _, _ = _fwd(x, gamma, beta, eps)
    return y


def _layernorm_fwd(x, gamma, beta, eps):
    y, mu, rstd = _fwd(x, gamma, beta, eps)
    return y, (x, gamma, mu, rstd)


def _layernorm_bwd(eps, res, g):
    x, gamma, mu, rstd = res
    dx, dgamma, dbeta = _bwd(x, g, gamma, mu, rstd)
    return dx, dgamma, dbeta


_layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


def _supported(b: int, l: int, d: int) -> bool:
    # Lane dim must tile cleanly; the working set is a handful of
    # [TN, d] f32 tiles (~6 x 0.75 MB at d=768) — far under the 16M
    # scoped-vmem cap for any d this framework uses.
    if d % 128 != 0 or d > 4096 or l < 8:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def fused_layernorm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm over the last dim of [B, L, D] (f32 stats, bf16-safe).

    Fully fused fwd+bwd on TPU; identical-math XLA composition elsewhere.
    The sharding story matches ops/pallas/spmd.py: per-device over the
    batch via shard_map when a multi-device mesh is ambient.
    """
    b, l, d = x.shape
    if not _supported(b, l, d):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (
            y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        ).astype(x.dtype)
    from jax.sharding import PartitionSpec as P

    from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

    spec = P("data", None, None)
    pspec = P(None)
    return maybe_shard_map(
        lambda t, g_, b_: _layernorm(t, g_, b_, eps),
        (x, gamma, beta),
        (spec, pspec, pspec),
        spec,
    )


def fused_layernorm_residual(
    x: jnp.ndarray,
    branch: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``s = x + branch; y = LayerNorm(s)`` in one fused pass.

    Returns ``(s, y)`` — the updated residual stream and its norm. The
    backward likewise emits ``ds = dbranch`` in one kernel, so neither
    the add nor its gradient fan-in ever runs as a separate HBM pass.
    Identical-math XLA composition off-TPU.
    """
    b, l, d = x.shape
    if not _supported(b, l, d):
        s = x + branch
        sf = s.astype(jnp.float32)
        mu = jnp.mean(sf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(sf * sf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (sf - mu) * jax.lax.rsqrt(var + eps)
        y = (
            y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        ).astype(s.dtype)
        return s, y
    from jax.sharding import PartitionSpec as P

    from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

    spec = P("data", None, None)
    pspec = P(None)
    return maybe_shard_map(
        lambda t, br, g_, b_: _layernorm_res(t, br, g_, b_, eps),
        (x, branch, gamma, beta),
        (spec, spec, pspec, pspec),
        (spec, spec),
    )
