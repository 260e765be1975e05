"""W-packed 3x3 conv + BN-train statistics in one Pallas kernel.

The UNet++ finest dense column (decoders/unetpp.py) runs its 3x3 convs
at C=64 — half the TPU's 128-lane tile — so XLA executes them at <=50%
MXU utilization AND re-reads every conv output from HBM in 2x
lane-padded layout for the BatchNorm statistics pass (the measured
93.9 ms/step ``convert_reduce`` family, BASELINE.md "W-pack study").
Round 4 measured the XLA-level fix (W-packed tensors, block kernels):
the convs and reduces got faster, but XLA layout assignment charged
~49 ms of copies at the custom-call boundaries — a net loss.

This kernel measures the remaining lever (ROADMAP item 1 / VERDICT r4
item 1): do the packed conv AND the statistics INSIDE one kernel, so

- tensors live in HBM only in the packed [B, H, W/2, 128] layout (full
  128-lane tiles, no padding waste; pack/unpack happens once per column
  at its boundaries, not per conv),
- the 3x3 conv runs as 9 shifted [M,128]x[128,128] MXU matmuls against
  the block-packed kernel (pack_w_kernel: exact math, 2x FLOPs of the
  unpacked conv but full lanes — the trade XLA itself measured 1.35x
  faster per conv),
- BN-train statistics (sum, sum of squares) come out of the SAME VMEM
  residency as the conv result — the separate HBM stats pass vanishes,
- the previous node's BN scale/shift + ReLU are applied on the fly in
  the prologue (two-pass BN semantics preserved: statistics of node k
  are finalized on host-side scalars before node k+1's kernel runs).

Forward-only: this module exists to MEASURE the lever against XLA end
to end at the production column shapes (scripts/bench_pallas_column.py)
before any production integration. Math is exact (f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests for CPU interpreter mode
_STRIP = 32  # rows per in-kernel accumulation strip (VMEM budget knob)


def pack_w_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] -> [3, 3, 2C, 2O] W-packed block kernel.

    Rows index input (pair-slot) blocks, cols output slots:
    out_even = K0*x_even + K+1*x_odd + K-1*(left pair's odd)
    out_odd  = K-1*x_even + K0*x_odd + K+1*(right pair's even)
    """
    kh, kw, c, o = k.shape
    z = jnp.zeros((kh, c, o), k.dtype)
    km1, k0, kp1 = k[:, 0], k[:, 1], k[:, 2]

    def blk(a, b, cc, d):  # [[a, b], [cc, d]] over (in-slot, out-slot)
        return jnp.concatenate(
            [
                jnp.concatenate([a, b], axis=-1),
                jnp.concatenate([cc, d], axis=-1),
            ],
            axis=-2,
        )

    kp_m1 = blk(z, z, km1, z)
    kp_0 = blk(k0, km1, kp1, k0)
    kp_p1 = blk(z, kp1, z, z)
    return jnp.stack([kp_m1, kp_0, kp_p1], axis=1)  # [3, 3, 2C, 2O]


def pack_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W/2, 2C] (pure reshape in NHWC linear mem)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, wp * 2, c2 // 2)


def _kernel(
    x_ref,  # [1, H, Wp, 128] packed input (raw conv output of prev node)
    kp_ref,  # [3, 3, 128, 128] block-packed weights
    scale_ref,  # [8, 128] row 0: fused BN scale  (gamma * rsqrt(var+eps))
    shift_ref,  # [8, 128] row 0: fused BN shift  (beta - mean * scale)
    y_ref,  # [1, H, Wp, 128] raw conv output
    stats_ref,  # [8, 128] rows 0/1: running sum / sumsq of y over (B,H,W)
    xpad_ref,  # scratch [H+2, Wp+2, 128]
    *,
    apply_bn_relu: bool,
    accumulate_stats: bool,
):
    h, wp = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    if apply_bn_relu:
        scale = scale_ref[0][None, None, :]
        shift = shift_ref[0][None, None, :]
        x = jnp.maximum(
            x.astype(jnp.float32) * scale + shift, 0.0
        ).astype(x_ref.dtype)
    # zero-padded halo buffer: one packed position (= 2 pixels) in W —
    # exact SAME-conv semantics through the block kernel's zero taps
    xpad_ref[...] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, 1 : wp + 1, :] = x

    # strip-wise accumulation keeps the f32 accumulator small (VMEM
    # scoped-stack budget): STRIP rows x Wp positions per pass. The
    # wrapper guarantees divisibility; a truncating loop here would
    # silently leave output rows unwritten.
    strip = _STRIP if h % _STRIP == 0 else h
    n_strips = h // strip
    m = strip * wp
    partial = jnp.zeros((8, 128), jnp.float32)
    for s in range(n_strips):
        r0 = s * strip
        acc = jnp.zeros((m, 128), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                tap = xpad_ref[
                    r0 + dh : r0 + dh + strip, dw : dw + wp, :
                ].reshape(m, 128)
                acc += jax.lax.dot_general(
                    tap,
                    kp_ref[dh, dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y_ref[0, r0 : r0 + strip] = acc.reshape(strip, wp, 128).astype(
            y_ref.dtype
        )
        if accumulate_stats:
            ones = jnp.ones((8, m), jnp.float32)
            ssum = jax.lax.dot_general(
                ones, acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ssq = jax.lax.dot_general(
                ones, acc * acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            partial = partial + jnp.concatenate([ssum[:4], ssq[:4]], axis=0)

    if accumulate_stats:

        @pl.when(pl.program_id(0) == 0)
        def _init():
            stats_ref[...] = partial

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            stats_ref[...] += partial
    else:
        # never leave the output buffer as uninitialized VMEM garbage
        @pl.when(pl.program_id(0) == 0)
        def _zero():
            stats_ref[...] = jnp.zeros_like(stats_ref)


@functools.partial(
    jax.jit, static_argnames=("apply_bn_relu", "accumulate_stats")
)
def packed_conv_bn_stats(
    x: jnp.ndarray,  # [B, H, Wp, 128] packed
    kp: jnp.ndarray,  # [3, 3, 128, 128] block-packed
    scale: jnp.ndarray,  # [128] fused BN scale for the INPUT (prologue)
    shift: jnp.ndarray,  # [128]
    apply_bn_relu: bool = True,
    accumulate_stats: bool = True,
):
    """One column node leg: (BN+ReLU prologue) -> packed 3x3 conv -> stats.

    Returns (y_packed [B,H,Wp,128] raw conv output, stats) where
    stats[0] = sum(y), stats[1] = sum(y^2) over (B, H, W) — the caller
    finalizes mean/var on [128] scalars and feeds the next node's
    prologue — or ``stats=None`` when ``accumulate_stats=False``.
    All shapes static; B is the sequential grid.
    """
    b, h, wp, c2 = x.shape
    assert c2 == 128, "packed channel dim must be 128"
    if h % _STRIP != 0 and h > _STRIP:
        msg = f"H={h} must divide the accumulation strip {_STRIP} (or be <= it)"
        raise ValueError(msg)
    scale8 = jnp.broadcast_to(scale[None, :], (8, 128)).astype(jnp.float32)
    shift8 = jnp.broadcast_to(shift[None, :], (8, 128)).astype(jnp.float32)
    y, stats8 = pl.pallas_call(
        functools.partial(
            _kernel,
            apply_bn_relu=apply_bn_relu,
            accumulate_stats=accumulate_stats,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wp, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, 128, 128), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wp, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, 128), x.dtype),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h + 2, wp + 2, 128), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # stats accumulate in order
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(x, kp, scale8, shift8)
    if not accumulate_stats:
        return y, None
    stats = jnp.stack([stats8[0], stats8[4]], axis=0)  # [2, 128]
    return y, stats


def reference_packed_conv_bn_stats(x, kp, scale, shift, apply_bn_relu=True):
    """Plain-XLA identical math for correctness tests."""
    xin = x.astype(jnp.float32)
    if apply_bn_relu:
        xin = jnp.maximum(xin * scale[None, None, None, :] + shift, 0.0)
    y = jax.lax.conv_general_dilated(
        xin,
        kp.astype(jnp.float32),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    stats = jnp.stack(
        [y.sum(axis=(0, 1, 2)), (y * y).sum(axis=(0, 1, 2))], axis=0
    )
    return y.astype(x.dtype), stats
