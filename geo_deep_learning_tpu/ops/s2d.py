"""Space-to-depth execution of full-resolution convolutions.

The UNet++ tail runs 3x3 stride-1 convs with 16-32 channels at the full
512x512 patch resolution. On the MXU those GEMMs have K=9*C<=288 and
N=Cout<=32 against 128-lane tiles — >75% of the systolic array idles
while HBM streams a 512^2 activation (measured in BASELINE.md: widening
those stages 10x in FLOPs cost only +22% wall time).

The transform here reshapes the SAME math into MXU-friendly shapes: for
a 2x2 space-to-depth packing (packed channel = slot*C + c, slot-major)

    conv3x3(x) == depth_to_space(conv3x3_packed(space_to_depth(x)))

where ``conv3x3_packed`` uses a block-structured [3,3,4C,4O] kernel built
from the original [3,3,C,O] parameters by :func:`pack_conv3x3_kernel` —
an original output pixel at sub-position (di,dj) reads input rows
2i+di-1..2i+di+1, which land in packed rows i-1..i+1 at fixed (slot, tap)
pairs, so every original tap maps to exactly one packed tap and the rest
of the packed kernel is zero. Math is EXACT (same multiplies, same adds
up to float reassociation), so torch-checkpoint golden parity is
unaffected; only the layout the MXU sees changes: K 144->576, N 16->64,
spatial 512^2 -> 256^2.

Used by the packed UNet++ decoder tail (models/decoders/unetpp.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """NHWC -> [B, H/b, W/b, b*b*C]; packed channel = (si*b+sj)*C + c."""
    b, h, w, c = x.shape
    n = block
    x = x.reshape(b, h // n, n, w // n, n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/n, W/n, si, sj, C
    return x.reshape(b, h // n, w // n, n * n * c)


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (slot-major channel layout)."""
    b, h, w, cc = x.shape
    n = block
    c = cc // (n * n)
    x = x.reshape(b, h, w, n, n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/n, si, W/n, sj, C
    return x.reshape(b, h * n, w * n, c)


def _tap_map() -> list[tuple[int, int, int, int]]:
    """(d, u) -> (packed tap pu, source slot s) for the 2x2 packing.

    Original output sub-position d in {0,1}, original tap u in {-1,0,1}:
    original input row 2i+d+u sits at packed row i+pu, slot s.
    """
    out = []
    for d in (0, 1):
        for u in (-1, 0, 1):
            r = d + u  # relative to 2i
            pu = r // 2 if r >= 0 else -1
            s = r % 2
            out.append((d, u, pu, s))
    return out


def pack_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] conv kernel -> block-structured [3,3,4C,4O] packed kernel.

    Packed input channel (si*2+sj)*C + c feeds packed output channel
    (di*2+dj)*O + o with the original tap weight K[u+1, v+1, c, o] at
    packed tap (pu+1, pv+1); all other entries are zero.
    """
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (3, 3), "pack_conv3x3_kernel is specific to 3x3"
    taps = _tap_map()
    # scatter via one-hot matmul-free indexing: build with a python loop
    # over the 36 (d,u)x(dj,v) combos at trace time (constants; XLA folds)
    packed = jnp.zeros((3, 3, 4 * c, 4 * o), dtype=kernel.dtype)
    for di, u, pu, si in taps:
        for dj, v, pv, sj in taps:
            src = kernel[u + 1, v + 1]  # [C, O]
            in_slot = si * 2 + sj
            out_slot = di * 2 + dj
            packed = packed.at[
                pu + 1,
                pv + 1,
                in_slot * c : (in_slot + 1) * c,
                out_slot * o : (out_slot + 1) * o,
            ].set(src)
    return packed


def pack_up2_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] conv kernel -> [3,3,C,4O] fused up2+conv packed kernel.

    ``conv3x3(nearest_up2(x)) == depth_to_space(conv(x, this))``: output
    sub-position d's tap u reads upsampled row 2i+d+u = source row
    floor((2i+d+u)/2) = i + floor((d+u)/2), so original taps that hit the
    same source pixel MERGE (K[1]+K[2] for d=0, K[0]+K[1] for d=1 per
    axis). Versus tiling the input x4 and convolving with the 75%-zero
    :func:`pack_conv3x3_kernel` (how the packed decoder previously ran its
    up2 blocks), this is 4x fewer FLOPs and reads C instead of 4C input
    channels — and the upsampled intermediate never exists in any layout.
    Exact same math up to float reassociation.
    """
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (3, 3), "pack_up2_conv3x3_kernel is specific to 3x3"
    eff = jnp.zeros((3, 3, c, 4 * o), dtype=kernel.dtype)
    for di in (0, 1):
        for u in (-1, 0, 1):
            pu = (di + u) // 2
            for dj in (0, 1):
                for v in (-1, 0, 1):
                    pv = (dj + v) // 2
                    slot = di * 2 + dj
                    eff = eff.at[
                        pu + 1, pv + 1, :, slot * o : (slot + 1) * o
                    ].add(kernel[u + 1, v + 1])
    return eff


def pack_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """[O] bias -> [4O] (each output slot gets the same per-channel bias)."""
    return jnp.tile(bias, 4)


def nearest_up2_packed(x: jnp.ndarray) -> jnp.ndarray:
    """space_to_depth(nearest_upsample_2x(x)) without materializing the
    upsample: every slot equals the source pixel -> channel tile x4."""
    return jnp.tile(x, (1, 1, 1, 4))


def packed_concat(parts: list[jnp.ndarray], channels: list[int]) -> jnp.ndarray:
    """Concatenate packed tensors along LOGICAL channels.

    ``concat([a, b])`` in original layout corresponds to interleaving the
    slot groups: reshape each packed operand to [..., 4, C], concat on the
    channel axis, flatten back to slot-major.
    """
    rs = [
        p.reshape(*p.shape[:-1], 4, c) for p, c in zip(parts, channels)
    ]
    out = jnp.concatenate(rs, axis=-1)
    return out.reshape(*parts[0].shape[:-1], 4 * sum(channels))


def repack_up2(xp: jnp.ndarray) -> jnp.ndarray:
    """Packed tensor at grid g (res 2g) -> packed nearest-up2 at grid 2g.

    ``space_to_depth(nearest_up2(depth_to_space(xp)))``: moves one packing
    level down the pyramid (the packed final block consumes the packed
    finest-column output through this).
    """
    return nearest_up2_packed(depth_to_space(xp))


def slot_mean_var(
    x_packed: jnp.ndarray, channels: int, slots: int = 4
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch mean/variance per ORIGINAL channel from a packed tensor.

    Equivalent to BatchNorm statistics over the full-resolution tensor:
    the ``slots`` slots partition the original spatial positions.
    """
    b, h, w, _ = x_packed.shape
    v = x_packed.reshape(b, h, w, slots, channels).astype(jnp.float32)
    mean = jnp.mean(v, axis=(0, 1, 2, 3))
    var = jnp.var(v, axis=(0, 1, 2, 3))
    return mean, var


def tile_stats(stat: jnp.ndarray, slots: int = 4) -> jnp.ndarray:
    """Per-channel statistic [C] -> packed layout [slots*C]."""
    return jnp.tile(stat, slots)


# ---------------------------------------------------------------------------
# W-only (1x2) packing — the UNet++ finest dense column runs at C=64,
# whose minormost dim 2x tile-pads the T(8,128) layout. Folding adjacent
# W positions into channels ([B,H,W,C] -> [B,H,W/2,2C], a pure reshape in
# NHWC linear memory) fills all 128 lanes; the packed 3x3 conv pays 2x
# structural-zero FLOPs and still measures 1.33x faster end-to-end at the
# live bs32 shapes (scripts/bench_wpack_column.py; scripts/
# bench_bn_shapes.py for the kernel-level ratio). Exact math.
# ---------------------------------------------------------------------------


def wspace_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> [B, H, W/2, 2C]; packed channel = s*C + c, s = w % 2.

    A pure reshape (row-major (W, C) flatten already orders w-pairs
    contiguously) — no transpose, unlike the 2x2 packing.
    """
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def wdepth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`wspace_to_depth`."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def pack_w_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] conv kernel -> [3,3,2C,2O] W-packed block kernel.

    Original output sub-position d in {0,1} at tap v reads original
    column 2j+d+v = packed column j + (d+v)//2, slot (d+v) % 2 — same
    tap algebra as :func:`pack_conv3x3_kernel` restricted to one axis.
    H taps pass through unchanged.
    """
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (3, 3), "pack_w_conv3x3_kernel is specific to 3x3"
    packed = jnp.zeros((3, 3, 2 * c, 2 * o), dtype=kernel.dtype)
    for d in (0, 1):
        for v in (-1, 0, 1):
            r = d + v
            pv, s = r // 2, r % 2
            packed = packed.at[
                :, pv + 1, s * c : (s + 1) * c, d * o : (d + 1) * o
            ].set(kernel[:, v + 1])
    return packed


def pack_w_up2_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [4,3,C,2O]: fused (nearest-up2 in H and W) + 3x3 conv
    emitting W-PACKED output directly from the source-resolution input.

    W axis: output slot d's tap v reads upsampled column 2j+d+v = source
    column j + floor((d+v)/2); taps hitting the same source column MERGE
    (as in :func:`pack_up2_conv3x3_kernel`), giving a width-3 kernel over
    source columns. H axis: composed for lhs_dilation=2 execution — the
    caller convolves with ``lhs_dilation=(2,1)``, padding ((2,2),(1,1)),
    exactly like models/decoders/unetpp.py::_up2_conv does for both axes.
    """
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (3, 3), "pack_w_up2_conv3x3_kernel is specific to 3x3"
    # W: merge taps into [3, C, 2O] at source columns
    kw_packed = jnp.zeros((3, 3, c, 2 * o), dtype=kernel.dtype)
    for d in (0, 1):
        for v in (-1, 0, 1):
            pv = (d + v) // 2  # d+v in {-1..2} -> source tap pv in {-1,0,1}
            kw_packed = kw_packed.at[
                :, pv + 1, :, d * o : (d + 1) * o
            ].add(kernel[:, v + 1])
    # H: nearest-up2 = zero-dilation ∘ ones(2) box filter; convolution
    # composes, so the effective H kernel is K (.) ones(2) — width 4
    pad = jnp.pad
    k_eff = (
        pad(kw_packed, ((0, 1), (0, 0), (0, 0), (0, 0)))
        + pad(kw_packed, ((1, 0), (0, 0), (0, 0), (0, 0)))
    )
    return k_eff  # [4, 3, C, 2O]


def _self_test() -> None:  # pragma: no cover - developer check
    import jax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = depth_to_space(
        jax.lax.conv_general_dilated(
            space_to_depth(x),
            pack_conv3x3_kernel(k),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    print("s2d conv equivalence OK")


if __name__ == "__main__":  # pragma: no cover
    _self_test()
