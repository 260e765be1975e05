"""Exact fusion of ``conv3x3(bilinear_up4(x))`` into one lhs-dilated conv.

The MultiLevelNeck's scale-4 branch (reference
``models/necks/multilevel_neck.py:158``: ``resize(scale_factor=4,
mode="bilinear")`` then a 3x3 conv) is DOFA's single most expensive op
chain: at 512^2 / bs8 the 3x3 768->768 conv over the upsampled 144^2 map
costs 1.74 TF per pass and runs at near-peak MXU rate, so the only win
left is algebraic. Because 4x half-pixel bilinear upsampling is itself a
(transposed) convolution, the composition is EXACTLY a stride-1/4
fractionally-strided conv of the *source-resolution* input with a 10x10
kernel derived linearly from the 3x3 weights:

    conv3(up4(x))[p] = sum_m x[m] * W[p - 4m],
    W[u] = sum_k K[k] * phi(u + k - 1),   u in [-3, 6]
    phi(v) = max(0, 1 - |(v + 0.5)/4 - 0.5|)   (the 4x tent)

Per output pixel the 10-tap kernel touches only 2-3 source pixels per
axis (tent support), so the executed FLOPs drop from 9 taps at 144^2 to
an average 100/16 taps at 144^2 — a 1.44x compute cut — and the 255 MB
(bs8 bf16) intermediate 144^2 tensor between resize and conv is never
materialized. XLA lowers lhs-dilated convs with the same phase-split
machinery it uses for conv backward passes, which the profile shows
running at peak.

Two border subtleties make the fusion exact rather than approximate:

- torch's ``align_corners=False`` resize CLAMPS source coordinates at
  the edges; replicate-padding the source by 1 pixel reproduces the
  clamp exactly (the two tent taps collapse onto the same pixel).
- the subsequent 3x3 conv ZERO-pads the upsampled map, while the fused
  form would extend it by one more tent step; the difference lives only
  in the outermost output ring and is removed by four cheap 1-D
  corrections (rows own the corner terms; columns subtract only
  in-range row taps, so nothing double-counts).

Verified to 1e-15 (f64 numpy) and 1e-5 (f32 XLA) against
``resize(scale=4, bilinear)`` + ``lax.conv`` in tests/test_ops_fused_upconv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_R = 4  # upsample factor; the derivation holds for any integer factor,
# but only 4x has a favorable tap count (4x: 100/144 taps; 2x: 36/36)


@functools.lru_cache(maxsize=1)
def _tap_matrix() -> np.ndarray:
    """[10, 3] matrix M with M[j, k] = phi((6 - j) + k - 1).

    Maps the 3-tap conv kernel to the 10-tap composite kernel, already
    index-reversed for XLA's correlation convention.
    """

    def phi(v: float) -> float:
        return max(0.0, 1.0 - abs((v + 0.5) / _R - 0.5))

    m = np.zeros((10, 3), np.float32)
    for j in range(10):
        u = 6 - j
        for k in range(3):
            m[j, k] = phi(u + k - 1)
    return m


def _up1d(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """4x half-pixel linear upsample along ``axis`` (edge-clamped)."""
    shape = list(x.shape)
    shape[axis] = shape[axis] * _R
    return jax.image.resize(x, tuple(shape), method="bilinear", antialias=False)


def _conv1d(x: jnp.ndarray, k: jnp.ndarray, padding) -> jnp.ndarray:
    """1-D NLC conv via a height-1 NHWC conv. k: [taps, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x[:, None],
        k[None],
        (1, 1),
        ((0, 0), padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[:, 0]


# Per-output-phase tap structure of the 10-tap composite kernel: phase
# rho (output index mod 4) reads source offsets a with weight
# W[rho - 4a]; support per phase: rho=0 -> a in {-1,0}, rho=1,2 ->
# {-1,0,1}, rho=3 -> {0,1}. Grouping phases by support gives 3 per-axis
# groups -> 9 full-lane convs at SOURCE resolution executing exactly the
# 100-tap math (vs XLA's own phase split of the dilated form, measured
# at only 61% MXU on v5e).
_PHASE_GROUPS = (  # (phases, source-offset window lo..hi)
    ((0,), (-1, 0)),
    ((1, 2), (-1, 1)),
    ((3,), (0, 1)),
)


def _grouped_up4_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Interior of the composite as 9 phase-grouped convs + interleave."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]

    def phi(v: float) -> float:
        return max(0.0, 1.0 - abs((v + 0.5) / _R - 0.5))

    # W1[rho, a_idx, k] per-axis composite weights for offset a = a_idx + lo
    def axis_weights(phases, lo, hi):
        n_a = hi - lo + 1
        m = np.zeros((len(phases), n_a, 3), np.float32)
        for pi, rho in enumerate(phases):
            for ai in range(n_a):
                a = lo + ai
                u = rho - _R * a
                for k in range(3):
                    m[pi, ai, k] = phi(u + k - 1)
        return jnp.asarray(m)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # rows[rho_h][rho_w] = [B, H, W, Cout] phase map
    phase_maps: dict[tuple[int, int], jnp.ndarray] = {}
    for ph_h, (lo_h, hi_h) in _PHASE_GROUPS:
        mh = axis_weights(ph_h, lo_h, hi_h)  # [Ph, Ah, 3]
        for ph_w, (lo_w, hi_w) in _PHASE_GROUPS:
            mw = axis_weights(ph_w, lo_w, hi_w)  # [Pw, Aw, 3]
            # grouped kernel [Ah, Aw, Cin, Ph*Pw*Cout]
            kg = jnp.einsum("pak,qbl,klio->abipqo", mh, mw, kernel)
            kg = kg.reshape(
                mh.shape[1], mw.shape[1], cin, len(ph_h) * len(ph_w) * cout
            )
            # window [lo..hi] anchored at source pixel: slice the padded
            # input so offset lo maps to kernel tap 0 with VALID padding
            ys = jax.lax.conv_general_dilated(
                xp[:, 1 + lo_h : 1 + lo_h + h + mh.shape[1] - 1,
                   1 + lo_w : 1 + lo_w + w + mw.shape[1] - 1],
                kg.astype(x.dtype),
                (1, 1),
                ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # [B, H, W, Ph*Pw*Cout]
            ys = ys.reshape(b, h, w, len(ph_h), len(ph_w), cout)
            for i, rh in enumerate(ph_h):
                for j, rw in enumerate(ph_w):
                    phase_maps[(rh, rw)] = ys[:, :, :, i, j]
    stacked = jnp.stack(
        [phase_maps[(rh, rw)] for rh in range(_R) for rw in range(_R)], axis=3
    )  # [B, H, W, 16, Cout]
    stacked = stacked.reshape(b, h, w, _R, _R, cout)
    return stacked.transpose(0, 1, 3, 2, 4, 5).reshape(b, _R * h, _R * w, cout)


def _interp_rows(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] torch-bilinear row-interpolation matrix (f64).

    Half-pixel (align_corners=False) or corner-aligned coordinates, with
    torch's index clamping at the borders. Each row sums to 1.
    """
    m = np.zeros((out_size, in_size), np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for f in range(out_size):
        if align_corners:
            src = f * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (f + 0.5) * in_size / out_size - 0.5
        i = int(np.floor(src))
        t = src - i
        m[f, min(max(i, 0), in_size - 1)] += 1.0 - t
        m[f, min(max(i + 1, 0), in_size - 1)] += t
    return m


@functools.lru_cache(maxsize=64)
def _shifted_interp(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """[3, out, in] with A[k][p, m] = W[p+k-1, m] (rows with p+k-1 outside
    [0, out) zeroed) — the per-axis operator of "bilinear resize then
    zero-SAME 3x3 conv": tap k of the conv reads resized row p+k-1.
    """
    w = _interp_rows(out_size, in_size, align_corners)
    a = np.zeros((3, out_size, in_size), np.float32)
    for k in range(3):
        lo = max(0, 1 - k)
        hi = min(out_size, out_size + 1 - k)
        a[k, lo:hi] = w[lo + k - 1 : hi + k - 1]
    return a


def resize_conv3x3_factored(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_hw: tuple[int, int] | None = None,
    align_corners: bool = False,
) -> jnp.ndarray:
    """``conv3x3_SAME(bilinear_resize(x, out_hw), kernel) + bias``, exactly,
    as a channel GEMM at SOURCE resolution + shifted-interp matmuls.

    Y[p,q] = sum_{k,l} K[k,l] U[p+k-1, q+l-1]   (U = resize(x), zero pad)
           = sum_{k,l,m,n} A_h[k][p,m] A_w[l][q,n] (x K[k,l])[m,n]

    so the only O(Cin*Cout) work is ``x @ K`` reshaped [Cin, 9*Cout] at
    source resolution — where upsampling by R means R^2x fewer positions
    than convolving the resized map (the composite kernel the direct
    fusion uses cannot exploit the interp's separability; this
    factorization can). The remaining two contractions are thin
    [out, 3*in] interp matmuls. For the DOFA neck's scale-4 branch
    (36->144, 768ch, bs16) this is 0.32 TF fwd vs 2.44 TF for the
    phase-grouped composite and 3.52 TF for resize+conv — and the interp
    weights (odd multiples of 1/(2R)) are exact in bf16.

    Reference equivalent of the composition: resize then ConvModule in
    ``/root/reference/geo_deep_learning/models/necks/multilevel_neck.py:139-160``
    and the fuse conv in ``models/decoders/upernet.py:128-152``.

    Args:
        x: [B, H, W, Cin] source-resolution input.
        kernel: [3, 3, Cin, Cout] HWIO conv weights.
        bias: optional [Cout].
        out_hw: resized spatial size (OH, OW); None means (H, W) (pure
            3x3 conv, still exact — A_k become shifted identities).
        align_corners: coordinate convention of the resize.

    Returns:
        [B, OH, OW, Cout], equal to the unfused composition up to f32/bf16
        reassociation.
    """
    b, h, w, cin = x.shape
    oh, ow = out_hw if out_hw is not None else (h, w)
    ah = jnp.asarray(
        _shifted_interp(oh, h, align_corners).transpose(1, 2, 0), x.dtype
    )  # [p, h, k]
    aw = jnp.asarray(
        _shifted_interp(ow, w, align_corners).transpose(1, 0, 2), x.dtype
    )  # [q, l, w]
    # Every einsum's requested output order equals dot_general's NATURAL
    # order (batch, lhs-free, rhs-free) with the contracting dims adjacent
    # in both operands — so no reshape/transpose of the large intermediates
    # is ever materialized (the first profiled version paid ~1 ms per
    # non-natural order at DOFA shapes); only the final [p,q,b,d] ->
    # [b,p,q,d] transpose of the output remains, fusable into consumers.
    kt = jnp.swapaxes(kernel.astype(x.dtype), 0, 1)  # [l, k, cin, cout]
    u = jnp.einsum("bhwc,lkcd->bhwlkd", x, kt)
    v = jnp.einsum("qlw,bhwlkd->qbhkd", aw, u)  # contract (w, l)
    y = jnp.einsum("phk,qbhkd->pqbd", ah, v)  # contract (h, k)
    y = jnp.transpose(y, (2, 0, 1, 3))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def up4_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    grouped: bool = True,
) -> jnp.ndarray:
    """``conv3x3_SAME(bilinear_up4(x), kernel) + bias``, exactly, fused.

    Args:
        x: [B, H, W, Cin] source-resolution input.
        kernel: [3, 3, Cin, Cout] conv weights (HWIO).
        bias: optional [Cout].
        grouped: emit the interior as 9 phase-grouped full-lane convs
            (exact 100-tap math at source resolution) instead of one
            lhs-dilated conv whose XLA phase split measured at 61% MXU.

    Returns:
        [B, 4H, 4W, Cout], bit-comparable (up to f32 reassociation) with
        the unfused resize-then-conv composition.
    """
    if grouped:
        y = _grouped_up4_conv(x, kernel)
    else:
        taps = jnp.asarray(_tap_matrix(), dtype=kernel.dtype)
        w10 = jnp.einsum("jh,lw,hwio->jlio", taps, taps, kernel)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp,
            w10.astype(x.dtype),
            (1, 1),
            ((2, 2), (2, 2)),
            lhs_dilation=(_R, _R),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # Border corrections (see module docstring). All operands are 1-D
    # strips; cost is negligible next to the main conv.
    kd = kernel.astype(x.dtype)
    top, bot = _up1d(x[:, 0], 1), _up1d(x[:, -1], 1)  # [B, 4W, C]
    left, right = _up1d(x[:, :, 0], 1), _up1d(x[:, :, -1], 1)  # [B, 4H, C]
    corner = lambda r, c: x[:, r, c][:, None]  # [B, 1, C]
    top_ext = jnp.concatenate([corner(0, 0), top, corner(0, -1)], axis=1)
    bot_ext = jnp.concatenate([corner(-1, 0), bot, corner(-1, -1)], axis=1)
    # rows: phantom kh with every kw (VALID over the corner-extended strip)
    row_top = _conv1d(top_ext, kd[0], (0, 0))
    row_bot = _conv1d(bot_ext, kd[2], (0, 0))
    # cols: phantom kw with in-range kh only (SAME/zero over the strip)
    col_l = _conv1d(left, kd[:, 0], (1, 1))
    col_r = _conv1d(right, kd[:, 2], (1, 1))
    y = y.at[:, 0].add(-row_top)
    y = y.at[:, -1].add(-row_bot)
    y = y.at[:, :, 0].add(-col_l)
    y = y.at[:, :, -1].add(-col_r)

    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
