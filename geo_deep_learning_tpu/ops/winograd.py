"""Winograd F(2x2, 3x3) transforms for stride-1 3x3 convolutions.

Why this exists (TPU-specific): the UNet++ decoder's stride-1 3x3 convs
have 16-64 output channels, which fill at most half of the MXU's 128
lanes — a hard ~25-50% utilization ceiling for direct convolution
(BASELINE.md speed-of-light analysis; the reference outsources UNet++ to
smp + cuDNN, reference tasks_with_models/segmentation_unetplus.py:126).
Winograd F(2x2,3x3) computes the same conv with 16/36 = 0.44x the MXU
FLOPs at unchanged lane occupancy, which is the only remaining lever
once the lane ceiling is reached.

Numerics: the input (B) and output (A) transform matrices for F(2,3)
contain only 0/±1 — the transforms are plain adds, no precision loss
beyond ordinary summation. Only the weight transform G has halves, and
it is applied in f32 before casting. This keeps bf16 training numerics
equivalent to direct conv (unlike F(4,3), whose larger coefficients
amplify bf16 error).

This module holds the transform constants, a pure-jnp reference
implementation (used by tests and as the non-TPU fallback path), and the
even/odd phase-split helpers shared with the fused Pallas kernel
(ops/pallas/winograd.py). The phase decomposition turns the overlapping
4x4 tile extraction into unit-stride slices:

    tile row k of d = [d0 d1 d2 d3] maps to even/odd row phases E/O as
    d0=E[t], d1=O[t], d2=E[t+1], d3=O[t+1]

so the row transform B^T d becomes differences of ADJACENT rows of the
phase arrays — no stride-2 gathers on the lane/sublane dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transform matrices (Lavin & Gray, "Fast Algorithms for
# Convolutional Neural Networks" — PAPERS.md). Computes correlation,
# matching lax.conv_general_dilated's HWIO semantics.
G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]]
)
BT = np.array(
    [
        [1.0, 0.0, -1.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, -1.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, -1.0],
    ]
)
AT = np.array([[1.0, 1.0, 1.0, 0.0], [0.0, 1.0, -1.0, -1.0]])


def transform_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> U [4,4,Cin,Cout]: U = G @ w @ G^T (f32)."""
    g = jnp.asarray(G, jnp.float32)
    w32 = w.astype(jnp.float32)
    u = jnp.einsum("ui,ijcn->ujcn", g, w32)
    return jnp.einsum("vj,ujcn->uvcn", g, u)


def transform_kernel_grad(du: jnp.ndarray) -> jnp.ndarray:
    """VJP of :func:`transform_kernel`: dU [4,4,Cin,Cout] -> dw [3,3,Cin,Cout]."""
    g = jnp.asarray(G, jnp.float32)
    t = jnp.einsum("ui,uvcn->ivcn", g, du.astype(jnp.float32))
    return jnp.einsum("vj,ivcn->ijcn", g, t)


def rotate_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel for the input-gradient conv: rotate 180°, swap in/out.

    d/dx of ``y = corr(x, w)`` is ``corr(dy, rot180(w)^T)`` with SAME
    padding (stride 1).
    """
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def pad_and_phase_split(x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """[B,H,W,C] -> 4 phase arrays [B,H/2+1,W/2+1,C] of the SAME-padded
    input (pad 1 on every side; H, W must be even).

    Phases: (row parity, col parity) of the padded array —
    ee = xp[:,0::2,0::2], eo = xp[:,0::2,1::2], oe, oo.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        msg = f"H, W must be even, got {h}x{w}"
        raise ValueError(msg)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return (
        xp[:, 0::2, 0::2],
        xp[:, 0::2, 1::2],
        xp[:, 1::2, 0::2],
        xp[:, 1::2, 1::2],
    )


def merge_output_phases(
    yee: jnp.ndarray, yeo: jnp.ndarray, yoe: jnp.ndarray, yoo: jnp.ndarray
) -> jnp.ndarray:
    """4x [B,H/2,W/2,C] output phases -> [B,H,W,C] (inverse 2x2 split)."""
    b, h2, w2, c = yee.shape
    top = jnp.stack([yee, yeo], axis=3)  # [B,H/2,W/2,2,C]
    bot = jnp.stack([yoe, yoo], axis=3)
    y = jnp.stack([top, bot], axis=2)  # [B,H/2,2,W/2,2,C]
    return y.reshape(b, 2 * h2, 2 * w2, c)


def input_transform_phases(
    ee: jnp.ndarray, eo: jnp.ndarray, oe: jnp.ndarray, oo: jnp.ndarray
) -> jnp.ndarray:
    """Phase arrays [..., T+1, T'+1, C] -> V [4, 4, ..., T, T', C].

    Row transform (indices into BT):
        r0 = E[t]   - E[t+1]
        r1 = O[t]   + E[t+1]
        r2 = E[t+1] - O[t]
        r3 = O[t]   - O[t+1]
    applied first along H (phases e/o = E/O), then along W.
    """

    def row_tf(e, o, axis):
        n = e.shape[axis]
        lo = [slice(None)] * e.ndim
        hi = [slice(None)] * e.ndim
        lo[axis] = slice(0, n - 1)
        hi[axis] = slice(1, n)
        e0, e1 = e[tuple(lo)], e[tuple(hi)]
        o0, o1 = o[tuple(lo)], o[tuple(hi)]
        return e0 - e1, o0 + e1, e1 - o0, o0 - o1

    h_axis, w_axis = ee.ndim - 3, ee.ndim - 2
    re = row_tf(ee, oe, h_axis)  # 4 arrays, even col phase
    ro = row_tf(eo, oo, h_axis)  # 4 arrays, odd col phase
    rows = []
    for u in range(4):
        rows.append(jnp.stack(row_tf(re[u], ro[u], w_axis)))
    return jnp.stack(rows)  # [4(u), 4(v), ..., T, T', C]


def output_inverse_transform(m: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """M [4,4,...,N] -> output phases (yee, yeo, yoe, yoo), each [...,N].

    Y = A^T M A with A^T = [[1,1,1,0],[0,1,-1,-1]].
    """
    s0 = m[0] + m[1] + m[2]
    s1 = m[1] - m[2] - m[3]
    return (
        s0[0] + s0[1] + s0[2],
        s0[1] - s0[2] - s0[3],
        s1[0] + s1[1] + s1[2],
        s1[1] - s1[2] - s1[3],
    )


def quad_split(x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """[B,H,W,C] -> UNPADDED 2x2 phase quads (ee, eo, oe, oo), each
    [B,H/2,W/2,C]. This is the resident representation of the Winograd
    decoder column: elementwise ops (BN, ReLU) apply per quad, channel
    concats apply per quad, and the conv kernel consumes/produces quads —
    so the split/merge passes happen once per column, not once per conv.
    """
    return (
        x[:, 0::2, 0::2],
        x[:, 0::2, 1::2],
        x[:, 1::2, 0::2],
        x[:, 1::2, 1::2],
    )


def quad_merge(quads) -> jnp.ndarray:
    """Inverse of :func:`quad_split`."""
    return merge_output_phases(*quads)


def quad_in_phases(quads) -> tuple[jnp.ndarray, ...]:
    """Quads of x -> the PADDED phase arrays of pad(x, 1) that the fused
    kernel consumes, via four cheap jnp.pad ops (XLA fuses them into the
    producing elementwise chain):

        Ee[t,s] = x[2t-1, 2s-1] = Xoo[t-1, s-1]   (pad top+left)
        Eo[t,s] = x[2t-1, 2s  ] = Xoe[t-1, s]     (pad top+right)
        Oe[t,s] = x[2t,   2s-1] = Xeo[t,   s-1]   (pad left+bottom)
        Oo[t,s] = x[2t,   2s  ] = Xee[t,   s]     (pad bottom+right)
    """
    xee, xeo, xoe, xoo = quads
    pad = lambda a, top, left: jnp.pad(
        a, ((0, 0), (top, 1 - top), (left, 1 - left), (0, 0))
    )
    return (
        pad(xoo, 1, 1),
        pad(xoe, 1, 0),
        pad(xeo, 0, 1),
        pad(xee, 0, 0),
    )


def winograd_conv3x3_ref(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reference F(2x2,3x3) SAME conv via jnp ops (any backend).

    Args:
        x: [B, H, W, Cin] (H, W even).
        w: [3, 3, Cin, Cout].
    Returns:
        [B, H, W, Cout] in x.dtype's accumulation type (f32 for bf16 in).
    """
    u = transform_kernel(w).astype(x.dtype)  # [4,4,Cin,Cout]
    phases = pad_and_phase_split(x)
    v = input_transform_phases(*phases)  # [4,4,B,T,T',Cin]
    m = jnp.einsum(
        "uvbijc,uvcn->uvbijn", v, u, preferred_element_type=jnp.float32
    )
    return merge_output_phases(*output_inverse_transform(m))
