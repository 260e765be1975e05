"""End-to-end sizing of the W-packed finest-column idea (ROADMAP/VERDICT
r3 task 3), the step after scripts/bench_bn_shapes.py confirmed the
conv-level win (dense [3,3,128,128] at 2x FLOPs runs 1.35x faster than
the lane-limited [3,3,64,64]).

W-packing folds adjacent W positions into channels: [B,H,W,C] →
[B,H,W/2,2C] — in NHWC linear memory this is a pure reshape, and on TPU
it swaps a 2x tile-padded C=64 minormost dim for exact 128-lane tiles.
A 3x3 conv becomes a 3x3 conv with the block kernel

    KP[dh][-1] = [[0,      0], [K[dh][-1], 0        ]]
    KP[dh][ 0] = [[K[dh][0],  K[dh][-1]], [K[dh][1], K[dh][0]]]
    KP[dh][+1] = [[0, K[dh][1]], [0,      0         ]]

(rows: input slot blocks, cols: output slot blocks) — 8 live blocks per
3 taps vs 6 for the unpacked conv = 2x FLOPs with half the kernel
structural zeros, exact math.

This script times a REALISTIC 4-node column (2x (3x3 conv + BN-train
stats + ReLU) per node) fwd+bwd via value_and_grad, including the
pack/unpack reshapes and the slot-summed weight gradients, at the live
UNet++ bs32 finest-column shape. If the packed column does not beat the
plain one end-to-end here, the production implementation cannot win.

Usage: python scripts/bench_wpack_column.py [--iters 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def pack_w_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] → [3, 3, 2C, 2O] W-packed block kernel (see module
    docstring for the block layout)."""
    kh, kw, c, o = k.shape
    z = jnp.zeros((kh, c, o), k.dtype)
    # tap index t ∈ {0,1,2} ↔ dw ∈ {-1,0,+1}
    km1, k0, kp1 = k[:, 0], k[:, 1], k[:, 2]
    blk = lambda a, b, cc, d: jnp.concatenate(
        [
            jnp.concatenate([a, b], axis=-1),
            jnp.concatenate([cc, d], axis=-1),
        ],
        axis=-2,
    )  # [[a, b], [cc, d]] over (in-slot, out-slot) blocks
    kp_m1 = blk(z, z, km1, z)
    kp_0 = blk(k0, km1, kp1, k0)
    kp_p1 = blk(z, kp1, z, z)
    return jnp.stack([kp_m1, kp_0, kp_p1], axis=1)  # [3, 3, 2C, 2O]


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def bn_relu(y, c_logical, packed):
    """train-mode BN statistics + normalize + relu (per LOGICAL channel)."""
    yf = y.astype(jnp.float32)
    if packed:
        m = yf.mean(axis=(0, 1, 2))
        v = (yf * yf).mean(axis=(0, 1, 2))
        m = 0.5 * (m[:c_logical] + m[c_logical:])
        v = 0.5 * (v[:c_logical] + v[c_logical:]) - m * m
        m2, inv2 = (
            jnp.concatenate([m, m]),
            jnp.concatenate([jax.lax.rsqrt(v + 1e-5)] * 2),
        )
        out = (yf - m2) * inv2
    else:
        m = yf.mean(axis=(0, 1, 2))
        v = (yf * yf).mean(axis=(0, 1, 2)) - m * m
        out = (yf - m) * jax.lax.rsqrt(v + 1e-5)
    return jax.nn.relu(out).astype(y.dtype)


def make_column(n_nodes, packed):
    def fwd(params, x):
        c = x.shape[-1]
        if packed:
            b, h, w, _ = x.shape
            x = x.reshape(b, h, w // 2, 2 * c)
        for k1, k2 in params:
            if packed:
                x = bn_relu(conv(x, pack_w_kernel(k1)), c, True)
                x = bn_relu(conv(x, pack_w_kernel(k2)), c, True)
            else:
                x = bn_relu(conv(x, k1), c, False)
                x = bn_relu(conv(x, k2), c, False)
        if packed:
            b, h, w2, c2 = x.shape
            x = x.reshape(b, h, w2 * 2, c)
        return x

    def loss(params, x):
        return jnp.sum(fwd(params, x).astype(jnp.float32) ** 2) * 1e-6

    return jax.jit(jax.value_and_grad(loss))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=4)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(32, 256, 256, 64)) * 0.1).astype(jnp.bfloat16)
    params = [
        (
            jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16),
        )
        for _ in range(args.nodes)
    ]

    for name, packed in [("plain C64", False), ("W-packed 2C=128", True)]:
        step = make_column(args.nodes, packed)
        xs = [
            jax.device_put((x0 * (1.0 + 0.01 * k)).astype(jnp.bfloat16))
            for k in range(4)
        ]
        # the axon relay requires a VALUE FETCH per rep — block_until_ready
        # alone reads ~0 ms (BASELINE.md measurement caveat)
        float(step(params, xs[-1])[0])  # compile + warm
        best = float("inf")
        for k in range(3):
            t0 = time.perf_counter()
            val, grads = step(params, xs[k])
            _ = float(val) + float(np.asarray(grads[0][0][0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} fwd+bwd {args.nodes}-node column: {best * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
