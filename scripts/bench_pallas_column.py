#!/usr/bin/env python
"""Measure the Pallas in-VMEM packed conv+BN-stats column vs XLA.

VERDICT r4 item 1 / ROADMAP item 1: the ONE priced-but-unmeasured lever
for the UNet++ 0.815x gap was a whole-column row-packed conv chain with
BatchNorm statistics fused into the conv kernel (no separate HBM stats
pass, no XLA layout-boundary copies — the pack/unpack happens once per
column). ops/pallas/packed_conv.py implements it; this script times a
REALISTIC finest-column workload at the live bs32 UNet++ shapes:

    4 nodes x 2 legs, each leg: BN-apply+ReLU (prev stats) -> 3x3
    conv(64->64) -> BN-train statistics, at [32, 256, 256, 64].

Variants:
  xla     — lax conv + jnp statistics (what the production model lowers
            to; XLA fuses BN-apply into the conv input and emits the
            separate convert_reduce stats fusions the profile shows)
  pallas  — pack once, chain packed_conv_bn_stats kernels, unpack once

Both run the identical two-pass BN-train math (stats of leg k feed the
prologue of leg k+1) in bf16 with f32 statistics. Forward only: if the
fused kernel cannot beat XLA's forward at these shapes, the backward
(harder to beat — XLA's weight-grad convs run at 69% of their cap)
cannot rescue it, and the lever is measured-dead.

Usage: python scripts/bench_pallas_column.py [--iters 20] [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from geo_deep_learning_tpu.ops.pallas import packed_conv as pc  # noqa: E402

N_NODES = 4
LEGS = 2  # convs per node
C = 64
EPS = 1e-5


def finalize_packed_stats(stats: jnp.ndarray, n: int, gamma, beta):
    """[2,128] packed partial sums -> packed (scale, shift) for the next
    leg's prologue. Packed slots hold disjoint W positions of the same
    channels, so the true per-channel stats are the slot sums."""
    s = stats[0, :C] + stats[0, C:]
    sq = stats[1, :C] + stats[1, C:]
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    scale = gamma * jax.lax.rsqrt(var + EPS)
    shift = beta - mean * scale
    return jnp.tile(scale, 2), jnp.tile(shift, 2)


@functools.partial(jax.jit, static_argnames=())
def column_pallas(x, kps, gammas, betas):
    b, h, w, _ = x.shape
    n = b * h * w
    xp = pc.pack_nhwc(x)
    scale = jnp.tile(gammas[0] * 0 + 1.0, 2)  # identity prologue for leg 0
    shift = jnp.zeros((2 * C,), jnp.float32)
    i = 0
    for _node in range(N_NODES):
        for _leg in range(LEGS):
            apply_bn = i > 0
            xp, stats = pc.packed_conv_bn_stats(
                xp, kps[i], scale, shift, apply_bn_relu=apply_bn
            )
            scale, shift = finalize_packed_stats(
                stats, n, gammas[i], betas[i]
            )
            i += 1
    return pc.unpack_nhwc(xp), scale, shift


@functools.partial(jax.jit, static_argnames=())
def column_xla(x, ks, gammas, betas):
    b, h, w, _ = x.shape
    n = b * h * w
    y = x
    scale = jnp.ones((C,), jnp.float32)
    shift = jnp.zeros((C,), jnp.float32)
    i = 0
    for _node in range(N_NODES):
        for _leg in range(LEGS):
            if i > 0:
                y = jnp.maximum(
                    y.astype(jnp.float32) * scale + shift, 0.0
                ).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                y,
                ks[i].astype(x.dtype),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            yf = y.astype(jnp.float32)
            mean = yf.mean(axis=(0, 1, 2))
            var = jnp.maximum((yf * yf).mean(axis=(0, 1, 2)) - mean * mean, 0.0)
            scale = gammas[i] * jax.lax.rsqrt(var + EPS)
            shift = betas[i] - mean * scale
            i += 1
    return y, scale, shift


@functools.partial(jax.jit, static_argnames=())
def column_xla_hcw(x, ks, gammas, betas):
    """Same column, conv formulated as BATCHED DOTS in a [B, H, C, W]
    layout: im2col over dh only (H-adjacent channel blocks are contiguous
    -> one concatenate), contraction over K = 3C = 192 at full MXU lanes
    (W on lanes, no 64-lane padding), dw handled by shifted adds of the
    three dot outputs. No FLOP redundancy. If XLA schedules these dots
    near peak, this beats the conv lowering without any custom kernel —
    and autodiff gives the backward as dots too."""
    b, h, c, w = x.shape[0], x.shape[1], C, x.shape[2]
    # x arrives NHWC; work in [B, H, C, W]
    y = jnp.transpose(x, (0, 1, 3, 2))
    n = b * h * w
    scale = jnp.ones((C,), jnp.float32)
    shift = jnp.zeros((C,), jnp.float32)
    i = 0
    for _node in range(N_NODES):
        for _leg in range(LEGS):
            if i > 0:
                y = jnp.maximum(
                    y.astype(jnp.float32)
                    * scale[None, None, :, None]
                    + shift[None, None, :, None],
                    0.0,
                ).astype(x.dtype)
            # kernel [3, 3, C, O] -> per-dw [3C, O] with dh-major rows
            k = ks[i].astype(x.dtype)
            kr = jnp.transpose(k, (0, 2, 3, 1))  # [3(dh), C, O, 3(dw)]
            kr = kr.reshape(3 * C, C, 3)  # [(dh,ci), O, dw]
            hp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
            x3 = jnp.concatenate(
                [hp[:, :-2], hp[:, 1:-1], hp[:, 2:]], axis=2
            )  # [B, H, 3C, W]
            dn = (((2,), (0,)), ((), ()))  # contract 3C; batch none
            u = [
                jax.lax.dot_general(
                    x3, kr[:, :, d], dn, preferred_element_type=jnp.float32
                )  # [B, H, W?, O] -> actually [B, H, W, O]? see below
                for d in range(3)
            ]
            # dot_general(x3 [B,H,3C,W], kr [3C,O]) contracts dim 2 ->
            # result [B, H, W, O]; transpose to [B, H, O, W]
            u = [jnp.transpose(t, (0, 1, 3, 2)) for t in u]
            yf = u[1]
            yf = yf.at[:, :, :, 1:].add(u[0][:, :, :, :-1])  # dw=-1
            yf = yf.at[:, :, :, :-1].add(u[2][:, :, :, 1:])  # dw=+1
            mean = yf.mean(axis=(0, 1, 3))
            var = jnp.maximum(
                (yf * yf).mean(axis=(0, 1, 3)) - mean * mean, 0.0
            )
            y = yf.astype(x.dtype)
            scale = gammas[i] * jax.lax.rsqrt(var + EPS)
            shift = betas[i] - mean * scale
            i += 1
    return jnp.transpose(y, (0, 1, 3, 2)), scale, shift


def bench(fn, args, iters):
    """The tunneled-TPU runtime's block_until_ready can return
    optimistically (see bench.py), so every rep ends with a VALUE fetch —
    a real device->host round trip through the last call's data
    dependency; device program order makes it cover all prior calls."""
    out = fn(*args)
    float(jnp.asarray(out[1][0]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(out[1][0]))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1], out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    b, hw = args.batch, args.size
    x = jnp.asarray(
        rng.normal(size=(b, hw, hw, C)), jnp.bfloat16
    )
    n_convs = N_NODES * LEGS
    ks = jnp.asarray(
        rng.normal(size=(n_convs, 3, 3, C, C)) * 0.05, jnp.float32
    )
    kps = jnp.stack([pc.pack_w_kernel(k) for k in ks]).astype(jnp.bfloat16)
    gammas = jnp.asarray(rng.uniform(0.5, 1.5, (n_convs, C)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(n_convs, C)) * 0.1, jnp.float32)

    t_xla, out_x = bench(column_xla, (x, ks, gammas, betas), args.iters)
    t_pal, out_p = bench(column_pallas, (x, kps, gammas, betas), args.iters)
    t_hcw, out_h = bench(column_xla_hcw, (x, ks, gammas, betas), args.iters)

    # correctness cross-check (bf16 tolerance; identical two-pass math)
    yx = np.asarray(out_x[0], np.float32)
    yp = np.asarray(out_p[0], np.float32)
    yh = np.asarray(out_h[0], np.float32)
    err = np.max(np.abs(yx - yp)) / (np.max(np.abs(yx)) + 1e-9)
    err_h = np.max(np.abs(yx - yh)) / (np.max(np.abs(yx)) + 1e-9)

    flops_unpacked = 2 * b * hw * hw * 9 * C * C * n_convs
    cap_lane = flops_unpacked / (0.5 * 197e12)  # 64-lane ceiling
    print(
        f"column fwd ({n_convs} convs @ [{b},{hw},{hw},{C}] bf16, "
        f"BN-train stats each):"
    )
    print(
        f"  xla    : {t_xla * 1e3:8.3f} ms  "
        f"({flops_unpacked / t_xla / 1e12:.1f} TF/s eff)"
    )
    print(
        f"  pallas : {t_pal * 1e3:8.3f} ms  "
        f"({flops_unpacked / t_pal / 1e12:.1f} TF/s eff unpacked-FLOPs; "
        f"kernel does 2x)"
    )
    print(
        f"  xla_hcw: {t_hcw * 1e3:8.3f} ms  "
        f"({flops_unpacked / t_hcw / 1e12:.1f} TF/s eff; batched-dot "
        f"[B,H,C,W] formulation, no redundancy)"
    )
    print(f"  lane-cap floor (conv only, no stats): {cap_lane * 1e3:.3f} ms")
    print(
        f"  speedup xla/pallas: {t_xla / t_pal:.3f}x   rel-err {err:.2e}\n"
        f"  speedup xla/hcw   : {t_xla / t_hcw:.3f}x   rel-err {err_h:.2e}"
    )


if __name__ == "__main__":
    main()
