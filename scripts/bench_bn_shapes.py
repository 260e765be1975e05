"""Microbench: BN-family passes at the UNet++ finest-column shapes.

The round-3 grouped device profile (scripts/profile_step.py --group)
shows ``convert_reduce_fusion`` — the BN statistics / BN-backward reduce
family — at 93.9 ms of the 217 ms bs32 train step (43%), far above the
HBM floor. Hypothesis: C=64 minormost tensors are T(8,128)-tile padded
2x, and the reduce emitter runs well under bandwidth. This script times
the isolated passes at the live shape [32,256,256,64] and at the W-packed
shape [32,256,128,128] (same logical bytes, full 128-lane tiles) to size
the win of running the finest column W-packed.

Measurement note: the axon relay memoizes repeated identical executions,
so naive call-in-a-loop timing reads absurd numbers (BASELINE.md). Every
kernel here is timed as a ``lax.fori_loop`` chain where iteration i+1
consumes iteration i's output — a real data dependency the device must
execute N times — timed around a single jitted call.

Usage: python scripts/bench_bn_shapes.py [--iters 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_chain(body, x0, iters, reps=3):
    """Time ``body`` (x -> x, same shape/dtype) chained ``iters`` times.

    Each repetition runs on a DISTINCT input (the relay memoizes identical
    (computation, args) executions, so same-input repeats read ~0).
    """

    @jax.jit
    def run(x):
        return lax.fori_loop(0, iters, lambda i, x: body(x), x)

    variants = [
        jax.block_until_ready(x0 * (1.0 + 0.01 * k)) for k in range(reps + 1)
    ]
    jax.block_until_ready(run(variants[-1]))  # compile + warm
    best = float("inf")
    for k in range(reps):
        t0 = time.perf_counter()
        out = run(variants[k])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms per iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    it = args.iters

    rng = np.random.default_rng(0)
    shapes = {
        "C64": (32, 256, 256, 64),
        "C128": (32, 256, 128, 128),
    }
    xs = {
        k: jax.device_put((rng.normal(size=s) * 0.1).astype(jnp.bfloat16))
        for k, s in shapes.items()
    }

    # stats pass: read x, emit per-channel sum/sumsq; feed a scalar back
    # into the chain so the reduce cannot be elided
    def stats_body(x):
        xf = x.astype(jnp.float32)
        s = jnp.sum(xf, axis=(0, 1, 2))
        ss = jnp.sum(xf * xf, axis=(0, 1, 2))
        return x * (1.0 + 1e-20 * (s[0] + ss[0])).astype(x.dtype)

    # normalize+relu pass (stats given): pure elementwise read+write
    def norm_body(x):
        y = jax.nn.relu(x.astype(jnp.float32) * 1.0001 - 1e-6)
        return (y - 0.05).astype(jnp.bfloat16)  # keep values bounded-ish

    # BN backward reduce: read dy and xhat (use x twice — same traffic)
    def bwd_body(x):
        xf = x.astype(jnp.float32)
        s = jnp.sum(xf, axis=(0, 1, 2))
        ss = jnp.sum(xf * (xf + 1.0), axis=(0, 1, 2))
        return x * (1.0 + 1e-20 * (s[0] + ss[0])).astype(x.dtype)

    print(f"{'pass':<24}{'C64 ms':>10}{'C128 ms':>10}{'C64/C128':>10}")
    for name, body in [
        ("stats (sum+sumsq)", stats_body),
        ("normalize+relu", norm_body),
        ("bwd-style reduce", bwd_body),
    ]:
        t = {k: timed_chain(body, xs[k], it) for k in shapes}
        print(f"{name:<24}{t['C64']:>10.3f}{t['C128']:>10.3f}"
              f"{t['C64'] / t['C128']:>10.2f}")

    # conv2 chain: [3,3,64,64] at 256^2 vs W-packed [3,3,128,128] (2x FLOPs)
    k64 = jax.device_put(
        np.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    )
    k128 = jax.device_put(
        np.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    )

    def conv_body(k):
        # renormalize each iteration so the chained activations stay
        # numerically live in bf16 (advisor r3 #4: a fixed 0.05 multiplier
        # compounds to exact zeros within a few of the 30 iterations):
        # kernel entries ~ N(0, 0.05²) ⇒ conv std gain = 0.05·3·sqrt(Cin)
        cin = k.shape[2]
        g = float(1.0 / (0.05 * 3.0 * np.sqrt(cin)))

        def body(x):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y * g
        return body

    t64 = timed_chain(conv_body(k64), xs["C64"], it)
    t128 = timed_chain(conv_body(k128), xs["C128"], it)
    print(f"{'conv 3x3 fwd':<24}{t64:>10.3f}{t128:>10.3f}{t64 / t128:>10.2f}")
    print("(conv C128 row does 2x the FLOPs — W-packed kernel is half")
    print(" structural zeros; ratio > 1.0 means packed wins outright)")

    # matmul sanity row: known speed-of-light anchor for the harness
    a = jax.device_put(
        np.asarray(rng.normal(size=(8192, 8192)) * 0.01, jnp.bfloat16)
    )

    def mm_body(x):
        return (x @ a) * 0.01

    tmm = timed_chain(mm_body, a, it)
    print(f"sanity matmul 8192^3: {tmm:.3f} ms "
          f"({1.1e12 / (tmm * 1e-3) / 1e12:.0f} TF/s vs 197 peak)")


if __name__ == "__main__":
    main()
