"""Benchmark: training throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "models": {...}}

Default (``--model all``) measures ALL THREE model families — SegFormer-B0,
UNet++ ResNet-34, DOFA-base — at the production 512x512 patch size (bf16,
full train step incl. on-device augmentation, loss, backward, optimizer).
The headline value/vs_baseline is the WORST model's ratio against its
target, so the official record can't hide a miss behind the best model;
the per-model breakdown rides in the "models" key.

The reference publishes no numbers (BASELINE.md); each baseline anchor is
a documented A100 estimate for the same workload (see BASELINE.md) and the
north-star target is 3x that, so ``vs_baseline`` = ours / (3 x A100_est):
1.0 means the 3x-A100 target is met.

Usage: python bench.py [--model all|segformer_b0|unetpp_r34|dofa_base|dofa_base_frozen]
                       [--batch N] [--steps N] [--image-size N]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Documented A100 anchors (patches/sec, 512**2, AMP, per GPU) — see BASELINE.md
A100_ESTIMATE = {
    "segformer_b0": 55.0,
    "unetpp_r34": 60.0,
    "dofa_base": 25.0,
    # reference's own recipe: encoder frozen (configs/dofa_config_RGB.yaml:57)
    # -> no ViT backward; A100 est scaled 25 / (1 - 0.33) ~= 40 (encoder bwd
    # ~ 1/3 of the full step on the same profile mix)
    "dofa_base_frozen": 40.0,
    # model corners (VERDICT r2 #9) — public MMSeg/smp training-log
    # anchors at 512**2 AMP: SegFormer-B2 ~28 p/s, DOFA-large (ViT-L
    # 24-block backbone + UperNet) ~11 p/s
    "segformer_b2": 28.0,
    "dofa_large": 11.0,
    # remat row: same math as dofa_base, so the same anchor — the row
    # documents what rematerialization costs/buys at a larger batch
    "dofa_base_remat": 25.0,
}
# per-model default batch (batch size is an implementation-freedom
# throughput knob): bs8 fits DOFA-base in HBM and measures 29% faster
# than the reference configs' bs4; UNet++ gains another ~4% at bs16
# (fixed per-op overheads amortize across the larger GEMM M dim)
DEFAULT_BATCH = {
    "segformer_b0": 16,
    "unetpp_r34": 32,  # +2% over bs16 with the factored-up2 decoder
    "dofa_base": 16,
    "dofa_base_frozen": 16,
    "segformer_b2": 16,
    "dofa_large": 8,
    "dofa_base_remat": 32,  # remat headroom: 2x the non-remat batch
}
TARGET_MULTIPLIER = 3.0


def build(model_name: str, batch: int, image_size: int):
    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    num_classes = 5
    dtype = jnp.bfloat16
    if model_name.startswith("segformer"):
        from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

        mit = {"segformer_b0": "mit_b0", "segformer_b2": "mit_b2"}[model_name]
        model = SegFormer(encoder_name=mit, num_classes=num_classes, dtype=dtype)
    elif model_name == "unetpp_r34":
        import os as _os

        from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

        # GDL_UNETPP_WPACK=1 A/Bs the W-packed finest column on (measured
        # net loss end-to-end; see BASELINE.md "W-pack study")
        model = UnetPlusPlus(
            encoder_name="resnet34",
            num_classes=num_classes,
            dtype=dtype,
            wpacked_column=_os.environ.get("GDL_UNETPP_WPACK", "0") == "1",
        )
    elif model_name in ("dofa_base", "dofa_base_frozen", "dofa_base_remat", "dofa_large"):
        import os as _os

        from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

        # GDL_DOFA_REMAT_MODE A/Bs the remat scope: "mlp" (default —
        # attention residuals stored, Pallas fwd never re-run) vs
        # "block" (whole-block checkpoint, minimum memory)
        model = DOFASegmentation(
            encoder_name="dofa_large" if model_name == "dofa_large" else "dofa_base",
            remat=model_name == "dofa_base_remat",
            remat_mode=_os.environ.get("GDL_DOFA_REMAT_MODE", "mlp"),
            num_classes=num_classes,
            dtype=dtype,
        )
    else:
        msg = f"unknown model {model_name}"
        raise ValueError(msg)

    task = SegmentationTask(
        model=model, loss=DiceLoss(mode="multiclass"), num_classes=num_classes
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "image": rng.normal(size=(batch, image_size, image_size, 3)).astype(
            np.float32
        ),
        "mask": rng.integers(0, num_classes, size=(batch, image_size, image_size)).astype(
            np.int32
        ),
    }
    if model_name.startswith("dofa"):
        batch_data["wavelengths"] = np.asarray([0.665, 0.549, 0.481], np.float32)

    # the reference's own DOFA recipe trains with the encoder FROZEN
    # (configs/dofa_config_RGB.yaml:57 freeze_layers: ["encoder"]); the
    # _frozen variant measures that exact workload — stop-gradient
    # freezing lets XLA drop the 12-block ViT backward entirely
    freeze = ["encoder"] if model_name == "dofa_base_frozen" else None

    variables = task.init_variables(jax.random.PRNGKey(0), batch_data)
    tx = build_optimizer(
        variables["params"],
        optimizer="adam",
        lr=1e-4,
        grad_clip=1.0,
        freeze_patterns=freeze,
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        rng=jax.random.PRNGKey(1),
    )
    precision = PrecisionPolicy.create("bf16-mixed")
    step = make_train_step(task, precision, freeze_patterns=freeze)
    return step, state, batch_data


# TPU v5e peak bf16 matmul throughput per chip (public spec: 197 TFLOP/s
# bf16, 394 TOP/s int8); MFU below is measured-FLOPs/sec over this peak
PEAK_BF16_FLOPS = 197e12


def measure(model_name: str, batch: int, steps: int, warmup: int, image_size: int):
    step, state, batch_data = build(model_name, batch, image_size)
    device_batch = jax.device_put(batch_data)

    # AOT-compile once: the SAME executable serves the timing loop and the
    # FLOPs audit (compiled cost_analysis = XLA's op-level FLOP count of
    # the optimized HLO), so MFU is computed for exactly the program being
    # timed — no second trace/compile through the relay.
    compiled = step.lower(state, device_batch).compile()
    flops_per_step = None
    try:
        ca = compiled.cost_analysis()
        if ca:  # dict on TPU; may be None on exotic backends
            flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops_per_step = None
    step = compiled

    for _ in range(warmup):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])  # full sync

    # The tunneled-TPU runtime's block_until_ready can return optimistically,
    # so each rep ends with a VALUE fetch (forces a real device→host round
    # trip through the final step's data dependency chain); the median of
    # several reps rejects relay-latency outliers.
    reps = 3
    per_rep = max(steps // reps, 1)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(per_rep):
            state, metrics = step(state, device_batch)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2] / per_rep

    patches_per_sec = batch / dt
    target = A100_ESTIMATE.get(model_name, 50.0) * TARGET_MULTIPLIER
    result = {
        "patches_per_sec": round(patches_per_sec, 2),
        "batch": batch,
        "target": target,
        "vs_baseline": round(patches_per_sec / target, 3),
    }
    if flops_per_step:
        result["tflops_per_step"] = round(flops_per_step / 1e12, 3)
        result["mfu"] = round(flops_per_step / dt / PEAK_BF16_FLOPS, 4)
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--image-size", type=int, default=512)
    args = p.parse_args()

    names = (
        ["segformer_b0", "unetpp_r34", "dofa_base", "dofa_base_frozen"]
        if args.model == "all"
        else [args.model]
    )
    results = {}
    for name in names:
        batch = args.batch or DEFAULT_BATCH.get(name, 8)
        results[name] = measure(
            name, batch, args.steps, args.warmup, args.image_size
        )

    # headline = the WORST model vs its target: the official record must
    # surface misses, not hide them behind the fastest model
    worst = min(results, key=lambda n: results[n]["vs_baseline"])
    size = args.image_size
    print(
        json.dumps(
            {
                "metric": (
                    f"{size}x{size} train patches/sec/chip, worst of "
                    f"{len(results)} models ({worst})"
                ),
                "value": results[worst]["patches_per_sec"],
                "unit": "patches/sec",
                "vs_baseline": results[worst]["vs_baseline"],
                "models": results,
            }
        )
    )


if __name__ == "__main__":
    main()
