"""Scene-inference benchmark: sliding-window tiles/sec for all 3 families.

Measures `inference.sliding_window_logits` (512² tiles, 128 px
Hann-blended overlap) over a 2048×2048 RGB scene — 25 tiles — on the
available accelerator, including the host→device scene transfer. DOFA
runs the static-λ path with the pre-baked patch embedding
(`inference.export.bake_dofa_embedding`). Prints one JSON line.

Usage: python scripts/bench_scene.py [--model all|segformer_b0|unetpp_r34|dofa_base]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TILE = 512
SCENE = 2048


def build_forward(name: str):
    dtype = jnp.bfloat16
    num_classes = 5
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, TILE, TILE, 3), dtype)
    # weights thread through sliding_window_logits(params=...) as a traced
    # argument — closing them over fwd would inline them as HLO constants
    # (440 MB for DOFA-base: overflows the compile service's request limit)
    if name == "segformer_b0":
        from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

        model = SegFormer(encoder_name="mit_b0", num_classes=num_classes, dtype=dtype)
        variables = model.init(rng, x0, train=False)

        def fwd(params, tiles):
            return model.apply(params, tiles, train=False).out

    elif name == "unetpp_r34":
        from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

        model = UnetPlusPlus(
            encoder_name="resnet34", num_classes=num_classes, dtype=dtype
        )
        variables = model.init(rng, x0, train=False)

        def fwd(params, tiles):
            return model.apply(params, tiles, train=False).out

    elif name == "dofa_base":
        from geo_deep_learning_tpu.inference.export import bake_dofa_embedding
        from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

        model = DOFASegmentation(
            encoder_name="dofa_base", num_classes=num_classes, dtype=dtype
        )
        wv = jnp.asarray([0.665, 0.549, 0.481], jnp.float32)
        variables = model.init(rng, x0, wv, train=False)
        baked = tuple(
            jnp.asarray(b)
            for b in bake_dofa_embedding(variables, [0.665, 0.549, 0.481], 3)
        )
        variables = {**variables, "baked": baked}

        def fwd(params, tiles):
            return model.apply(
                {k: v for k, v in params.items() if k != "baked"},
                tiles, train=False, baked_embed=params["baked"],
            ).out

    else:
        msg = f"unknown model {name}"
        raise ValueError(msg)
    return fwd, jax.device_put(variables), num_classes


def measure(name: str, reps: int = 3) -> dict:
    from geo_deep_learning_tpu.inference.sliding_window import (
        SlidingWindowConfig,
        sliding_window_logits,
    )

    fwd, variables, num_classes = build_forward(name)
    cfg = SlidingWindowConfig(tile_size=TILE, overlap=128, batch_size=5)
    scene = np.random.default_rng(0).uniform(-1, 1, (SCENE, SCENE, 3)).astype(
        np.float32
    )
    run = lambda: sliding_window_logits(fwd, scene, num_classes, cfg, params=variables)
    out = run()
    float(jnp.asarray(out)[0, 0, 0])  # compile + sync
    n_tiles = 25
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        float(jnp.asarray(out)[0, 0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return {
        "tiles_per_sec": round(n_tiles / dt, 2),
        "scene_sec": round(dt, 3),
        "tiles": n_tiles,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all")
    args = p.parse_args()
    names = (
        ["segformer_b0", "unetpp_r34", "dofa_base"]
        if args.model == "all"
        else [args.model]
    )
    results = {n: measure(n) for n in names}
    print(
        json.dumps(
            {
                "metric": f"{SCENE}x{SCENE} scene sliding-window tiles/sec "
                f"(512^2 tiles, 128 px Hann overlap)",
                "models": results,
            }
        )
    )


if __name__ == "__main__":
    main()
