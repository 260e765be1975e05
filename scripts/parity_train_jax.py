"""Train OUR stack on the shared parity dataset (scripts/parity_train_torch.py
is the reference side; see that file's docstring for the protocol).

Identical protocol: same npz bytes, same standardization constants, no
augmentation, same Dice loss semantics (+0.4*aux for DOFA), Adam lr 5e-4,
bs 8, fixed epochs, dataset-level best-epoch val mIoU from the same
confusion-matrix formula.

Runs in f32 by default for apples-to-apples numerics with torch CPU
(pass --precision bf16-mixed to measure the production policy instead).

Usage:
    python scripts/parity_train_jax.py --model segformer \
        --data /tmp/parity.npz --epochs 25 --out /tmp/parity_jax.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--data", default="/tmp/parity.npz")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", default="32-true")
    p.add_argument(
        "--init-from-torch",
        action="store_true",
        help="unetpp only: initialize from the torch parity twin's exact "
        "init (same --seed) via scripts/parity_unetpp_goldens.torch_to_flax "
        "— the A/B that isolates init-distribution effects from dynamics",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.ops.metrics import iou_from_confusion
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_eval_step, make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    d = np.load(args.data)
    trn_x, trn_y = d["trn_images"], d["trn_masks"]
    val_x, val_y = d["val_images"], d["val_masks"]
    ncls = int(d["num_classes"])
    mean = trn_x.mean(axis=(0, 1, 2), keepdims=True)
    std = trn_x.std(axis=(0, 1, 2), keepdims=True) + 1e-6
    trn_x = ((trn_x - mean) / std).astype(np.float32)
    val_x = ((val_x - mean) / std).astype(np.float32)

    dtype = jnp.float32 if args.precision == "32-true" else jnp.bfloat16
    if args.model == "segformer":
        from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

        model = SegFormer(encoder_name="mit_b0", num_classes=ncls, dtype=dtype)
        wavelengths = None
    elif args.model == "dofa":
        from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

        model = DOFASegmentation(
            encoder_name="dofa_base", num_classes=ncls, dtype=dtype
        )
        wavelengths = np.asarray([0.665, 0.549, 0.481], np.float32)
    elif args.model == "unetpp":
        from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

        model = UnetPlusPlus(
            encoder_name="resnet18", num_classes=ncls, dtype=dtype
        )
        wavelengths = None
    else:
        msg = f"unknown model {args.model}"
        raise ValueError(msg)

    task = SegmentationTask(
        model=model, loss=DiceLoss(mode="multiclass"), num_classes=ncls
    )
    sample = {"image": trn_x[: args.batch], "mask": trn_y[: args.batch]}
    if wavelengths is not None:
        sample["wavelengths"] = wavelengths
    variables = task.init_variables(jax.random.PRNGKey(args.seed), sample)
    if args.init_from_torch:
        if args.model != "unetpp":
            msg = "--init-from-torch is implemented for unetpp only"
            raise SystemExit(msg)
        import torch

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from parity_train_torch import TorchUnetPlusPlus
        from parity_unetpp_goldens import torch_to_flax

        torch.manual_seed(args.seed)
        params0, bstats0 = torch_to_flax(
            TorchUnetPlusPlus(ncls),
            jax.device_get(variables["params"]),
            jax.device_get(variables.get("batch_stats", {})),
        )
        variables = {
            "params": jax.tree.map(jnp.asarray, params0),
            "batch_stats": jax.tree.map(jnp.asarray, bstats0),
        }
    tx = build_optimizer(variables["params"], optimizer="adam", lr=args.lr)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        rng=jax.random.PRNGKey(args.seed + 1),
    )
    precision = PrecisionPolicy.create(args.precision)
    train_step = make_train_step(task, precision, augment=None)
    eval_step = make_eval_step(task, precision)

    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )
    rng = np.random.default_rng(args.seed)
    n = len(trn_x)
    best_miou, history = 0.0, []
    t0 = time.time()
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        tot, nb = 0.0, 0
        for i in range(0, n - args.batch + 1, args.batch):
            idx = order[i : i + args.batch]
            batch = {"image": jnp.asarray(trn_x[idx]), "mask": jnp.asarray(trn_y[idx])}
            if wavelengths is not None:
                batch["wavelengths"] = jnp.asarray(wavelengths)
            state, metrics = train_step(state, batch)
            tot += float(metrics["loss"])
            nb += 1
        cm = np.zeros((ncls, ncls))
        for i in range(0, len(val_x), args.batch):
            batch = {
                "image": jnp.asarray(val_x[i : i + args.batch]),
                "mask": jnp.asarray(val_y[i : i + args.batch]),
            }
            if wavelengths is not None:
                batch["wavelengths"] = jnp.asarray(wavelengths)
            out = eval_step(state, batch)
            cm += np.asarray(out["confusion"])
        iou = iou_from_confusion(jnp.asarray(cm))
        miou = float(jnp.nanmean(iou))
        best_miou = max(best_miou, miou)
        history.append(
            {"epoch": epoch, "train_loss": tot / max(nb, 1), "val_miou": miou}
        )
        print(
            f"[jax {args.model}] epoch {epoch}: loss={history[-1]['train_loss']:.4f} "
            f"val_miou={miou:.4f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
    result = {
        "stack": "jax-tpu-native",
        "model": args.model,
        "params": n_params,
        "best_val_miou": best_miou,
        "final_val_miou": history[-1]["val_miou"],
        "epochs": args.epochs,
        "precision": args.precision,
        "history": history,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "history"}))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
