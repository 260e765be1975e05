#!/usr/bin/env python
"""One-command egress-day closure for real pretrained weights.

The only reference workflow this repo cannot exercise on a zero-egress
host is downloading REAL pretrained checkpoints (the reference resolves
them at model-build time: mix_transformer.py:711-759, dofa_v2.py:286-392,
torchvision for ResNets). Everything after the download is golden-tested
against the reference's own loader on format-faithful fixtures
(tests/test_fetch_weights.py). This script closes the remaining gap in
ONE command on any networked machine::

    python scripts/pretrained_closure.py --out weights/

which runs, per registry entry:

1. **fetch**     — ``scripts/fetch_weights.py fetch --all`` semantics
                   (already-present ``.pth`` files are skipped),
2. **convert**   — torch→Flax layout conversion to ``.msgpack``,
3. **verify**    — the converted tree is merged into a freshly built
                   model of the right variant (leaf-by-leaf shape check,
                   ``models/convert.py merge_pretrained``) and every
                   loaded leaf is checked finite,

and then per FAMILY (resnet → UNet++, mit → SegFormer, dofa → DOFA):

4. **smoke fine-tune** — a 1-epoch ``Trainer.fit`` on a tiny synthetic
   CSV dataset, warm-started from the converted artifact through the
   same ``torch_weights`` path the configs use, asserting a finite
   val_loss — i.e. "pretrained encoder fine-tuning" demonstrated on the
   real artifacts end to end.

Flags for constrained runs: ``--names`` for a subset, ``--skip-fetch``
when the ``.pth`` files are already on disk (air-gapped transfer),
``--no-smoke`` for convert+verify only, ``--report`` to write a JSON
summary. The orchestration itself (convert → verify → smoke, everything
but the network leg) is dry-run tested in
``tests/test_fetch_weights.py::test_pretrained_closure_dry_run``.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

_spec = importlib.util.spec_from_file_location(
    "fetch_weights", _REPO / "scripts" / "fetch_weights.py"
)
fetch_weights = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fetch_weights)

# family → the model variant a converted artifact is verified against
# (smallest member that exercises the family's full conversion surface)
_VERIFY_VARIANT = {
    "resnet18": ("resnet", "resnet18"),
    "resnet34": ("resnet", "resnet34"),
    "resnet50": ("resnet", "resnet50"),
    "resnext50_32x4d": ("resnet", "resnext50_32x4d"),
    **{f"mit_b{i}": ("mit", f"mit_b{i}") for i in range(6)},
    "dofa_base": ("dofa", "dofa_base"),
    "dofa_large": ("dofa", "dofa_large"),
}


def _build_encoder(family: str, variant: str, tree: dict):
    """The bare encoder module a converted tree merges into."""
    if family == "resnet":
        from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder

        return ResNetEncoder(variant=variant), (1, 32, 32, 3), ()
    if family == "mit":
        from geo_deep_learning_tpu.models.encoders.mix_transformer import (
            MixVisionTransformer,
        )

        return MixVisionTransformer(variant=variant), (1, 32, 32, 3), ()
    if family == "dofa":
        from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2

        wl = np.asarray([0.665, 0.549, 0.481], np.float32)
        return (
            DOFAv2(
                variant=variant,
                convert_patch_to_16=True,
                pos_embed_table=tree.get("pos_embed"),
            ),
            (1, 32, 32, 3),
            (wl,),
        )
    msg = f"unknown family {family!r}"
    raise SystemExit(msg)


def verify_converted(name: str, artifact: Path) -> dict:
    """Merge a converted tree into a live model; shape-check + finiteness."""
    import jax
    import jax.numpy as jnp

    from geo_deep_learning_tpu.models import convert as cv

    family, variant = _VERIFY_VARIANT[name]
    tree = fetch_weights.load_converted(artifact)
    model, ishape, extra = _build_encoder(family, variant, tree)
    x = jnp.zeros(ishape, jnp.float32)
    args = (x, *[jnp.asarray(e) for e in extra])
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    # wrap as an assembly-style tree so merge_pretrained's subtree logic
    # (the exact path the Trainer's torch_weights uses) is what's tested
    wrapped = {k: {"encoder": v} for k, v in variables.items()}
    merged = cv.merge_pretrained(wrapped, tree, "encoder")
    n_leaves = len(jax.tree.leaves(merged["params"]))
    finite = all(
        bool(np.isfinite(np.asarray(leaf)).all())
        for leaf in jax.tree.leaves(merged)
        if hasattr(leaf, "dtype") and np.issubdtype(np.asarray(leaf).dtype, np.floating)
    )
    if not finite:
        msg = f"{name}: non-finite values in converted tree"
        raise SystemExit(msg)
    return {"family": family, "param_leaves": n_leaves, "finite": True}


def make_smoke_dataset(root: Path, size: int = 64, n_train: int = 8) -> Path:
    """Tiny learnable CSV dataset (CSVDataset layout, csv_dataset.py:89-106)."""
    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    rng = np.random.default_rng(0)
    for split, n in [("trn", n_train), ("val", 4), ("tst", 4)]:
        (root / split / "image").mkdir(parents=True, exist_ok=True)
        (root / split / "label").mkdir(parents=True, exist_ok=True)
        rows = []
        for i in range(n):
            img = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
            mask = (img.mean(axis=-1) > 127).astype(np.uint8)
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(root / split / "label" / f"{i}_lbl.tif", mask)
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    return root


def _smoke_task(family: str, num_classes: int = 1):
    """The per-family task a real artifact warm-starts (one per family)."""
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.training.task import SegmentationTask

    if family == "resnet":
        from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

        model = UnetPlusPlus(encoder_name="resnet34", num_classes=num_classes)
        weights_name = "resnet34"
    elif family == "mit":
        from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

        model = SegFormer(encoder_name="mit_b0", num_classes=num_classes)
        weights_name = "mit_b0"
    elif family == "dofa":
        from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

        model = DOFASegmentation(encoder_name="dofa_base", num_classes=num_classes)
        weights_name = "dofa_base"
    else:  # pragma: no cover - guarded by the registry
        msg = f"unknown family {family!r}"
        raise SystemExit(msg)
    task = SegmentationTask(
        model=model,
        loss=DiceLoss(mode="binary" if num_classes == 1 else "multiclass"),
        num_classes=num_classes,
        default_wavelengths=[0.665, 0.549, 0.481] if family == "dofa" else None,
    )
    return task, weights_name


def smoke_finetune(
    family: str,
    artifact: Path,
    work_dir: Path,
    data_root: Path | None = None,
    epochs: int = 1,
    size: int = 64,
) -> dict:
    """1-epoch fine-tune from the converted artifact (the reference's core
    pretrained-encoder workflow, e.g. configs/segformer_config_RGB.yaml)."""
    from geo_deep_learning_tpu.data.datamodule import CSVDataModule
    from geo_deep_learning_tpu.training.loop import Trainer, TrainerConfig

    if data_root is None:
        data_root = make_smoke_dataset(work_dir / "smoke_data", size=size)
    task, _ = _smoke_task(family)
    dm = CSVDataModule(
        csv_root_folder=str(data_root),
        patches_root_folder=str(data_root),
        batch_size=4,
        num_workers=2,
        mean=[0.4] * 3,
        std=[0.2] * 3,
        patch_size=(size, size),
    )
    trainer = Trainer(
        TrainerConfig(
            max_epochs=epochs,
            precision="32-true",
            checkpoint_dir=str(work_dir / f"ckpt_{family}"),
            early_stopping_patience=None,
            auto_test_after_fit=False,
            augment=False,
        )
    )
    history = trainer.fit(
        task,
        dm,
        optimizer={"name": "adam", "lr": 1e-4},
        torch_weights={"path": str(artifact), "format": family, "subtree": "encoder"},
    )
    val_loss = float(history.get("val_loss", float("nan")))
    if not np.isfinite(val_loss):
        msg = f"{family}: smoke fine-tune produced non-finite val_loss"
        raise SystemExit(msg)
    return {"val_loss": val_loss, "epochs": epochs}


def run(
    out_dir: str | Path,
    names: list[str] | None = None,
    skip_fetch: bool = False,
    smoke: bool = True,
    epochs: int = 1,
    smoke_size: int = 64,
    work_dir: str | Path | None = None,
) -> dict:
    """Full closure: fetch → convert → verify per entry, smoke per family."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    names = names or sorted(fetch_weights.WEIGHT_REGISTRY)
    work = Path(work_dir) if work_dir else Path(tempfile.mkdtemp(prefix="closure_"))
    report: dict = {"entries": {}, "smoke": {}}

    artifacts: dict[str, Path] = {}
    for name in names:
        pth = out_dir / f"{name}.pth"
        if not pth.exists() and not skip_fetch:
            fetch_weights.fetch(name, out_dir)
        if not pth.exists():
            report["entries"][name] = {"status": "missing (fetch skipped)"}
            continue
        msgpack = fetch_weights.convert_file(
            name, pth, out=out_dir / f"{name}.msgpack"
        )
        info = verify_converted(name, msgpack)
        report["entries"][name] = {"status": "converted+verified", **info}
        artifacts[name] = msgpack

    if smoke:
        smoke_members = {"resnet": "resnet34", "mit": "mit_b0", "dofa": "dofa_base"}
        data_root = None
        for family, member in smoke_members.items():
            if member not in artifacts:
                report["smoke"][family] = {"status": f"skipped ({member} missing)"}
                continue
            if data_root is None:
                data_root = make_smoke_dataset(work / "smoke_data", size=smoke_size)
            result = smoke_finetune(
                family,
                artifacts[member],
                work,
                data_root=data_root,
                epochs=epochs,
                size=smoke_size,
            )
            report["smoke"][family] = {"status": "ok", **result}
    return report


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="weights", help="artifact directory")
    parser.add_argument(
        "--names", nargs="*", default=None, help="registry subset (default: all)"
    )
    parser.add_argument(
        "--skip-fetch",
        action="store_true",
        help="use .pth files already present in --out (air-gapped transfer)",
    )
    parser.add_argument("--no-smoke", action="store_true")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--smoke-size", type=int, default=64)
    parser.add_argument("--report", default=None, help="write JSON report here")
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory(prefix="closure_") as work:
        report = run(
            args.out,
            names=args.names,
            skip_fetch=args.skip_fetch,
            smoke=not args.no_smoke,
            epochs=args.epochs,
            smoke_size=args.smoke_size,
            work_dir=work,
        )
    text = json.dumps(report, indent=2)
    print(text)
    if args.report:
        Path(args.report).write_text(text)
    missing = [
        n for n, e in report["entries"].items() if e.get("status", "").startswith("missing")
    ]
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
