#!/usr/bin/env python
"""Pretrained-weight acquisition + conversion workflow.

The reference downloads pretrained checkpoints implicitly at
model-construction time (MiT from the smp URL registry,
reference mix_transformer.py:711-759; DOFA from HuggingFace,
reference dofa_v2.py:286-347; ImageNet ResNets via smp/torchvision).
TPU training hosts are frequently egress-less, so this repo splits the
workflow into two explicit steps that can run on different machines:

1. **fetch** (anywhere with egress)::

       python scripts/fetch_weights.py fetch mit_b0 --out ~/weights
       python scripts/fetch_weights.py fetch dofa_base --out ~/weights

   plain HTTPS downloads from the same registries the reference uses —
   copy the resulting ``.pth`` files to the training host.

2. **convert** (on the training host, or anywhere with torch-cpu)::

       python scripts/fetch_weights.py convert mit_b0 ~/weights/mit_b0.pth \
           --out ~/weights/mit_b0.msgpack [--in-channels 4]

   runs the torch→Flax layout conversion (models/convert.py) once and
   serializes the Flax variable tree with flax.serialization; training
   configs then point ``torch_weights`` / ``pretrained_path`` at either
   the raw ``.pth`` (converted on the fly) or the ``.msgpack``.

Already have the checkpoint locally? Skip step 1 and pass your file to
``convert`` — any torchvision/smp/HF layout listed in the registry works.

``python scripts/fetch_weights.py list`` prints the registry.
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

# Name → (url, converter-family). URLs mirror the registries the
# reference resolves at runtime: smp release assets for MiT
# (mix_transformer.py:590), HuggingFace for DOFA v2 (dofa_v2.py:290-292),
# torchvision model zoo for the UNet++ ResNet encoders.
_SMP = "https://github.com/qubvel/segmentation_models.pytorch/releases/download/v0.0.2"
_HF = "https://hf.co/earthflow/DOFA/resolve/main"
_TV = "https://download.pytorch.org/models"

WEIGHT_REGISTRY: dict[str, dict[str, str]] = {
    **{
        f"mit_b{i}": {"url": f"{_SMP}/mit_b{i}.pth", "family": "mit"}
        for i in range(6)
    },
    "dofa_base": {"url": f"{_HF}/dofav2_vit_base_e150.pth", "family": "dofa"},
    "dofa_large": {"url": f"{_HF}/dofav2_vit_large_e150.pth", "family": "dofa"},
    "resnet18": {"url": f"{_TV}/resnet18-f37072fd.pth", "family": "resnet"},
    "resnet34": {"url": f"{_TV}/resnet34-b627a593.pth", "family": "resnet"},
    "resnet50": {"url": f"{_TV}/resnet50-0676ba61.pth", "family": "resnet"},
    "resnext50_32x4d": {
        "url": f"{_TV}/resnext50_32x4d-7cdf4587.pth",
        "family": "resnet",
    },
}


def fetch(name: str, out_dir: str | Path) -> Path:
    """Download ``name``'s checkpoint into ``out_dir`` (requires egress)."""
    entry = WEIGHT_REGISTRY[name]
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dest = out_dir / f"{name}.pth"
    if dest.exists():
        print(f"{dest} already exists, skipping download")
        return dest
    tmp = dest.with_suffix(".part")
    print(f"fetching {entry['url']} -> {dest}")
    urllib.request.urlretrieve(entry["url"], tmp)  # noqa: S310 (registry URLs only)
    tmp.rename(dest)
    return dest


def convert_file(
    name: str,
    path: str | Path,
    out: str | Path | None = None,
    in_channels: int = 3,
) -> Path:
    """Convert a local torch checkpoint to a serialized Flax tree.

    Dispatches on the registry family; the output ``.msgpack`` holds the
    converted variable dict (``{"params": ...}`` plus ``batch_stats`` for
    BN families) exactly as ``models/convert.py`` emits it.
    """
    from flax import serialization

    from geo_deep_learning_tpu.models import convert

    family = WEIGHT_REGISTRY.get(name, {}).get("family") or name
    state = convert.load_torch_state_dict(str(path))
    if family == "mit":
        tree = convert.convert_mit(state, in_channels=in_channels)
    elif family == "dofa":
        tree = convert.convert_dofa(state)
    elif family == "resnet":
        tree = convert.convert_resnet(state, in_channels=in_channels)
    else:
        msg = f"unknown family for {name!r}; registry: {sorted(WEIGHT_REGISTRY)}"
        raise SystemExit(msg)
    out = Path(out) if out else Path(path).with_suffix(".msgpack")
    out.write_bytes(serialization.msgpack_serialize(tree))
    print(f"converted {path} ({family}) -> {out}")
    return out


def load_converted(path: str | Path) -> dict:
    """Read a ``.msgpack`` produced by :func:`convert_file`."""
    from flax import serialization

    return serialization.msgpack_restore(Path(path).read_bytes())


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="print the weight registry")
    pf = sub.add_parser("fetch", help="download a checkpoint (needs egress)")
    pf.add_argument(
        "name",
        nargs="?",
        choices=sorted(WEIGHT_REGISTRY),
        help="registry name; omit with --all to fetch every entry",
    )
    pf.add_argument(
        "--all",
        action="store_true",
        help="fetch EVERY registry entry (one-command closure for a "
        "networked host; entries already present in --out are skipped)",
    )
    pf.add_argument("--out", default="weights")
    pc = sub.add_parser("convert", help="convert a local .pth to Flax msgpack")
    pc.add_argument("name", help="registry name (or family: mit/dofa/resnet)")
    pc.add_argument("path", help="local checkpoint file")
    pc.add_argument("--out", default=None)
    pc.add_argument("--in-channels", type=int, default=3)
    args = parser.parse_args(argv)

    if args.cmd == "list":
        for name, entry in sorted(WEIGHT_REGISTRY.items()):
            print(f"{name:18s} {entry['family']:8s} {entry['url']}")
    elif args.cmd == "fetch":
        if args.all:
            for name in sorted(WEIGHT_REGISTRY):
                fetch(name, args.out)
        elif args.name:
            fetch(args.name, args.out)
        else:
            parser.error("fetch needs a registry name or --all")
    elif args.cmd == "convert":
        convert_file(args.name, args.path, args.out, args.in_channels)
    return 0


if __name__ == "__main__":
    sys.exit(main())
