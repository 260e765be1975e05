"""Layer-by-layer divergence probe between the torch UNet++ twin and the
Flax model on shared weights (companion to parity_unetpp_goldens.py).

Locates where train-mode forward divergence enters: a gradual growth
with depth = float-reassociation chaos; a jump at one module = a bug.
Pass --f64 to run both sides in double precision — if the divergence
collapses there, it is float noise, not semantics.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "scripts"))

import torch  # noqa: E402

from parity_train_torch import TorchUnetPlusPlus, load_npz  # noqa: E402
from parity_unetpp_goldens import rel_err, torch_to_flax  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/parity.npz")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--f64", action="store_true", help="run both sides in f64")
    args = p.parse_args()

    import jax

    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    torch.manual_seed(0)
    torch.set_num_threads(1)
    trn_x, trn_y, *_ , ncls = load_npz(args.data)
    tw = TorchUnetPlusPlus(ncls)
    dt_model = jnp.float64 if args.f64 else jnp.float32
    # f64 mode uses the unpacked tail: PackedBatchNorm pins its statistics
    # to f32 internally (exact-math packing is covered by its own tests)
    fm = UnetPlusPlus(
        encoder_name="resnet18", num_classes=ncls,
        dtype=dt_model, param_dtype=dt_model,
        packed_tail=not args.f64,
    )
    xb0 = jnp.asarray(trn_x[: args.batch], jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), xb0, train=True)
    params, bstats = torch_to_flax(
        tw, jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
    )
    if args.f64:
        tw = tw.double()
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        bstats = jax.tree.map(lambda a: np.asarray(a, np.float64), bstats)

    # ---- torch intermediates via hooks
    acts_t = {}
    xb_t = torch.from_numpy(trn_x[: args.batch]).permute(0, 3, 1, 2)
    xb_t = xb_t.double() if args.f64 else xb_t.float()
    tw.train()
    with torch.no_grad():
        c1 = tw.stem(xb_t)
        c2 = tw.layer1(tw.pool(c1))
        c3 = tw.layer2(c2)
        c4 = tw.layer3(c3)
        c5 = tw.layer4(c4)
        acts_t.update(c1=c1, c2=c2, c3=c3, c4=c4, c5=c5)
        feats = [c5, c4, c3, c2, c1]
        up = lambda t: torch.nn.functional.interpolate(
            t, scale_factor=2, mode="nearest"
        )
        dense = {}
        depth = 4
        for layer in range(depth):
            for d in range(depth - layer):
                j = d + layer
                if layer == 0:
                    parts = [up(feats[d]), feats[d + 1]]
                else:
                    parts = [up(dense[(d, j - 1)])]
                    parts += [dense[(i, j)] for i in range(d + 1, j + 1)]
                    parts.append(feats[j + 1])
                dense[(d, j)] = tw.blocks[f"x_{d}_{j}"](torch.cat(parts, dim=1))
                acts_t[f"x_{d}_{j}"] = dense[(d, j)]
        fin = tw.final(up(dense[(0, 3)]))
        acts_t["final"] = fin
        acts_t["logits"] = tw.head(fin)

    # ---- flax intermediates
    dt = jnp.float64 if args.f64 else jnp.float32
    xin = jnp.asarray(trn_x[: args.batch], dt)
    out, state = fm.apply(
        {"params": params, "batch_stats": bstats},
        xin, train=True,
        mutable=["batch_stats", "intermediates"],
        capture_intermediates=True,
    )
    inter = state["intermediates"]

    def get(path):
        node = inter
        for k in path.split("/"):
            node = node[k]
        return np.asarray(node["__call__"][0])

    def cmp(name, f_arr, t_arr):
        t = t_arr.numpy()
        f = np.moveaxis(f_arr, 3, 1) if f_arr.ndim == 4 else f_arr
        print(f"{name:12s} rel={rel_err(f, t):.3e}  "
              f"mean|Δ|={np.abs(np.asarray(f, np.float64) - t).mean():.3e}")

    enc = [np.asarray(a) for a in get_enc(inter)]
    for nm, f_arr, t_key in [
        ("c1", enc[0], "c1"), ("c2", enc[1], "c2"), ("c3", enc[2], "c3"),
        ("c4", enc[3], "c4"), ("c5", enc[4], "c5"),
    ]:
        cmp(nm, f_arr, acts_t[t_key])
    for layer in range(4):
        for d in range(4 - layer):
            j = d + layer
            # merged-skips execution computes nodes via the conv2 child
            # (the _DenseNodeShell itself is never __call__'d)
            f_arr = None
            for sub in (f"decoder/x_{d}_{j}", f"decoder/x_{d}_{j}/conv2"):
                try:
                    f_arr = get(sub)
                    break
                except KeyError:
                    continue
            if f_arr is None:
                print(f"x_{d}_{j}: no intermediate captured")
                continue
            cmp(f"x_{d}_{j}", f_arr, acts_t[f"x_{d}_{j}"])
    cmp("logits", np.asarray(out.out), acts_t["logits"])


def get_enc(inter):
    # ResNetEncoder returns the feature list as its module output
    return inter["encoder"]["__call__"][0]


if __name__ == "__main__":
    main()
