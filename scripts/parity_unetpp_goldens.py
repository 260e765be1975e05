"""Golden-check the torch UNet++ parity twin against the Flax model on
SHARED weights — forward, loss, gradients, and a short Adam trajectory.

VERDICT r3 next-step 1(c): the −3.2 pt UNet++ parity gap could sit in
either implementation (the torch side is a from-spec twin because smp is
absent). This script transfers the torch twin's initialized weights into
the Flax param tree and asserts, on real parity batches:

  1. train-mode forward logits match,
  2. updated BatchNorm batch statistics match,
  3. Dice loss matches,
  4. parameter gradients match,
  5. an N-step Adam trajectory tracks (loss curves + param drift).

If 1–4 pass, the stacks are semantically identical and the mIoU gap must
come from what is NOT shared — the init distributions (torch
kaiming_uniform(a=√5) conv init vs flax lecun_normal) — which step 6
tests directly: run the JAX trainer from torch-matching init.

Usage:
    JAX_PLATFORMS=cpu python scripts/parity_unetpp_goldens.py \
        --data /tmp/parity.npz --steps 30
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

from parity_train_torch import (  # noqa: E402
    TorchUnetPlusPlus,
    dice_loss as torch_dice_loss,
    load_npz,
)


def torch_to_flax(model: torch.nn.Module, params, batch_stats):
    """Map the twin's state_dict onto the Flax param/batch_stats trees."""
    import jax

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        want = node[path[-1]].shape
        if val.shape != want:
            msg = f"shape mismatch at {path}: {val.shape} vs {want}"
            raise ValueError(msg)
        node[path[-1]] = val.astype(node[path[-1]].dtype)

    def conv_w(v):  # OIHW -> HWIO
        return v.transpose(2, 3, 1, 0)

    def bn(prefix_t, path_f):
        put(params, [*path_f, "scale"], sd[f"{prefix_t}.weight"])
        put(params, [*path_f, "bias"], sd[f"{prefix_t}.bias"])
        put(batch_stats, [*path_f, "mean"], sd[f"{prefix_t}.running_mean"])
        put(batch_stats, [*path_f, "var"], sd[f"{prefix_t}.running_var"])

    # encoder stem
    put(params, ["encoder", "conv1", "kernel"], conv_w(sd["stem.0.weight"]))
    bn("stem.1", ["encoder", "bn1"])
    # encoder stages
    layer_sizes = {1: 2, 2: 2, 3: 2, 4: 2}  # resnet18 topology
    for s, nblocks in layer_sizes.items():
        for b in range(nblocks):
            tp, fp = f"layer{s}.{b}", f"layer{s}_{b}"
            put(
                params, ["encoder", fp, "conv1", "kernel"],
                conv_w(sd[f"{tp}.conv1.weight"]),
            )
            bn(f"{tp}.bn1", ["encoder", fp, "bn1"])
            put(
                params, ["encoder", fp, "conv2", "kernel"],
                conv_w(sd[f"{tp}.conv2.weight"]),
            )
            bn(f"{tp}.bn2", ["encoder", fp, "bn2"])
            if f"{tp}.down.0.weight" in sd:
                put(
                    params, ["encoder", fp, "downsample_conv", "kernel"],
                    conv_w(sd[f"{tp}.down.0.weight"]),
                )
                bn(f"{tp}.down.1", ["encoder", fp, "downsample_bn"])
    # decoder dense nodes
    depth = 4
    for layer in range(depth):
        for d in range(depth - layer):
            j = d + layer
            tp = f"blocks.x_{d}_{j}"
            fp = ["decoder", f"x_{d}_{j}"]
            put(
                params, [*fp, "conv1", "conv", "kernel"],
                conv_w(sd[f"{tp}.net.0.weight"]),
            )
            bn(f"{tp}.net.1", [*fp, "conv1", "bn"])
            put(
                params, [*fp, "conv2", "conv", "kernel"],
                conv_w(sd[f"{tp}.net.3.weight"]),
            )
            bn(f"{tp}.net.4", [*fp, "conv2", "bn"])
    # final full-res block + head
    fp = ["decoder", f"x_0_{depth}"]
    put(params, [*fp, "conv1", "conv", "kernel"], conv_w(sd["final.net.0.weight"]))
    bn("final.net.1", [*fp, "conv1", "bn"])
    put(params, [*fp, "conv2", "conv", "kernel"], conv_w(sd["final.net.3.weight"]))
    bn("final.net.4", [*fp, "conv2", "bn"])
    put(params, ["head", "kernel"], conv_w(sd["head.weight"]))
    put(params, ["head", "bias"], sd["head.bias"])
    return params, batch_stats


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.abs(b).max() + 1e-12))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/parity.npz")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    torch.set_num_threads(1)
    trn_x, trn_y, val_x, val_y, ncls = load_npz(args.data)

    tw = TorchUnetPlusPlus(ncls)

    import jax
    import jax.numpy as jnp

    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    fm = UnetPlusPlus(encoder_name="resnet18", num_classes=ncls)
    xb0 = jnp.asarray(trn_x[: args.batch], jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), xb0, train=True)
    params, bstats = torch_to_flax(
        tw, jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
    )

    # ---- 1+2: train-mode forward + BN stats update
    xb_t = torch.from_numpy(trn_x[: args.batch]).permute(0, 3, 1, 2).float()
    yb_np = trn_y[: args.batch]
    tw.train()
    out_t = tw(xb_t)
    out_f, mutated = fm.apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(trn_x[: args.batch]),
        train=True,
        mutable=["batch_stats"],
    )
    e_fwd = rel_err(
        np.moveaxis(np.asarray(out_f.out), 3, 1), out_t.detach().numpy()
    )
    print(f"[1] train-mode forward rel err: {e_fwd:.3e}")

    bs_new = jax.device_get(mutated["batch_stats"])
    errs = []
    for tname, fpath in [
        ("stem.1", ("encoder", "bn1")),
        ("blocks.x_0_3.net.1", ("decoder", "x_0_3", "conv1", "bn")),
        ("final.net.4", ("decoder", "x_0_4", "conv2", "bn")),
    ]:
        tb = dict(tw.named_buffers())
        node = bs_new
        for k in fpath:
            node = node[k]
        errs.append(rel_err(node["mean"], tb[f"{tname}.running_mean"].numpy()))
        errs.append(rel_err(node["var"], tb[f"{tname}.running_var"].numpy()))
    print(f"[2] BN running-stat update max rel err: {max(errs):.3e}")

    # ---- 3: loss
    loss_t = torch_dice_loss(out_t, torch.from_numpy(yb_np).long())
    dl = DiceLoss(mode="multiclass")
    loss_f = dl(out_f.out, jnp.asarray(yb_np))
    print(f"[3] dice loss: torch {float(loss_t):.6f} flax {float(loss_f):.6f}")

    # ---- 4: gradients
    tw.zero_grad()
    loss_t.backward()

    def loss_fn(p):
        out, _ = fm.apply(
            {"params": p, "batch_stats": bstats},
            jnp.asarray(trn_x[: args.batch]),
            train=True,
            mutable=["batch_stats"],
        )
        return dl(out.out, jnp.asarray(yb_np))

    grads = jax.device_get(jax.grad(loss_fn)(params))
    gerrs = {}
    tgrad = {k: v.grad.numpy() for k, v in tw.named_parameters() if v.grad is not None}

    def g(path):
        node = grads
        for k in path:
            node = node[k]
        return node

    gerrs["stem conv"] = rel_err(
        g(("encoder", "conv1", "kernel")), tgrad["stem.0.weight"].transpose(2, 3, 1, 0)
    )
    gerrs["x_0_0 conv1"] = rel_err(
        g(("decoder", "x_0_0", "conv1", "conv", "kernel")),
        tgrad["blocks.x_0_0.net.0.weight"].transpose(2, 3, 1, 0),
    )
    gerrs["x_3_3 conv1"] = rel_err(
        g(("decoder", "x_3_3", "conv1", "conv", "kernel")),
        tgrad["blocks.x_3_3.net.0.weight"].transpose(2, 3, 1, 0),
    )
    gerrs["head"] = rel_err(
        g(("head", "kernel")), tgrad["head.weight"].transpose(2, 3, 1, 0)
    )
    gerrs["final bn scale"] = rel_err(
        g(("decoder", "x_0_4", "conv2", "bn", "scale")),
        tgrad["final.net.4.weight"],
    )
    for k, v in gerrs.items():
        print(f"[4] grad rel err {k}: {v:.3e}")

    # ---- 5: N-step Adam trajectory on identical batches
    opt_t = torch.optim.Adam(tw.parameters(), lr=args.lr)
    task = SegmentationTask(model=fm, loss=dl, num_classes=ncls)
    tx = build_optimizer(params, optimizer="adam", lr=args.lr)
    state = TrainState.create(
        apply_fn=fm.apply, params=params, tx=tx, batch_stats=bstats,
        rng=jax.random.PRNGKey(1),
    )
    step_fn = make_train_step(task, PrecisionPolicy.create("32-true"), augment=None)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(trn_x))
    print(f"[5] {args.steps}-step Adam trajectory (identical batches):")
    for s in range(args.steps):
        idx = order[(s * args.batch) % (len(trn_x) - args.batch) :][: args.batch]
        xb = torch.from_numpy(trn_x[idx]).permute(0, 3, 1, 2).float()
        yb = torch.from_numpy(trn_y[idx]).long()
        opt_t.zero_grad()
        lt = torch_dice_loss(tw(xb), yb)
        lt.backward()
        opt_t.step()
        batch = {"image": jnp.asarray(trn_x[idx]), "mask": jnp.asarray(trn_y[idx])}
        state, metrics = step_fn(state, batch)
        lf = float(metrics["loss"])
        if s % 5 == 0 or s == args.steps - 1:
            print(f"    step {s:3d}: torch {float(lt):.6f} flax {lf:.6f} "
                  f"diff {abs(float(lt) - lf):.2e}")
    drift = rel_err(
        jax.device_get(state.params)["head"]["kernel"],
        dict(tw.named_parameters())["head.weight"].detach().numpy().transpose(2, 3, 1, 0),
    )
    print(f"[5] head-kernel drift after {args.steps} steps: {drift:.3e}")


if __name__ == "__main__":
    main()
