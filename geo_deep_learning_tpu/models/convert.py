"""Pretrained-weight conversion: torch state dicts → Flax PyTrees.

The reference downloads pretrained weights at model-construction time
(smp ImageNet ResNets via UNet++, SegFormer MiT from the smp URL registry
mix_transformer.py:599-708, DOFA from HuggingFace with key remapping
dofa_v2.py:286-392). On TPU hosts the checkpoints arrive as torch
``.pth``/``.safetensors`` files; this module converts them into our Flax
parameter trees, handling:

- layout transposes: OIHW conv → HWIO, [out, in] linear → [in, out],
- torchvision ResNet naming → our encoder module paths,
- SegFormer (official/smp) MiT naming → our MiT paths, incl. splitting
  torch ``nn.TransformerEncoderLayer``-style fused in-proj tensors,
- DOFA v2 naming → our DOFA paths (weight-generator transformer included),
- first-conv re-plumbing for N≠3 input channels (reference
  ``patch_first_conv``, models/utils.py:140-181),
- positional-embedding resize for changed grid sizes
  (reference dofa_v2.py:349-392) — our DOFA uses fixed sincos pos-embeds
  computed at trace time, so no resize is ever needed there.

Loading a raw file requires torch (CPU) only for ``torch.load``; numpy
state dicts work without torch.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Mapping

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a .pth/.pt/.ckpt/.safetensors file into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # HF DOFA artifacts wrap everything under a "model" dict
    # (reference dofa_v2.py:302-304)
    if isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        obj = obj["model"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def load_pretrained_tree(
    path: str, fmt: str = "resnet", in_channels: int = 3
) -> dict:
    """Load a pretrained encoder tree from either a raw torch checkpoint
    (converted on the fly) or a pre-converted ``.msgpack`` produced by
    ``scripts/fetch_weights.py convert`` (no torch needed at train time).
    """
    if str(path).endswith(".msgpack"):
        from pathlib import Path

        from flax import serialization

        return serialization.msgpack_restore(Path(path).read_bytes())
    state_dict = load_torch_state_dict(path)
    dispatch = {
        "resnet": lambda: convert_resnet(state_dict, in_channels),
        "mit": lambda: convert_mit(state_dict, in_channels),
        "dofa": lambda: convert_dofa(state_dict),
    }
    if fmt not in dispatch:
        msg = f"unknown torch_weights format {fmt!r}; one of {sorted(dispatch)}"
        raise ValueError(msg)
    return dispatch[fmt]()


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    """[out, in] → [in, out]."""
    return np.transpose(w)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def patch_first_conv(
    kernel: np.ndarray, in_channels: int, rescale: bool = True
) -> np.ndarray:
    """Adapt an HWIO first-conv kernel to a new input channel count.

    Reference semantics (models/utils.py:140-181): 1 channel = sum over
    RGB; N channels = cycle the RGB kernels and rescale by 3/N so
    activations keep their magnitude.
    """
    h, w, c_in, c_out = kernel.shape
    if in_channels == c_in:
        return kernel
    if in_channels == 1:
        return kernel.sum(axis=2, keepdims=True)
    reps = -(-in_channels // c_in)
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_channels, :]
    if rescale:
        tiled = tiled * (c_in / in_channels)
    return tiled


# --------------------------------------------------------------------------
# torchvision ResNet → ResNetEncoder
# --------------------------------------------------------------------------


def convert_resnet(
    state: Mapping[str, np.ndarray], in_channels: int = 3
) -> dict:
    """torchvision/smp ResNet state dict → our ``ResNetEncoder`` params.

    Returns ``{"params": ..., "batch_stats": ...}`` subtrees (merge into
    the encoder's variable collection).
    """
    params: dict = {}
    stats: dict = {}

    def put_bn(prefix_t: str, prefix_f: str) -> None:
        _set(params, f"{prefix_f}/scale", np.asarray(state[f"{prefix_t}.weight"]))
        _set(params, f"{prefix_f}/bias", np.asarray(state[f"{prefix_t}.bias"]))
        _set(stats, f"{prefix_f}/mean", np.asarray(state[f"{prefix_t}.running_mean"]))
        _set(stats, f"{prefix_f}/var", np.asarray(state[f"{prefix_t}.running_var"]))

    first = _conv(np.asarray(state["conv1.weight"]))
    _set(params, "conv1/kernel", patch_first_conv(first, in_channels))
    put_bn("bn1", "bn1")

    block_re = re.compile(r"^layer(\d)\.(\d+)\.(.+)$")
    for key in state:
        m = block_re.match(key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        fp = f"layer{stage}_{block}"
        if rest.startswith("conv") and rest.endswith("weight"):
            idx = rest[4]
            _set(params, f"{fp}/conv{idx}/kernel", _conv(np.asarray(state[key])))
        elif rest.startswith("bn") and rest.endswith("weight"):
            put_bn(f"layer{stage}.{block}.bn{rest[2]}", f"{fp}/bn{rest[2]}")
        elif rest == "downsample.0.weight":
            _set(params, f"{fp}/downsample_conv/kernel", _conv(np.asarray(state[key])))
        elif rest == "downsample.1.weight":
            put_bn(f"layer{stage}.{block}.downsample.1", f"{fp}/downsample_bn")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# SegFormer MiT → MixVisionTransformer
# --------------------------------------------------------------------------


def convert_mit(state: Mapping[str, np.ndarray], in_channels: int = 3) -> dict:
    """Official/smp SegFormer MiT state dict → ``MixVisionTransformer``.

    torch names: patch_embed{1..4}.{proj,norm}, block{s}.{i}.{norm1,attn.{q,kv,proj,sr,norm},norm2,mlp.{fc1,dwconv.dwconv,fc2}}, norm{1..4}.
    """
    params: dict = {}

    def ln(src: str, dst: str) -> None:
        _set(params, f"{dst}/scale", np.asarray(state[f"{src}.weight"]))
        _set(params, f"{dst}/bias", np.asarray(state[f"{src}.bias"]))

    for s in range(1, 5):
        kern = _conv(np.asarray(state[f"patch_embed{s}.proj.weight"]))
        if s == 1:
            kern = patch_first_conv(kern, in_channels)
        _set(params, f"patch_embed{s}/proj/kernel", kern)
        _set(
            params,
            f"patch_embed{s}/proj/bias",
            np.asarray(state[f"patch_embed{s}.proj.bias"]),
        )
        ln(f"patch_embed{s}.norm", f"patch_embed{s}/norm")
        ln(f"norm{s}", f"norm{s}")

    block_re = re.compile(r"^block(\d)\.(\d+)\.(.+)\.(weight|bias)$")
    for key in state:
        m = block_re.match(key)
        if not m:
            continue
        stage, i, inner, kind = m.group(1), int(m.group(2)), m.group(3), m.group(4)
        fp = f"block{stage}_{i}"
        val = np.asarray(state[key])
        if inner in ("norm1", "norm2"):
            _set(params, f"{fp}/{inner}/{'scale' if kind == 'weight' else 'bias'}", val)
        elif inner == "attn.q":
            _set(params, f"{fp}/attn/q/{'kernel' if kind == 'weight' else 'bias'}",
                 _dense(val) if kind == "weight" else val)
        elif inner == "attn.kv":
            _set(params, f"{fp}/attn/kv/{'kernel' if kind == 'weight' else 'bias'}",
                 _dense(val) if kind == "weight" else val)
        elif inner == "attn.proj":
            _set(params, f"{fp}/attn/proj/{'kernel' if kind == 'weight' else 'bias'}",
                 _dense(val) if kind == "weight" else val)
        elif inner == "attn.sr":
            _set(params, f"{fp}/attn/sr/{'kernel' if kind == 'weight' else 'bias'}",
                 _conv(val) if kind == "weight" else val)
        elif inner == "attn.norm":
            _set(params, f"{fp}/attn/sr_norm/{'scale' if kind == 'weight' else 'bias'}", val)
        elif inner == "mlp.fc1":
            _set(params, f"{fp}/mlp/fc1/{'kernel' if kind == 'weight' else 'bias'}",
                 _dense(val) if kind == "weight" else val)
        elif inner == "mlp.fc2":
            _set(params, f"{fp}/mlp/fc2/{'kernel' if kind == 'weight' else 'bias'}",
                 _dense(val) if kind == "weight" else val)
        elif inner == "mlp.dwconv.dwconv":
            # torch depthwise [C, 1, 3, 3] → flax HWIO [3, 3, 1, C]
            _set(params, f"{fp}/mlp/dwconv/{'kernel' if kind == 'weight' else 'bias'}",
                 np.transpose(val, (2, 3, 1, 0)) if kind == "weight" else val)
    return {"params": params}


# --------------------------------------------------------------------------
# DOFA v2 → DOFAv2
# --------------------------------------------------------------------------


def remap_hf_dofa(state: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Raw HuggingFace DOFA artifact → the reference's post-remap layout.

    Replicates ``dofa_v2.py:306-323``: keys under a ``model.`` prefix are
    stripped and kept only for ``blocks.* / norm.* / cls_token /
    pos_embed`` (the artifact carries extra pretraining heads there);
    unprefixed keys (the wavelength-conditioned ``patch_embed.*`` tree)
    pass through. Idempotent on already-clean dicts.
    """
    out: dict[str, np.ndarray] = {}
    for key, value in state.items():
        if key.startswith("model."):
            nk = key[6:]
            if nk.startswith(("blocks.", "norm.")) or nk in {
                "cls_token",
                "pos_embed",
            }:
                out[nk] = value
        else:
            out[key] = value
    return out


def convert_dofa(
    state: Mapping[str, np.ndarray], num_heads: int | None = None
) -> dict:
    """DOFA v2 (raw HF artifact or reference post-remap layout) → ``DOFAv2``.

    torch names (dofa_v2.py): patch_embed.weight_generator.{transformer_encoder.layers.0.*, fc_weight, fc_bias, weight_tokens, bias_token},
    patch_embed.fclayer.{w1,w2}, cls_token, blocks.{i}.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2,ls2.gamma}, norm.

    ``num_heads`` overrides the d_model→heads table (base 768→12,
    large 1024→16) for non-standard dims.
    """

    state = remap_hf_dofa(state)

    def heads_of(d_model: int) -> int:
        return num_heads if num_heads is not None else _dofa_heads(d_model)
    params: dict = {}

    def ln(src: str, dst: str) -> None:
        _set(params, f"{dst}/scale", np.asarray(state[f"{src}.weight"]))
        _set(params, f"{dst}/bias", np.asarray(state[f"{src}.bias"]))

    def dense(src: str, dst: str) -> None:
        _set(params, f"{dst}/kernel", _dense(np.asarray(state[f"{src}.weight"])))
        if f"{src}.bias" in state:
            _set(params, f"{dst}/bias", np.asarray(state[f"{src}.bias"]))

    pe = "patch_embed"
    wg = f"{pe}.weight_generator"
    _set(params, "patch_embed/weight_generator/weight_tokens",
         np.asarray(state[f"{wg}.weight_tokens"]))
    _set(params, "patch_embed/weight_generator/bias_token",
         np.asarray(state[f"{wg}.bias_token"]))
    dense(f"{wg}.fc_weight", "patch_embed/weight_generator/fc_weight")
    dense(f"{wg}.fc_bias", "patch_embed/weight_generator/fc_bias")
    dense(f"{pe}.fclayer.w1", "patch_embed/fclayer/w1")
    dense(f"{pe}.fclayer.w2", "patch_embed/fclayer/w2")

    # torch TransformerEncoderLayer: fused in_proj [3D, D] + out_proj
    tl = f"{wg}.transformer_encoder.layers.0"
    el = "patch_embed/weight_generator/encoder_layer"
    in_w = np.asarray(state[f"{tl}.self_attn.in_proj_weight"])
    in_b = np.asarray(state[f"{tl}.self_attn.in_proj_bias"])
    d = in_w.shape[1]
    heads = 4
    head_dim = d // heads
    for name, wpart, bpart in (
        ("query", in_w[:d], in_b[:d]),
        ("key", in_w[d : 2 * d], in_b[d : 2 * d]),
        ("value", in_w[2 * d :], in_b[2 * d :]),
    ):
        # flax MHA kernel shape [D, heads, head_dim]
        _set(params, f"{el}/self_attn/{name}/kernel",
             _dense(wpart).reshape(d, heads, head_dim))
        _set(params, f"{el}/self_attn/{name}/bias", bpart.reshape(heads, head_dim))
    out_w = np.asarray(state[f"{tl}.self_attn.out_proj.weight"])
    _set(params, f"{el}/self_attn/out/kernel",
         _dense(out_w).reshape(heads, head_dim, d))
    _set(params, f"{el}/self_attn/out/bias",
         np.asarray(state[f"{tl}.self_attn.out_proj.bias"]))
    dense(f"{tl}.linear1", f"{el}/linear1")
    dense(f"{tl}.linear2", f"{el}/linear2")
    ln(f"{tl}.norm1", f"{el}/norm1")
    ln(f"{tl}.norm2", f"{el}/norm2")

    _set(params, "cls_token", np.asarray(state["cls_token"]))

    block_re = re.compile(r"^blocks\.(\d+)\.(.+)$")
    for key in state:
        m = block_re.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        fp = f"block{i}"
        val = np.asarray(state[key])
        if rest == "norm1.weight":
            _set(params, f"{fp}/norm1/scale", val)
        elif rest == "norm1.bias":
            _set(params, f"{fp}/norm1/bias", val)
        elif rest == "norm2.weight":
            _set(params, f"{fp}/norm2/scale", val)
        elif rest == "norm2.bias":
            _set(params, f"{fp}/norm2/bias", val)
        elif rest == "ls1.gamma":
            _set(params, f"{fp}/ls1_gamma", val)
        elif rest == "ls2.gamma":
            _set(params, f"{fp}/ls2_gamma", val)
        elif rest == "mlp.fc1.weight":
            _set(params, f"{fp}/mlp_fc1/kernel", _dense(val))
        elif rest == "mlp.fc1.bias":
            _set(params, f"{fp}/mlp_fc1/bias", val)
        elif rest == "mlp.fc2.weight":
            _set(params, f"{fp}/mlp_fc2/kernel", _dense(val))
        elif rest == "mlp.fc2.bias":
            _set(params, f"{fp}/mlp_fc2/bias", val)
        elif rest == "attn.qkv.weight":
            d_model = val.shape[1]
            # qkv fused [3D, D]; flax MHA wants per-head [D, H, hd]
            n_heads = heads_of(d_model)
            hd = d_model // n_heads
            for j, name in enumerate(("query", "key", "value")):
                part = val[j * d_model : (j + 1) * d_model]
                _set(params, f"{fp}/attn/{name}/kernel",
                     _dense(part).reshape(d_model, n_heads, hd))
        elif rest == "attn.qkv.bias":
            d_model = val.shape[0] // 3
            n_heads = heads_of(d_model)
            hd = d_model // n_heads
            for j, name in enumerate(("query", "key", "value")):
                part = val[j * d_model : (j + 1) * d_model]
                _set(params, f"{fp}/attn/{name}/bias", part.reshape(n_heads, hd))
        elif rest == "attn.proj.weight":
            d_model = val.shape[0]
            n_heads = heads_of(d_model)
            hd = d_model // n_heads
            _set(params, f"{fp}/attn/out/kernel",
                 _dense(val).reshape(n_heads, hd, d_model))
        elif rest == "attn.proj.bias":
            _set(params, f"{fp}/attn/out/bias", val)
    if "norm.weight" in state:
        ln("norm", "norm")
    out = {"params": params}
    if "pos_embed" in state:
        # carried as a SIDE entry (our DOFAv2 has no pos_embed param —
        # it recomputes sincos at the current grid); pass it to
        # ``DOFAv2(pos_embed_table=...)`` to reproduce the reference's
        # resize-the-trained-table behavior at mismatched grids
        out["pos_embed"] = np.asarray(state["pos_embed"])
    return out


def _dofa_heads(d_model: int) -> int:
    return {768: 12, 1024: 16}.get(d_model, max(1, d_model // 64))


def _bicubic_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] row-interpolation matrix of torch's ``interpolate(mode=
    "bicubic", align_corners=False)``: cubic convolution kernel with
    a = -0.75, half-pixel source coordinates, indices clamped at the
    borders (replicate). Verified element-exact against torch in
    tests/test_fetch_weights.py."""
    a = -0.75

    def w(x: float) -> float:
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
        if x < 2.0:
            return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
        return 0.0

    m = np.zeros((out_size, in_size), np.float64)
    for o in range(out_size):
        src = (o + 0.5) * in_size / out_size - 0.5
        i = int(np.floor(src))
        t = src - i
        for k in range(-1, 3):
            m[o, min(max(i + k, 0), in_size - 1)] += w(k - t)
    return m


def resize_pos_embed(pos_embed: np.ndarray, num_patches: int) -> np.ndarray:
    """Resize a ``[1, 1 + g², D]`` ViT positional table to a new square
    grid, replicating the reference's checkpoint-load behavior
    (``dofa_v2.py:349-392``): keep the cls row, bicubic-resize the grid
    rows. The trained positional RANGE is preserved (the standard ViT
    practice) — unlike recomputing sincos at the new grid, which would
    extrapolate positions the pretrained blocks never saw."""
    pos_embed = np.asarray(pos_embed)
    if pos_embed.shape[1] == num_patches + 1:
        return pos_embed
    cls_row = pos_embed[:, :1, :]
    grid = pos_embed[:, 1:, :]
    old_g = int(round(grid.shape[1] ** 0.5))
    new_g = int(round(num_patches**0.5))
    if old_g != new_g:
        d = grid.shape[-1]
        g2 = grid.reshape(old_g, old_g, d).astype(np.float64)
        m = _bicubic_matrix(new_g, old_g)
        g2 = np.einsum("oi,ijd->ojd", m, g2)
        g2 = np.einsum("pj,ojd->opd", m, g2)
        grid = g2.reshape(1, new_g * new_g, d).astype(pos_embed.dtype)
    return np.concatenate([cls_row, grid], axis=1)


# --------------------------------------------------------------------------
# Full-assembly converters (encoder + neck + decoder + heads)
# --------------------------------------------------------------------------


def _strip(state: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in state.items() if k.startswith(prefix)}


def _put_convmodule(
    params: dict,
    stats: dict,
    state: Mapping[str, np.ndarray],
    src: str,
    dst: str,
) -> None:
    """torch ``ConvModule`` (.conv + .norm BN) → flax ``ConvModule`` (/conv + /bn).

    Reference models/utils.py:10-52 (bias=False) and the neck's own
    ConvModule necks/multilevel_neck.py:28-67 (bias=True) both map here;
    the bias is carried iff present in the state dict.
    """
    _set(params, f"{dst}/conv/kernel", _conv(np.asarray(state[f"{src}.conv.weight"])))
    if f"{src}.conv.bias" in state:
        _set(params, f"{dst}/conv/bias", np.asarray(state[f"{src}.conv.bias"]))
    _set(params, f"{dst}/bn/scale", np.asarray(state[f"{src}.norm.weight"]))
    _set(params, f"{dst}/bn/bias", np.asarray(state[f"{src}.norm.bias"]))
    _set(stats, f"{dst}/bn/mean", np.asarray(state[f"{src}.norm.running_mean"]))
    _set(stats, f"{dst}/bn/var", np.asarray(state[f"{src}.norm.running_var"]))


def convert_segformer_model(
    state: Mapping[str, np.ndarray], in_channels: int = 3
) -> dict:
    """Full reference ``SegFormerSegmentationModel`` state dict → our
    ``SegFormer`` variables (encoder + all-MLP decoder).

    torch names (models/segmentation/segformer.py + decoders/segformer_mlp.py):
    encoder.*, decoder.linear_c{1..4}.proj, decoder.linear_fuse.{0:conv,1:BN},
    decoder.linear_pred.
    """
    enc = convert_mit(_strip(state, "encoder."), in_channels)
    params: dict = {"encoder": enc["params"]}
    stats: dict = {}
    dec: dict = {}
    for i in range(1, 5):
        _set(dec, f"linear_c{i}/kernel",
             _dense(np.asarray(state[f"decoder.linear_c{i}.proj.weight"])))
        _set(dec, f"linear_c{i}/bias",
             np.asarray(state[f"decoder.linear_c{i}.proj.bias"]))
    _set(dec, "linear_fuse/kernel",
         _conv(np.asarray(state["decoder.linear_fuse.0.weight"])))
    _set(dec, "bn/scale", np.asarray(state["decoder.linear_fuse.1.weight"]))
    _set(dec, "bn/bias", np.asarray(state["decoder.linear_fuse.1.bias"]))
    _set(stats, "decoder/bn/mean",
         np.asarray(state["decoder.linear_fuse.1.running_mean"]))
    _set(stats, "decoder/bn/var",
         np.asarray(state["decoder.linear_fuse.1.running_var"]))
    _set(dec, "linear_pred/kernel",
         _conv(np.asarray(state["decoder.linear_pred.weight"])))
    _set(dec, "linear_pred/bias", np.asarray(state["decoder.linear_pred.bias"]))
    params["decoder"] = dec
    return {"params": params, "batch_stats": stats}


def convert_dofa_model(
    state: Mapping[str, np.ndarray],
    num_heads: int | None = None,
    pool_scales: tuple[int, ...] = (1, 2, 3, 6),
) -> dict:
    """Full reference ``DOFASegmentationModel`` state dict → our
    ``DOFASegmentation`` variables.

    torch names (models/segmentation/dofa.py:24-107): encoder.*,
    neck.{lateral_convs,convs}.{i}, decoder.{psp_modules.{j}.1, bottleneck,
    lateral_convs.{i}, fpn_convs.{i}, fpn_bottleneck}, aux_head.{convs.{i},
    cls_seg}, head.conv.
    """
    enc = convert_dofa(_strip(state, "encoder."), num_heads=num_heads)
    params: dict = {"encoder": enc["params"]}
    stats: dict = {}

    neck_p: dict = {}
    neck_s: dict = {}
    for i in range(4):
        _put_convmodule(neck_p, neck_s, state, f"neck.lateral_convs.{i}", f"lateral{i}")
        _put_convmodule(neck_p, neck_s, state, f"neck.convs.{i}", f"conv{i}")
    params["neck"] = neck_p
    stats["neck"] = neck_s

    dec_p: dict = {}
    dec_s: dict = {}
    for j, scale in enumerate(pool_scales):
        _put_convmodule(
            dec_p, dec_s, state, f"decoder.psp_modules.{j}.1", f"ppm/pool{scale}"
        )
    _put_convmodule(dec_p, dec_s, state, "decoder.bottleneck", "bottleneck")
    i = 0
    while f"decoder.lateral_convs.{i}.conv.weight" in state:
        _put_convmodule(dec_p, dec_s, state, f"decoder.lateral_convs.{i}", f"lateral{i}")
        _put_convmodule(dec_p, dec_s, state, f"decoder.fpn_convs.{i}", f"fpn_conv{i}")
        i += 1
    _put_convmodule(dec_p, dec_s, state, "decoder.fpn_bottleneck", "fpn_bottleneck")
    params["decoder"] = dec_p
    stats["decoder"] = dec_s

    aux_p: dict = {}
    aux_s: dict = {}
    i = 0
    while f"aux_head.convs.{i}.conv.weight" in state:
        _put_convmodule(aux_p, aux_s, state, f"aux_head.convs.{i}", f"conv{i}")
        i += 1
    _set(aux_p, "cls_seg/kernel", _conv(np.asarray(state["aux_head.cls_seg.weight"])))
    _set(aux_p, "cls_seg/bias", np.asarray(state["aux_head.cls_seg.bias"]))
    params["aux_head"] = aux_p
    stats["aux_head"] = aux_s

    _set(params, "head/conv/kernel", _conv(np.asarray(state["head.conv.weight"])))
    _set(params, "head/conv/bias", np.asarray(state["head.conv.bias"]))
    return {"params": params, "batch_stats": stats}


def merge_pretrained(variables: dict, converted: dict, subtree: str) -> dict:
    """Graft converted encoder weights into a model's variable tree.

    ``subtree`` is the encoder module name in the assembly (e.g.
    ``"encoder"``). Shapes are validated leaf-by-leaf; mismatches raise.
    """
    import jax

    out = jax.tree.map(lambda x: x, variables)  # shallow copy

    def graft(dst: dict, src: dict, path: str) -> None:
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    msg = f"pretrained subtree {path}/{k} missing in model"
                    raise KeyError(msg)
                graft(dst[k], v, f"{path}/{k}")
            else:
                cur = dst.get(k)
                if cur is None:
                    msg = f"pretrained leaf {path}/{k} missing in model"
                    raise KeyError(msg)
                if tuple(cur.shape) != tuple(v.shape):
                    msg = (
                        f"shape mismatch at {path}/{k}: "
                        f"model {tuple(cur.shape)} vs checkpoint {tuple(v.shape)}"
                    )
                    raise ValueError(msg)
                dst[k] = np.asarray(v, dtype=np.asarray(cur).dtype)

    for collection, tree in converted.items():
        if not isinstance(tree, dict):
            # side entries (e.g. DOFA's "pos_embed" table) are consumed at
            # model construction (``DOFAv2(pos_embed_table=...)``), not
            # grafted into variables — an ndarray here used to crash the
            # trainer's torch_weights path on dofa artifacts
            continue
        if not tree:
            continue
        target = out.setdefault(collection, {}).setdefault(subtree, {})
        graft(target, tree, f"{collection}/{subtree}")
    return out
