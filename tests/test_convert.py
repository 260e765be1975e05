"""Weight-conversion fidelity tests.

Each test builds an independent torch module with the checkpoint-naming
conventions our converters target (torchvision ResNet, official SegFormer
MiT, DOFA v2), converts its random-initialized state dict, and checks the
Flax forward matches torch numerically. This is the parity guarantee for
loading real pretrained checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from geo_deep_learning_tpu.models import convert  # noqa: E402

ATOL = 2e-4


# --------------------------------------------------------------------------
# torch reference modules (independent implementations, checkpoint naming)
# --------------------------------------------------------------------------


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tF.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 2), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for s, (cin, cout, n) in enumerate(cfg, start=1):
            blocks = [TorchBasicBlock(cin, cout, stride=1 if s == 1 else 2)]
            blocks += [TorchBasicBlock(cout, cout) for _ in range(n - 1)]
            setattr(self, f"layer{s}", tnn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        x = tF.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            feats.append(x)
        return feats


def _randomize_bn_stats(module, rng):
    """Running stats start at 0/1; randomize so eval-mode parity is real."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.normal(size=m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, size=m.running_var.shape), dtype=torch.float32))


def test_resnet18_conversion_parity():
    from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder

    torch.manual_seed(0)
    ref = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.default_rng(1))
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    converted = convert.convert_resnet(state)

    m = ResNetEncoder(variant="resnet18")
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32)
    init = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = {
        "params": converted["params"],
        "batch_stats": converted["batch_stats"],
    }
    # structure must match what init produced
    assert jax.tree_util.tree_structure(init["params"]) == jax.tree_util.tree_structure(
        variables["params"]
    )
    ours = m.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = ref(torch.tensor(x).permute(0, 3, 1, 2))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=ATOL
        )


class TorchMiTBlock(tnn.Module):
    """Independent torch implementation of one MiT stage-1 block."""

    def __init__(self, dim=32, heads=1, sr=2, mlp_ratio=4):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.q = tnn.Linear(dim, dim, bias=True)
                self.kv = tnn.Linear(dim, dim * 2, bias=True)
                self.proj = tnn.Linear(dim, dim)
                self.sr = tnn.Conv2d(dim, dim, sr, sr)
                self.norm = tnn.LayerNorm(dim, eps=1e-6)

            def forward(self, x, h, w):
                b, n, c = x.shape
                q = self.q(x).reshape(b, n, heads, c // heads).permute(0, 2, 1, 3)
                x_ = x.permute(0, 2, 1).reshape(b, c, h, w)
                x_ = self.sr(x_).reshape(b, c, -1).permute(0, 2, 1)
                x_ = self.norm(x_)
                kv = self.kv(x_).reshape(b, -1, 2, heads, c // heads).permute(2, 0, 3, 1, 4)
                k, v = kv[0], kv[1]
                attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
                attn = attn.softmax(dim=-1)
                out = (attn @ v).transpose(1, 2).reshape(b, n, c)
                return self.proj(out)

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                hidden = dim * mlp_ratio
                self.fc1 = tnn.Linear(dim, hidden)

                class DW(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.dwconv = tnn.Conv2d(hidden, hidden, 3, 1, 1, groups=hidden)

                    def forward(self, x, h, w):
                        b, n, c = x.shape
                        x = x.transpose(1, 2).view(b, c, h, w)
                        x = self.dwconv(x)
                        return x.flatten(2).transpose(1, 2)

                self.dwconv = DW()
                self.fc2 = tnn.Linear(hidden, dim)

            def forward(self, x, h, w):
                return self.fc2(tF.gelu(self.dwconv(self.fc1(x), h, w)))

        self.attn = Attn()
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp()

    def forward(self, x, h, w):
        x = x + self.attn(self.norm1(x), h, w)
        return x + self.mlp(self.norm2(x), h, w)


def test_mit_block_conversion_parity():
    from geo_deep_learning_tpu.models.encoders.mix_transformer import MiTBlock

    torch.manual_seed(1)
    dim, h, w = 32, 8, 8
    ref = TorchMiTBlock(dim=dim, heads=1, sr=2).eval()
    state = {f"block1.0.{k}": v.numpy() for k, v in ref.state_dict().items()}
    # converter also needs stage-level tensors; fake minimal ones
    for s in range(1, 5):
        state[f"patch_embed{s}.proj.weight"] = np.zeros((dim, 3 if s == 1 else dim, 3, 3), np.float32)
        state[f"patch_embed{s}.proj.bias"] = np.zeros((dim,), np.float32)
        state[f"patch_embed{s}.norm.weight"] = np.ones((dim,), np.float32)
        state[f"patch_embed{s}.norm.bias"] = np.zeros((dim,), np.float32)
        state[f"norm{s}.weight"] = np.ones((dim,), np.float32)
        state[f"norm{s}.bias"] = np.zeros((dim,), np.float32)
    converted = convert.convert_mit(state)
    block_params = converted["params"]["block1_0"]

    m = MiTBlock(num_heads=1, sr_ratio=2, qkv_bias=True, drop_path=0.0)
    x = np.random.default_rng(3).normal(size=(2, h, w, dim)).astype(np.float32)
    init = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == jax.tree_util.tree_structure(block_params)
    ours = m.apply({"params": block_params}, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = ref(torch.tensor(x.reshape(2, h * w, dim)), h, w)
    np.testing.assert_allclose(
        np.asarray(ours).reshape(2, h * w, dim), theirs.numpy(), atol=ATOL
    )


def test_transformer_encoder_layer_conversion_parity():
    """torch nn.TransformerEncoderLayer → our post-norm layer (DOFA weight
    generator), incl. the fused in_proj split into flax MHA heads."""
    from geo_deep_learning_tpu.models.encoders.dofa import _PostNormEncoderLayer

    torch.manual_seed(2)
    d = 128
    ref = tnn.TransformerEncoderLayer(
        d_model=d, nhead=4, activation="gelu", norm_first=False, dropout=0.0,
        batch_first=False,
    ).eval()
    state = {
        f"patch_embed.weight_generator.transformer_encoder.layers.0.{k}": v.numpy()
        for k, v in ref.state_dict().items()
    }
    # converter needs the rest of the embedding tensors; fake minimal ones
    state.update(
        {
            "patch_embed.weight_generator.weight_tokens": np.zeros((128, d), np.float32),
            "patch_embed.weight_generator.bias_token": np.zeros((1, d), np.float32),
            "patch_embed.weight_generator.fc_weight.weight": np.zeros((10, d), np.float32),
            "patch_embed.weight_generator.fc_weight.bias": np.zeros((10,), np.float32),
            "patch_embed.weight_generator.fc_bias.weight": np.zeros((16, d), np.float32),
            "patch_embed.weight_generator.fc_bias.bias": np.zeros((16,), np.float32),
            "patch_embed.fclayer.w1.weight": np.zeros((d, d), np.float32),
            "patch_embed.fclayer.w1.bias": np.zeros((d,), np.float32),
            "patch_embed.fclayer.w2.weight": np.zeros((d, d), np.float32),
            "patch_embed.fclayer.w2.bias": np.zeros((d,), np.float32),
            "cls_token": np.zeros((1, 1, 16), np.float32),
        }
    )
    converted = convert.convert_dofa(state)
    layer_params = converted["params"]["patch_embed"]["weight_generator"]["encoder_layer"]

    m = _PostNormEncoderLayer(num_heads=4)
    x = np.random.default_rng(4).normal(size=(130, d)).astype(np.float32)
    init = m.init(jax.random.PRNGKey(0), jnp.asarray(x[None]))
    assert jax.tree_util.tree_structure(init["params"]) == jax.tree_util.tree_structure(layer_params)
    ours = m.apply({"params": layer_params}, jnp.asarray(x[None]))[0]
    with torch.no_grad():
        theirs = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=ATOL)


def test_patch_first_conv():
    k = np.random.default_rng(0).normal(size=(7, 7, 3, 64)).astype(np.float32)
    k1 = convert.patch_first_conv(k, 1)
    np.testing.assert_allclose(k1[..., 0, :], k.sum(axis=2), atol=1e-6)
    k6 = convert.patch_first_conv(k, 6)
    assert k6.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(k6[..., 0, :], k[..., 0, :] * 0.5, atol=1e-6)


def test_merge_pretrained_shape_check():
    from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder

    m = ResNetEncoder(variant="resnet18")
    variables = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)
    model_vars = {"params": {"encoder": variables["params"]},
                  "batch_stats": {"encoder": variables["batch_stats"]}}
    bad = {"params": {"conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        convert.merge_pretrained(model_vars, bad, "encoder")


class TorchViTBlock(tnn.Module):
    """timm-style ViT block with LayerScale (DOFA blocks), timm naming."""

    def __init__(self, dim=64, heads=4, mlp_ratio=4.0, init_values=1e-5):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(dim, dim * 3, bias=True)
                self.proj = tnn.Linear(dim, dim)

            def forward(self, x):
                b, n, c = x.shape
                qkv = self.qkv(x).reshape(b, n, 3, heads, c // heads)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
                attn = attn.softmax(dim=-1)
                return self.proj((attn @ v).transpose(1, 2).reshape(b, n, c))

        class LS(tnn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = tnn.Parameter(torch.full((dim,), init_values))

            def forward(self, x):
                return x * self.gamma

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
                self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

            def forward(self, x):
                return self.fc2(tF.gelu(self.fc1(x)))

        self.attn = Attn()
        self.ls1 = LS()
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp()
        self.ls2 = LS()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


def test_dofa_vit_block_conversion_parity():
    from geo_deep_learning_tpu.models.encoders.dofa import ViTBlock

    torch.manual_seed(5)
    dim = 64
    ref = TorchViTBlock(dim=dim, heads=4).eval()
    with torch.no_grad():  # non-trivial LayerScale values
        ref.ls1.gamma.uniform_(-0.1, 0.1)
        ref.ls2.gamma.uniform_(-0.1, 0.1)
    state = {f"blocks.0.{k}": v.numpy() for k, v in ref.state_dict().items()}
    state["cls_token"] = np.zeros((1, 1, dim), np.float32)
    # minimal patch-embed tensors so convert_dofa runs
    d = 128
    tl = tnn.TransformerEncoderLayer(d_model=d, nhead=4, activation="gelu",
                                     norm_first=False, dropout=0.0)
    state.update({
        f"patch_embed.weight_generator.transformer_encoder.layers.0.{k}": v.numpy()
        for k, v in tl.state_dict().items()
    })
    state.update({
        "patch_embed.weight_generator.weight_tokens": np.zeros((128, d), np.float32),
        "patch_embed.weight_generator.bias_token": np.zeros((1, d), np.float32),
        "patch_embed.weight_generator.fc_weight.weight": np.zeros((10, d), np.float32),
        "patch_embed.weight_generator.fc_weight.bias": np.zeros((10,), np.float32),
        "patch_embed.weight_generator.fc_bias.weight": np.zeros((16, d), np.float32),
        "patch_embed.weight_generator.fc_bias.bias": np.zeros((16,), np.float32),
        "patch_embed.fclayer.w1.weight": np.zeros((d, d), np.float32),
        "patch_embed.fclayer.w1.bias": np.zeros((d,), np.float32),
        "patch_embed.fclayer.w2.weight": np.zeros((d, d), np.float32),
        "patch_embed.fclayer.w2.bias": np.zeros((d,), np.float32),
    })
    converted = convert.convert_dofa(state, num_heads=4)
    block_params = converted["params"]["block0"]

    m = ViTBlock(num_heads=4, drop_path=0.0, init_values=1e-5)
    x = np.random.default_rng(6).normal(size=(2, 10, dim)).astype(np.float32)
    init = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == jax.tree_util.tree_structure(block_params)
    # blocks are residual-lazy: the true post-block stream is s + branch
    s, br = m.apply({"params": block_params}, jnp.asarray(x), train=False)
    ours = s + br
    with torch.no_grad():
        theirs = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=ATOL)
