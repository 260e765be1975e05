"""TRUE golden-parity tests against the reference's OWN torch modules.

Unlike tests/test_convert.py (which checks converters against torch
modules reimplemented in the test file), these import
``/root/reference/geo_deep_learning/models/**`` directly — the only
missing dependencies (timm, kornia) are provided by the numerically
faithful stubs in ``tests/_stubs`` — randomize their state, convert the
state dicts with ``models/convert.py``, and assert our Flax forward
matches the torch forward.

Covered golden paths (reference file:line):
- MiT b0/b2 encoder features    (models/encoders/mix_transformer.py:279)
- full SegFormer model          (models/segmentation/segformer.py:15)
- DOFAv2 encoder taps           (models/encoders/dofa_v2.py:184)
- full DOFA assembly out + aux  (models/segmentation/dofa.py:24)
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_STUBS = str(Path(__file__).parent / "_stubs")
_REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

if _STUBS not in sys.path:
    sys.path.insert(0, _STUBS)
if _REFERENCE not in sys.path:
    sys.path.insert(0, _REFERENCE)

from geo_deep_learning_tpu.models import convert  # noqa: E402

TOL = 2e-4


def _randomize(module: torch.nn.Module, seed: int = 0) -> None:
    """Randomize parameters AND BN running stats so mapping bugs can't hide
    behind default zeros/ones."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if not p.requires_grad:
                # e.g. DOFA's fixed sincos pos_embed (dofa_v2.py:235-238):
                # our side recomputes it, so it must keep its init values
                continue
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=gen))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).uniform_(
                        -0.3, 0.3, generator=gen
                    )
                )
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(
                        0.5, 1.5, generator=gen
                    )
                )


def _state(module: torch.nn.Module) -> dict[str, np.ndarray]:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


@pytest.mark.parametrize("variant", ["mit_b0", "mit_b2"])
def test_mit_encoder_golden(variant):
    """Reference MixVisionTransformer (mix_transformer.py:279) vs our MiT."""
    from geo_deep_learning.models.encoders.mix_transformer import get_encoder

    from geo_deep_learning_tpu.models.encoders.mix_transformer import (
        MixVisionTransformer,
    )

    tmodel = get_encoder(variant, in_channels=3, depth=5, weights=None)
    tmodel.eval()
    _randomize(tmodel)

    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tmodel(_nchw(x))
    # smp wrapper returns the feature pyramid; keep the 4 MiT stages
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats[-4:]]

    converted = convert.convert_mit(_state(tmodel))
    jmodel = MixVisionTransformer(variant=variant)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        converted["params"]
    ), "converted MiT param tree does not match the model's"
    jfeats = jmodel.apply({"params": converted["params"]}, jnp.asarray(x), train=False)
    for tf_, jf in zip(tfeats, jfeats):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=TOL, rtol=0)


def test_segformer_full_model_golden():
    """Reference SegFormerSegmentationModel (segformer.py:15) end to end."""
    from geo_deep_learning.models.segmentation.segformer import (
        SegFormerSegmentationModel,
    )

    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

    tmodel = SegFormerSegmentationModel(encoder="mit_b0", num_classes=4)
    tmodel.eval()
    _randomize(tmodel, seed=2)

    x = np.random.default_rng(3).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(_nchw(x)).numpy()
    tout = np.transpose(tout, (0, 2, 3, 1))

    converted = convert.convert_segformer_model(_state(tmodel))
    jmodel = SegFormer(encoder_name="mit_b0", num_classes=4)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        converted["params"]
    )
    jout = jmodel.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(jout.out), tout, atol=TOL, rtol=0)


def test_dofa_encoder_golden():
    """Reference DOFAv2 (dofa_v2.py:184) wavelength-conditioned taps."""
    from geo_deep_learning.models.encoders.dofa_v2 import create_dofa_base

    from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2

    tmodel = create_dofa_base(img_size=(112, 112), pretrained=False)
    tmodel.eval()
    _randomize(tmodel, seed=4)

    x = np.random.default_rng(5).normal(size=(2, 112, 112, 3)).astype(np.float32)
    wl = np.asarray([0.665, 0.549, 0.481], np.float32)
    with torch.no_grad():
        tfeats = tmodel(_nchw(x), torch.from_numpy(wl))
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats]

    converted = convert.convert_dofa(_state(tmodel))
    jmodel = DOFAv2(variant="dofa_base")
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(wl), train=False
    )
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        converted["params"]
    )
    jfeats = jmodel.apply(
        {"params": converted["params"]}, jnp.asarray(x), jnp.asarray(wl), train=False
    )
    assert len(jfeats) == len(tfeats)
    for tf_, jf in zip(tfeats, jfeats):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=TOL, rtol=0)


def test_dofa_full_model_golden():
    """Reference DOFASegmentationModel (dofa.py:24): out AND aux logits."""
    from geo_deep_learning.models.segmentation.dofa import DOFASegmentationModel

    from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

    tmodel = DOFASegmentationModel(
        encoder="dofa_base", image_size=(112, 112), num_classes=3, pretrained=False
    )
    tmodel.eval()
    _randomize(tmodel, seed=6)

    x = np.random.default_rng(7).normal(size=(1, 112, 112, 3)).astype(np.float32)
    wl = np.asarray([0.665, 0.549, 0.481], np.float32)
    with torch.no_grad():
        tout = tmodel(_nchw(x), torch.from_numpy(wl))
    t_main = np.transpose(tout.out.numpy(), (0, 2, 3, 1))
    t_aux = np.transpose(tout.aux.numpy(), (0, 2, 3, 1))

    converted = convert.convert_dofa_model(_state(tmodel))
    jmodel = DOFASegmentation(encoder_name="dofa_base", num_classes=3)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(wl), train=False
    )
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        converted["params"]
    )
    jout = jmodel.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(x),
        jnp.asarray(wl),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(jout.out), t_main, atol=TOL, rtol=0)
    np.testing.assert_allclose(np.asarray(jout.aux), t_aux, atol=TOL, rtol=0)
