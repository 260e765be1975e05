"""scripts/fetch_weights.py workflow smoke tests (no network).

The download leg needs egress; everything after it — the documented
local-file path — is tested end to end here: a real torch ``.pth`` on
disk (state dict from the reference's own MiT module), converted via the
script to a ``.msgpack``, then loaded back through BOTH entry points the
trainer accepts (raw ``.pth`` / pre-converted ``.msgpack``) with
identical leaves. Reference workflow being replaced:
mix_transformer.py:711-759 (URL download at model build time).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REPO = Path(__file__).parent.parent
_STUBS = str(Path(__file__).parent / "_stubs")
for p in (_STUBS, "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

spec = importlib.util.spec_from_file_location(
    "fetch_weights", _REPO / "scripts" / "fetch_weights.py"
)
fetch_weights = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fetch_weights)


def test_registry_covers_reference_families():
    reg = fetch_weights.WEIGHT_REGISTRY
    # the reference's three pretrained families (SURVEY.md §2.1)
    assert {f"mit_b{i}" for i in range(6)} <= set(reg)
    assert {"dofa_base", "dofa_large"} <= set(reg)
    assert "resnet34" in reg  # UNet++ default encoder
    for entry in reg.values():
        assert entry["url"].startswith("https://")
        assert entry["family"] in {"mit", "dofa", "resnet"}


def test_list_command(capsys):
    assert fetch_weights.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "mit_b0" in out and "dofa_base" in out


def test_convert_roundtrip_and_trainer_paths(tmp_path):
    """reference mit_b0 .pth → script convert → msgpack; the trainer's
    load_pretrained_tree yields identical leaves from either file."""
    from geo_deep_learning.models.encoders.mix_transformer import get_encoder

    from geo_deep_learning_tpu.models import convert as cv

    tmodel = get_encoder("mit_b0", in_channels=3, depth=5, weights=None)
    pth = tmp_path / "mit_b0.pth"
    torch.save(tmodel.state_dict(), pth)

    out = fetch_weights.convert_file("mit_b0", pth, out=tmp_path / "mit_b0.msgpack")
    restored = fetch_weights.load_converted(out)

    direct = cv.convert_mit(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    import jax

    assert jax.tree.structure(restored) == jax.tree.structure(direct)

    from_pth = cv.load_pretrained_tree(str(pth), fmt="mit")
    from_msgpack = cv.load_pretrained_tree(str(out))
    flat_a = jax.tree.leaves(from_pth)
    flat_b = jax.tree.leaves(from_msgpack)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    # and the tree grafts into the real model (shape-validated merge)
    import jax.numpy as jnp

    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer

    model = SegFormer(encoder_name="mit_b0", num_classes=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    merged = cv.merge_pretrained(dict(variables), from_msgpack, "encoder")
    assert jax.tree.structure(merged) == jax.tree.structure(dict(variables))


def test_unknown_family_raises(tmp_path):
    f = tmp_path / "x.pth"
    torch.save({}, f)
    with pytest.raises(SystemExit):
        fetch_weights.convert_file("nonsense", f)
