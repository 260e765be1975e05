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


# ---------------------------------------------------------------------------
# VERDICT r2 #4: the full artifact path with synthetic-but-FAITHFUL fixture
# files — raw HuggingFace DOFA layout (model.* prefixes, wrapper dict, decoy
# pretraining heads), pos-embed bicubic resize at mismatched grids,
# patch-14→16, dofa_large and mit_b5 included. The reference's own loader
# is driven on the same fixtures (torch.hub monkeypatched) so both stacks
# consume identical bytes.

import jax
import jax.numpy as jnp


def _randomize(module, seed=0):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if not p.requires_grad:
                continue  # e.g. fixed sincos pos_embed
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=gen))


def _hf_artifact(tmodel, path, wrap=True):
    """Serialize a reference DOFAv2's state as a faithful raw HF file:
    transformer keys under ``model.``, patch_embed keys bare, decoy
    pretraining-head keys that the remap (dofa_v2.py:306-323) must drop,
    optionally all wrapped under a ``model`` dict."""
    sd = tmodel.state_dict()
    raw = {}
    for k, v in sd.items():
        if k.startswith(("blocks.", "norm.")) or k in {"cls_token", "pos_embed"}:
            raw[f"model.{k}"] = v
        elif k.startswith("patch_embed."):
            raw[k] = v
        # head.* etc. intentionally omitted (missing in real artifacts too)
    d = tmodel.state_dict()["cls_token"]
    raw["model.decoder_pred.weight"] = torch.zeros(4, d.shape[-1])
    raw["model.mask_token"] = torch.zeros(1, 1, d.shape[-1])
    obj = {"model": raw} if wrap else raw
    torch.save(obj, path)
    return path


def _ref_load_from_file(tmodel, path, monkeypatch):
    """Drive the REFERENCE's own load_pretrained_weights on our fixture."""
    blob = torch.load(path, weights_only=False)

    def fake_hub(url, progress, map_location, weights_only):
        return blob

    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", fake_hub)
    missing, unexpected = tmodel.load_pretrained_weights()
    assert set(missing) <= {"head.weight", "head.bias"}
    assert not unexpected
    return tmodel


def test_resize_pos_embed_matches_torch_bicubic():
    from geo_deep_learning_tpu.models import convert as cv

    rng = np.random.default_rng(0)
    for old_g, new_g in [(4, 7), (16, 8), (16, 36), (8, 8)]:
        d = 12
        pos = rng.normal(size=(1, 1 + old_g * old_g, d)).astype(np.float32)
        got = cv.resize_pos_embed(pos, new_g * new_g)
        grid = torch.from_numpy(
            pos[:, 1:, :].reshape(1, old_g, old_g, d)
        ).permute(0, 3, 1, 2)
        ref_grid = torch.nn.functional.interpolate(
            grid.double(), size=(new_g, new_g), mode="bicubic",
            align_corners=False,
        )
        ref = np.concatenate(
            [
                pos[:, :1, :],
                ref_grid.permute(0, 2, 3, 1).reshape(1, -1, d).numpy(),
            ],
            axis=1,
        )
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=f"{old_g}->{new_g}")


@pytest.mark.parametrize(
    ("variant", "maker"),
    [
        ("dofa_base", "create_dofa_base"),
        # dofa_large is the heaviest torch-CPU artifact case (~85s for the
        # two wrap variants); slow lane only — same code path as dofa_base,
        # different dims (ROADMAP item 7 / VERDICT r4 #8 quick-lane budget)
        pytest.param(
            "dofa_large", "create_dofa_large", marks=pytest.mark.slow
        ),
    ],
)
@pytest.mark.parametrize("wrap", [True, False])
def test_hf_dofa_artifact_full_pipe(tmp_path, monkeypatch, variant, maker, wrap):
    """fetch(file) → convert → msgpack → load → merge → forward parity vs
    the reference model loaded from the SAME raw-HF fixture through ITS
    own remap path (dofa_v2.py:286-347)."""
    import geo_deep_learning.models.encoders.dofa_v2 as ref_dofa

    from geo_deep_learning_tpu.models import convert as cv
    from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2

    make = getattr(ref_dofa, maker)
    src = make(img_size=(112, 112), pretrained=False)
    src.eval()
    _randomize(src, seed=11)
    pth = _hf_artifact(src, tmp_path / f"{variant}.pth", wrap=wrap)

    # our side: script convert → msgpack → tree
    out = fetch_weights.convert_file(variant, pth, out=tmp_path / "w.msgpack")
    tree = cv.load_pretrained_tree(str(out))
    assert "pos_embed" in tree  # side entry for table-based pos embed

    # reference side: ITS loader on the same bytes
    dst = make(img_size=(112, 112), pretrained=False)
    dst.eval()
    _ref_load_from_file(dst, pth, monkeypatch)

    x = np.random.default_rng(12).normal(size=(1, 112, 112, 3)).astype(np.float32)
    wl = np.asarray([0.665, 0.549, 0.481], np.float32)
    with torch.no_grad():
        tfeats = dst(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(wl)
        )
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats]

    jmodel = DOFAv2(variant=variant, pos_embed_table=tree["pos_embed"])
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(wl), train=False
    )
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        tree["params"]
    )
    jfeats = jmodel.apply(
        {"params": tree["params"]}, jnp.asarray(x), jnp.asarray(wl), train=False
    )
    for tf_, jf in zip(tfeats, jfeats):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=3e-4, rtol=0)


def test_hf_dofa_pos_embed_resize_pipe(tmp_path, monkeypatch):
    """Checkpoint trained at one grid, loaded at another: the reference
    bicubic-resizes the trained table (dofa_v2.py:324-334); with
    pos_embed_table our model reproduces that path exactly."""
    import geo_deep_learning.models.encoders.dofa_v2 as ref_dofa

    from geo_deep_learning_tpu.models import convert as cv
    from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2

    # artifact from a 224-trained model (grid 16); target img 112 (grid 8)
    src = ref_dofa.create_dofa_base(img_size=(224, 224), pretrained=False)
    src.eval()
    _randomize(src, seed=21)
    pth = _hf_artifact(src, tmp_path / "dofa_224.pth")

    dst = ref_dofa.create_dofa_base(img_size=(112, 112), pretrained=False)
    dst.eval()
    _ref_load_from_file(dst, pth, monkeypatch)

    tree = cv.load_pretrained_tree(str(pth), fmt="dofa")
    assert tree["pos_embed"].shape[1] == 1 + 16 * 16

    x = np.random.default_rng(22).normal(size=(1, 112, 112, 3)).astype(np.float32)
    wl = np.asarray([0.665, 0.549, 0.481], np.float32)
    with torch.no_grad():
        tfeats = dst(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(wl)
        )
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats]

    jmodel = DOFAv2(variant="dofa_base", pos_embed_table=tree["pos_embed"])
    jfeats = jmodel.apply(
        {"params": tree["params"]}, jnp.asarray(x), jnp.asarray(wl), train=False
    )
    for tf_, jf in zip(tfeats, jfeats):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=3e-4, rtol=0)


def test_hf_dofa_patch14_to_16_pipe(tmp_path, monkeypatch):
    """convert_patch_to_16: generated 14² kernels bicubic-resized to 16²,
    stride 16 (dofa_v2.py:167-177) — artifact path + forward parity."""
    import geo_deep_learning.models.encoders.dofa_v2 as ref_dofa

    from geo_deep_learning_tpu.models import convert as cv
    from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2

    src = ref_dofa.create_dofa_base(img_size=(112, 112), pretrained=False)
    _randomize(src, seed=31)
    pth = _hf_artifact(src, tmp_path / "dofa.pth")

    dst = ref_dofa.create_dofa_base(
        img_size=(128, 128), pretrained=False, convert_patch_to_16=True
    )
    dst.eval()
    _ref_load_from_file(dst, pth, monkeypatch)

    tree = cv.load_pretrained_tree(str(pth), fmt="dofa")
    x = np.random.default_rng(32).normal(size=(1, 128, 128, 3)).astype(np.float32)
    wl = np.asarray([0.665, 0.549, 0.481], np.float32)
    with torch.no_grad():
        tfeats = dst(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(wl)
        )
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats]

    jmodel = DOFAv2(
        variant="dofa_base",
        convert_patch_to_16=True,
        pos_embed_table=tree["pos_embed"],
    )
    jfeats = jmodel.apply(
        {"params": tree["params"]}, jnp.asarray(x), jnp.asarray(wl), train=False
    )
    for tf_, jf in zip(tfeats, jfeats):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=3e-4, rtol=0)


@pytest.mark.slow  # ~25s torch-CPU; mit_b0 covers the path in the quick lane
def test_mit_b5_artifact_pipe(tmp_path):
    """smp-layout mit_b5 artifact (the encoder's own strict state_dict,
    mix_transformer.py:746) through convert → merge → feature parity."""
    from geo_deep_learning.models.encoders.mix_transformer import get_encoder

    from geo_deep_learning_tpu.models import convert as cv
    from geo_deep_learning_tpu.models.encoders.mix_transformer import (
        MixVisionTransformer,
    )

    tmodel = get_encoder("mit_b5", in_channels=3, depth=5, weights=None)
    tmodel.eval()
    _randomize(tmodel, seed=41)
    pth = tmp_path / "mit_b5.pth"
    torch.save(tmodel.state_dict(), pth)

    out = fetch_weights.convert_file("mit_b5", pth, out=tmp_path / "b5.msgpack")
    tree = fetch_weights.load_converted(out)

    x = np.random.default_rng(42).normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    # smp encoder emits [identity, stage1..4]; compare the 4 stages
    tfeats = [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in tfeats[-4:]]

    jmodel = MixVisionTransformer(variant="mit_b5")
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        tree["params"]
    )
    jfeats = jmodel.apply({"params": tree["params"]}, jnp.asarray(x), train=False)
    for tf_, jf in zip(tfeats, jfeats[-4:]):
        np.testing.assert_allclose(np.asarray(jf), tf_, atol=3e-4, rtol=0)


def test_resnet_torchvision_layout_pipe(tmp_path):
    """torchvision-layout ResNet artifact (incl. fc head + BN
    num_batches_tracked bookkeeping keys) through convert_file with a
    non-RGB in_channels re-plumb (patch_first_conv)."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).parent))
    from test_convert import TorchResNet18

    from geo_deep_learning_tpu.models import convert as cv

    tmodel = TorchResNet18()
    tmodel.eval()
    _randomize(tmodel, seed=51)
    sd = dict(tmodel.state_dict())
    d = 512
    sd["fc.weight"] = torch.zeros(1000, d)
    sd["fc.bias"] = torch.zeros(1000)
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, pth)

    out = fetch_weights.convert_file(
        "resnet18", pth, out=tmp_path / "r18.msgpack", in_channels=4
    )
    tree = fetch_weights.load_converted(out)
    k = tree["params"]["conv1"]["kernel"]
    assert k.shape[2] == 4  # patch_first_conv re-plumbed the stem


# ---------------------------------------------------------------------------
# scripts/pretrained_closure.py — the one-command egress-day closure
# (VERDICT r4 #4). The network leg is the only part not exercised here;
# convert → verify → smoke-fine-tune runs on format-faithful fixtures.
# ---------------------------------------------------------------------------

_cspec = importlib.util.spec_from_file_location(
    "pretrained_closure", _REPO / "scripts" / "pretrained_closure.py"
)
pretrained_closure = importlib.util.module_from_spec(_cspec)
_cspec.loader.exec_module(pretrained_closure)


def _mit_b0_fixture(out_dir: Path) -> Path:
    """smp-layout mit_b0 .pth exactly as `fetch` would leave it on disk."""
    from geo_deep_learning.models.encoders.mix_transformer import get_encoder

    tmodel = get_encoder("mit_b0", in_channels=3, depth=5, weights=None)
    tmodel.eval()
    _randomize(tmodel, seed=7)
    out_dir.mkdir(parents=True, exist_ok=True)
    pth = out_dir / "mit_b0.pth"
    torch.save(tmodel.state_dict(), pth)
    return pth


def test_pretrained_closure_dry_run(tmp_path):
    """Orchestration dry run: skip-fetch over a present artifact converts
    and verifies it; an absent artifact is REPORTED missing, not an error
    (the networked-host run simply fills those in)."""
    weights = tmp_path / "weights"
    _mit_b0_fixture(weights)
    report = pretrained_closure.run(
        weights, names=["mit_b0", "resnet50"], skip_fetch=True, smoke=False
    )
    assert report["entries"]["mit_b0"]["status"] == "converted+verified"
    assert report["entries"]["mit_b0"]["family"] == "mit"
    assert report["entries"]["mit_b0"]["param_leaves"] > 50
    assert (weights / "mit_b0.msgpack").exists()
    assert report["entries"]["resnet50"]["status"].startswith("missing")


@pytest.mark.slow
def test_pretrained_closure_smoke_finetune(tmp_path):
    """Family smoke: 1-epoch Trainer.fit warm-started from the converted
    artifact through the torch_weights path (the reference's core
    pretrained-encoder fine-tuning workflow)."""
    weights = tmp_path / "weights"
    _mit_b0_fixture(weights)
    report = pretrained_closure.run(
        weights,
        names=["mit_b0"],
        skip_fetch=True,
        smoke=True,
        smoke_size=32,
        work_dir=tmp_path / "work",
    )
    assert report["smoke"]["mit"]["status"] == "ok"
    assert np.isfinite(report["smoke"]["mit"]["val_loss"])
    # families whose artifact is absent are skipped, not fatal
    assert report["smoke"]["resnet"]["status"].startswith("skipped")
    assert report["smoke"]["dofa"]["status"].startswith("skipped")
