"""Tools: ScriptModel wrapper, trackers, schedulers alias, visualization."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.tools.script_model import ScriptModel
from geo_deep_learning_tpu.tools.tracking import FileTracker, Tracker, create_tracker


def test_script_model_save_load(tmp_path):
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    model = UnetPlusPlus(
        encoder_name="resnet18", num_classes=2, decoder_channels=(8, 8, 8, 8, 8)
    )
    x = np.random.default_rng(0).uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x) / 255.0, train=False)
    sm = ScriptModel(
        model.apply, variables, (1, 32, 32, 3),
        mean=[0.4] * 3, std=[0.2] * 3, num_classes=2,
    )
    probs = np.asarray(sm(jnp.asarray(x)))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    path = sm.save(str(tmp_path / "m.shlo"))
    loaded = ScriptModel.load(path)
    np.testing.assert_allclose(np.asarray(loaded(x)), probs, atol=1e-5)


def test_file_tracker_roundtrip(tmp_path):
    t = FileTracker(tmp_path, "run")
    t.log_params({"model": {"encoder": "mit_b0"}, "lr": 1e-4})
    t.log_metrics({"train_loss": 0.5}, step=1)
    t.log_metrics({"train_loss": 0.4, "val_loss": 0.6}, step=2)
    t.log_text("a: 1\n", "config/run.yaml")
    t.finish()
    records = [
        json.loads(line)
        for line in (t.directory / "metrics.jsonl").read_text().splitlines()
    ]
    assert records[1]["val_loss"] == 0.6
    assert (t.directory / "params.json").exists()
    assert (t.directory / "artifacts" / "config" / "run.yaml").exists()


def test_create_tracker_fallback(tmp_path):
    # mlflow not installed here → auto backend falls back to FileTracker
    t = create_tracker("auto", directory=tmp_path)
    assert isinstance(t, (FileTracker, Tracker))
    t2 = create_tracker("none")
    assert type(t2) is Tracker


def test_visualization_figure(tmp_path):
    from geo_deep_learning_tpu.tools.visualization import visualize_prediction

    img = np.random.default_rng(0).normal(size=(16, 16, 4)).astype(np.float32)
    mask = np.zeros((16, 16), np.int32)
    pred = np.ones((16, 16), np.int32)
    fig = visualize_prediction(
        img, mask, pred,
        mean=np.array([0.4] * 4), std=np.array([0.2] * 4),
        class_colors=["#000000", "#FF0000"], num_classes=2,
        save_path=str(tmp_path / "fig.png"),
    )
    assert (tmp_path / "fig.png").stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)
