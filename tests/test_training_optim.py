"""Optimizer/scheduler/freeze tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geo_deep_learning_tpu.training import optim


def _params():
    return {
        "encoder": {"conv": {"kernel": jnp.ones((3, 3))}},
        "head": {"dense": {"kernel": jnp.ones((3, 3))}},
    }


def test_plateau_controller_reduces_after_patience():
    pc = optim.PlateauController(patience=2, factor=0.5, base_lr=1.0, min_lr=0.1)
    pc.update(1.0)
    assert pc.scale == 1.0
    for _ in range(3):  # no improvement
        pc.update(1.0)
    assert pc.scale == 0.5
    # improvement resets patience
    pc.update(0.5)
    pc.update(0.5)
    assert pc.scale == 0.5
    # min_lr floor
    for _ in range(20):
        pc.update(0.5)
    assert pc.lr >= 0.1 - 1e-9


def test_plateau_cooldown():
    pc = optim.PlateauController(patience=0, cooldown=2, factor=0.5, base_lr=1.0)
    pc.update(1.0)
    pc.update(1.0)  # bad epoch > patience → reduce, start cooldown
    assert pc.scale == 0.5
    pc.update(1.0)  # cooldown
    pc.update(1.0)  # cooldown
    assert pc.scale == 0.5
    pc.update(1.0)  # bad again → reduce
    assert pc.scale == 0.25


def test_set_learning_rate_through_chain():
    params = _params()
    pc = optim.PlateauController(base_lr=1e-3)
    tx = optim.build_optimizer(params, "adam", lr=1e-3, plateau=pc, grad_clip=1.0)
    state = tx.init(params)
    new_state = optim.set_learning_rate(state, 5e-4)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, new_state, params)
    # adam on constant grads: update magnitude ≈ lr
    mag = float(jnp.abs(updates["head"]["dense"]["kernel"]).mean())
    np.testing.assert_allclose(mag, 5e-4, rtol=0.05)


def test_freeze_patterns_zero_updates():
    params = _params()
    tx = optim.build_optimizer(
        params, "adam", lr=1e-3, freeze_patterns=["encoder"]
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["dense"]["kernel"]).sum()) > 0.0


def test_schedules_shapes():
    s = optim.one_cycle(max_lr=1.0, total_steps=100)
    assert float(s(0)) < 0.1  # starts at max_lr/div_factor
    peak_idx = int(np.argmax([float(s(i)) for i in range(100)]))
    assert 25 <= peak_idx <= 35  # pct_start=0.3
    w = optim.linear_warmup_cosine_annealing(5, 50, base_lr=1.0)
    assert float(w(0)) == 0.0
    np.testing.assert_allclose(float(w(5)), 1.0, atol=1e-6)
    d = optim.linear_warmup_decay(10, 100, base_lr=2.0, cosine=True)
    np.testing.assert_allclose(float(d(10)), 2.0, atol=1e-6)
    assert float(d(99)) < 0.1
    with pytest.raises(ValueError):
        optim.linear_warmup_decay(1, 2, 1.0, cosine=True, linear=True)


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError, match="unknown optimizer"):
        optim.build_optimizer(_params(), "lion", lr=1e-3)


def test_torch_alias_names():
    tx = optim.build_optimizer(_params(), "torch.optim.AdamW", lr=1e-3)
    assert isinstance(tx, optax.GradientTransformation)


def test_gradient_accumulation():
    params = _params()
    tx = optim.build_optimizer(params, "sgd", lr=1.0, accumulate_steps=2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    u1, state = tx.update(grads, state, params)
    # first micro-batch: no update applied yet
    assert float(jnp.abs(u1["head"]["dense"]["kernel"]).sum()) == 0.0
    u2, state = tx.update(grads, state, params)
    # second: mean of the two grads applied (sgd lr=1 → update = -1)
    np.testing.assert_allclose(np.asarray(u2["head"]["dense"]["kernel"]), -1.0)


def test_build_schedule_epoch_units_converted_to_steps():
    """LinearWarmupCosineAnnealingLR configs are in EPOCHS (reference
    tools/schedulers/lr_scheduler.py:13 is stepped once per epoch by
    Lightning); the optax schedule advances per optimizer step, so the
    trainer must scale by steps_per_epoch."""
    from geo_deep_learning_tpu.training.loop import build_schedule

    cfg = {
        "name": "LinearWarmupCosineAnnealingLR",
        "warmup_epochs": 2,
        "max_epochs": 10,
        "eta_min": 0.0,
    }
    spe = 50
    schedule, plateau = build_schedule(cfg, 1e-3, total_steps=500, steps_per_epoch=spe)
    assert plateau is None
    # peak LR reached at end of warmup = 2 EPOCHS = 100 steps, not step 2
    assert float(schedule(2 * spe)) == pytest.approx(1e-3, rel=1e-6)
    assert float(schedule(2)) < 1e-3 * 0.05  # still warming up at step 2
    # cosine fully decayed at max_epochs * spe steps, not at step 10
    assert float(schedule(10 * spe)) == pytest.approx(0.0, abs=1e-9)
    assert float(schedule(10)) < 1e-3 * 0.11  # near start of warmup ramp


def test_build_schedule_plateau_and_onecycle():
    from geo_deep_learning_tpu.training.loop import build_schedule

    sched, plateau = build_schedule(
        {"name": "ReduceLROnPlateau", "factor": 0.5, "patience": 3},
        1e-2,
        None,
        None,
    )
    assert sched is None and plateau is not None
    assert plateau.factor == 0.5 and plateau.patience == 3

    sched, plateau = build_schedule(
        {"name": "OneCycleLR", "max_lr": 0.01}, 1e-3, 200, 20
    )
    assert plateau is None
    peak = max(float(sched(i)) for i in range(0, 200, 5))
    assert peak == pytest.approx(0.01, rel=1e-2)


def test_freeze_patterns_stop_gradient_in_step():
    """make_train_step(freeze_patterns=...): frozen subtree receives NO
    update (its backward is dead code), trainable parts still learn."""
    import numpy as np
    from flax import linen as nn

    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.models.base import SegmentationOutput
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (3, 3), padding="SAME", name="encoder")(x)
            h = nn.relu(h)
            return SegmentationOutput(
                out=nn.Conv(3, (1, 1), name="head")(h), aux=None
            )

    model = Tiny()
    task = SegmentationTask(model=model, loss=dice_loss, num_classes=3)
    batch = {
        "image": np.random.default_rng(0).normal(size=(4, 16, 16, 3)).astype(np.float32),
        "mask": np.random.default_rng(1).integers(0, 3, (4, 16, 16)).astype(np.int32),
    }
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, variables["params"])
    tx = optim.build_optimizer(variables["params"], optimizer="adam", lr=1e-2)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats={}, rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(
        task, PrecisionPolicy.create("32-true"), augment=None,
        freeze_patterns=["encoder"],
    )
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(new_state.params["encoder"]["kernel"]), params0["encoder"]["kernel"]
    )
    assert not np.array_equal(
        np.asarray(new_state.params["head"]["kernel"]), params0["head"]["kernel"]
    )


# ---------------------------------------------------------------------------
# torch-exact optimizer semantics: the reference configures optimizers via
# torch.optim class_path + init_args (configs/*.yaml); every arg a user can
# set there must either translate exactly or be loudly refused.
# ---------------------------------------------------------------------------

def _run_pair(name, lr, kw, torch_cls, torch_kw, steps=5):
    """Run `steps` updates of ours vs torch on identical params/grads."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(42)
    w0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(steps)]

    # torch side
    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch_cls([p], lr=lr, **torch_kw)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    torch_out = p.detach().numpy()

    # ours
    params = {"w": jnp.asarray(w0)}
    tx = optim.build_optimizer(params, optimizer=name, lr=lr, **kw)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    ours = np.asarray(params["w"])
    np.testing.assert_allclose(ours, torch_out, rtol=2e-5, atol=2e-6)


def test_adam_l2_weight_decay_matches_torch():
    # torch.optim.Adam weight_decay is L2 (pre-moment), not decoupled
    _run_pair(
        "adam", 1e-2,
        {"betas": [0.8, 0.95], "eps": 1e-6, "weight_decay": 0.1},
        pytest.importorskip("torch").optim.Adam,
        {"betas": (0.8, 0.95), "eps": 1e-6, "weight_decay": 0.1},
    )


def test_adamw_matches_torch():
    _run_pair(
        "torch.optim.AdamW", 3e-3,
        {"betas": [0.9, 0.98], "weight_decay": 0.05},
        pytest.importorskip("torch").optim.AdamW,
        {"betas": (0.9, 0.98), "weight_decay": 0.05},
    )


def test_sgd_momentum_weight_decay_nesterov_matches_torch():
    _run_pair(
        "sgd", 1e-2,
        {"momentum": 0.9, "weight_decay": 1e-3, "nesterov": True},
        pytest.importorskip("torch").optim.SGD,
        {"momentum": 0.9, "weight_decay": 1e-3, "nesterov": True},
    )


def test_adam_amsgrad_matches_torch():
    _run_pair(
        "adam", 1e-2,
        {"amsgrad": True},
        pytest.importorskip("torch").optim.Adam,
        {"amsgrad": True},
    )


def test_sgd_dampening_refused():
    with pytest.raises(NotImplementedError, match="dampening"):
        optim.build_optimizer({"w": jnp.zeros(3)}, optimizer="sgd",
                              lr=1e-2, dampening=0.5)


def test_unknown_init_args_warn(caplog):
    import logging
    with caplog.at_level(logging.WARNING):
        optim.build_optimizer({"w": jnp.zeros(3)}, optimizer="adam",
                              lr=1e-2, weigth_decay=0.1)  # typo'd on purpose
    assert any("weigth_decay" in r.message for r in caplog.records)


def test_adamw_amsgrad_matches_torch():
    _run_pair(
        "adamw", 1e-2,
        {"amsgrad": True, "weight_decay": 0.02},
        pytest.importorskip("torch").optim.AdamW,
        {"amsgrad": True, "weight_decay": 0.02},
    )
