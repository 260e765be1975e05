"""Golden parity vs the reference's OWN scheduler and sampler code.

Imports ``/root/reference/geo_deep_learning/tools/schedulers/
lr_scheduler.py`` and ``samplers/round_robin_sampler.py`` directly
(torch + numpy only — no stubs needed). Scheduler values must match
exactly; the round-robin samplers are compared on their SEMANTIC
contract (single-sensor batches, balanced coverage) because the two
implementations intentionally differ in weight-integerization details
(the reference's sampler is dead code, SURVEY.md §2.1, kept here as a
library capability).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

_REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    ref_pkg = str(Path(_REFERENCE) / "geo_deep_learning")
    sys.path.insert(0, ref_pkg)
    try:
        from samplers.round_robin_sampler import (  # noqa: PLC0415
            RoundRobinSampler as RefSampler,
        )
        from tools.schedulers.lr_scheduler import (  # noqa: PLC0415
            LinearWarmupCosineAnnealingLR as RefSched,
        )
        from tools.schedulers.lr_scheduler import (  # noqa: PLC0415
            linear_warmup_decay as ref_lwd,
        )
    finally:
        sys.path.remove(ref_pkg)
    return torch, RefSched, ref_lwd, RefSampler


@pytest.mark.parametrize(
    ("warmup", "maxe", "start_lr", "eta_min", "base_lr"),
    [(3, 20, 0.0, 0.0, 1e-3), (5, 40, 1e-5, 1e-6, 3e-4), (1, 10, 0.0, 1e-5, 1e-2)],
)
def test_warmup_cosine_matches_reference(
    ref_modules, warmup, maxe, start_lr, eta_min, base_lr
):
    """Our optax schedule == the reference scheduler, every epoch
    (reference tools/schedulers/lr_scheduler.py:78-163)."""
    torch, RefSched, _, _ = ref_modules
    from geo_deep_learning_tpu.training.optim import (
        linear_warmup_cosine_annealing,
    )

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    ref = RefSched(
        opt,
        warmup_epochs=warmup,
        max_epochs=maxe,
        warmup_start_lr=start_lr,
        eta_min=eta_min,
    )
    ours = linear_warmup_cosine_annealing(
        warmup_epochs=warmup,
        max_epochs=maxe,
        warmup_start_lr=start_lr,
        eta_min=eta_min,
        base_lr=base_lr,
    )
    for epoch in range(maxe):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(ours(epoch))
        # optax computes in f32; the reference in f64
        assert got == pytest.approx(ref_lr, rel=1e-4, abs=1e-7), (epoch, got, ref_lr)
        opt.step()
        ref.step()


@pytest.mark.parametrize("mode", ["cosine", "linear", "none"])
def test_linear_warmup_decay_matches_reference(ref_modules, mode):
    """Our multiplier schedule == the reference's lambda factory at every
    probed step (reference tools/schedulers/lr_scheduler.py:167-198)."""
    _, _, ref_lwd, _ = ref_modules
    from geo_deep_learning_tpu.training.optim import linear_warmup_decay

    base_lr = 2e-3
    kwargs = {"cosine": mode == "cosine", "linear": mode == "linear"}
    ref_fn = ref_lwd(10, 100, **kwargs)
    ours = linear_warmup_decay(10, 100, base_lr=base_lr, **kwargs)
    for step in [0, 1, 5, 9, 10, 11, 50, 99, 100]:
        assert float(ours(step)) == pytest.approx(
            base_lr * ref_fn(step), rel=1e-4, abs=1e-7
        ), step


class _FakeDataset:
    def __init__(self, n):
        self._n = n

    def __len__(self):
        return self._n


def _sensor_of(idx: int, sizes: dict[str, int]) -> str:
    off = 0
    for name, n in sizes.items():
        if idx < off + n:
            return name
        off += n
    raise AssertionError(idx)


def test_round_robin_semantics_match_reference(ref_modules):
    """Both samplers emit single-sensor batches, cycle sensors, and
    balance small sensors up by replication under equal weighting."""
    _, _, _, RefSampler = ref_modules
    from geo_deep_learning_tpu.data.samplers import RoundRobinSampler

    sizes = {"a": 36, "b": 12, "c": 24}
    bs = 4
    ref = RefSampler(
        {k: _FakeDataset(n) for k, n in sizes.items()},
        batch_size=bs,
        sensor_weighting="equal",
    )
    ours = RoundRobinSampler(sizes, batch_size=bs, weights="equal", seed=0)

    def analyze(batches):
        counts: dict[str, int] = {}
        for b in batches:
            sensors = {_sensor_of(int(i), sizes) for i in b}
            assert len(sensors) == 1, "mixed-sensor batch"
            s = next(iter(sensors))
            counts[s] = counts.get(s, 0) + 1
        return counts

    ref_counts = analyze(list(iter(ref)))
    # ours yields (sensor_name, LOCAL indices) — count by name directly
    our_counts: dict[str, int] = {}
    for name, _local in ours:
        our_counts[name] = our_counts.get(name, 0) + 1
    # equal weighting + balancing: every sensor gets the same number of
    # batches (max size / batch size) in BOTH implementations
    expected = max(sizes.values()) // bs
    assert set(ref_counts.values()) == {expected}
    assert set(our_counts.values()) == {expected}

    # our batches must index within each sensor's local range
    for name, local in ours:
        assert all(0 <= i < sizes[name] for i in local)


@pytest.mark.parametrize(
    "total,max_lr,pct_start,div,final_div",
    [
        (100, 1e-3, 0.3, 25.0, 1e4),       # torch defaults
        (250, 5e-4, 0.1, 10.0, 100.0),     # custom shape
        (40, 1e-2, 0.5, 2.0, 50.0),
    ],
)
def test_one_cycle_matches_torch(total, max_lr, pct_start, div, final_div):
    """Our optax one_cycle == torch.optim.lr_scheduler.OneCycleLR over a
    full cycle (VERDICT r2 #7: pct_start/div_factor/final_div_factor were
    previously dropped on the config path and never golden-tested)."""
    torch = pytest.importorskip("torch")
    from geo_deep_learning_tpu.training.optim import one_cycle

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=max_lr)
    ref = torch.optim.lr_scheduler.OneCycleLR(
        opt,
        max_lr=max_lr,
        total_steps=total,
        pct_start=pct_start,
        div_factor=div,
        final_div_factor=final_div,
        anneal_strategy="cos",
    )
    ours = one_cycle(
        max_lr=max_lr,
        total_steps=total,
        pct_start=pct_start,
        div_factor=div,
        final_div_factor=final_div,
    )
    for step in range(total):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(ours(step))
        assert got == pytest.approx(ref_lr, rel=2e-3, abs=1e-8), (
            step, got, ref_lr,
        )
        opt.step()
        ref.step()


def test_build_schedule_forwards_onecycle_shape():
    """The config path forwards pct_start/div_factor/final_div_factor
    (reference YAML passes the whole init_args dict through)."""
    from geo_deep_learning_tpu.training.loop import build_schedule

    sched, plateau = build_schedule(
        {
            "name": "OneCycleLR",
            "max_lr": 1e-3,
            "pct_start": 0.5,
            "div_factor": 10.0,
            "final_div_factor": 100.0,
        },
        lr=1e-3,
        total_steps=100,
        steps_per_epoch=10,
    )
    assert plateau is None
    import numpy as np

    # pct_start=0.5 -> peak at step 49 (torch anneals phase 1 over
    # pct_start*total - 1 steps); default 0.3 would peak at 29
    lrs = [float(sched(s)) for s in range(100)]
    assert np.argmax(lrs) == 49
    assert lrs[0] == pytest.approx(1e-3 / 10.0, rel=1e-5)


def test_build_schedule_onecycle_streaming_fallback():
    """Streaming loaders (no sized __len__): total steps come from the
    datamodule's epoch_size, mirroring segmentation_dofa.py:163-180."""
    import math

    from geo_deep_learning_tpu.training.loop import build_schedule

    ctx = {"epoch_size": 130, "batch_size": 8, "accumulate": 1, "max_epochs": 3}
    sched, _ = build_schedule(
        {"name": "OneCycleLR", "max_lr": 1e-3},
        lr=1e-3,
        total_steps=None,
        steps_per_epoch=None,
        onecycle_ctx=ctx,
    )
    spe = math.ceil(130 / 8)
    expected_total = (spe + spe) * 3  # buffer_steps == spe at accumulate=1
    # past the end the schedule holds its final value
    end = float(sched(expected_total))
    later = float(sched(expected_total + 50))
    assert end == pytest.approx(later)
    # and the peak sits at pct_start * expected_total (default 0.3)
    import numpy as np

    lrs = [float(sched(s)) for s in range(expected_total)]
    assert np.argmax(lrs) == pytest.approx(0.3 * expected_total - 1, abs=1.5)


@pytest.mark.parametrize(
    "mode,factor,patience,cooldown,threshold,min_lr,threshold_mode",
    [
        ("min", 0.1, 2, 0, 1e-4, 0.0, "rel"),
        ("min", 0.5, 1, 2, 1e-4, 0.0, "rel"),  # cooldown interacts with improving epochs
        ("min", 0.5, 0, 3, 1e-2, 1e-5, "rel"),
        ("max", 0.3, 2, 1, 1e-3, 0.0, "rel"),
        ("min", 0.1, 10, 0, 1e-4, 0.0, "rel"),  # reference ReduceLROnPlateau defaults
        ("min", 0.1, 1, 0, 0.15, 0.0, "rel"),   # coarse rel threshold (r4 evidence fit)
        ("min", 0.5, 2, 0, 0.02, 0.0, "abs"),   # torch threshold_mode='abs'
        ("max", 0.3, 1, 1, 0.05, 0.0, "abs"),
    ],
)
def test_plateau_controller_matches_torch(
    mode, factor, patience, cooldown, threshold, min_lr, threshold_mode
):
    """PlateauController vs torch.optim.lr_scheduler.ReduceLROnPlateau on
    randomized metric sequences: the LR trajectory must match step for step
    (reference unetplus config trains with ReduceLROnPlateau,
    /root/reference/configs/unetplus_config_RGB.yaml)."""
    import torch

    from geo_deep_learning_tpu.training.optim import PlateauController

    base_lr = 1e-3
    rng = np.random.default_rng(hash((mode, patience, cooldown)) % 2**32)
    # noisy plateauing metric: improvements early, flat later + noise spikes
    seq = np.concatenate(
        [
            1.0 - 0.1 * np.arange(5),
            0.5 + 0.01 * rng.standard_normal(25),
        ]
    )
    if mode == "max":
        seq = -seq

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode=mode, factor=factor, patience=patience,
        cooldown=cooldown, threshold=threshold, min_lr=min_lr,
        threshold_mode=threshold_mode,
    )
    ours = PlateauController(
        mode=mode, factor=factor, patience=patience, cooldown=cooldown,
        min_lr=min_lr, threshold=threshold, base_lr=base_lr,
        threshold_mode=threshold_mode,
    )
    for i, v in enumerate(seq):
        ref.step(float(v))
        ours.update(float(v))
        assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9), (
            f"step {i}: ours={ours.lr} torch={opt.param_groups[0]['lr']}"
        )
