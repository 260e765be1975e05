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
