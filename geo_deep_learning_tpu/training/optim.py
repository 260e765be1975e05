"""Optimizers and LR schedules (optax).

Covers the reference's optimizer surface:

- ``torch.optim.Adam``/``AdamW``/``SGD`` by config name
  (reference configs/*.yaml ``optimizer.class_path``)
- ``ReduceLROnPlateau`` — inherently host-side control flow (reference
  configs use it with interval=epoch, monitor=val_loss); implemented as a
  :class:`PlateauController` that rescales the learning rate injected via
  ``optax.inject_hyperparams``.
- ``OneCycleLR`` — ``optax.cosine_onecycle_schedule`` (reference
  tasks_with_models/segmentation_unetplus.py:146-205 special-cases
  total-step computation; our trainer passes total_steps explicitly).
- ``LinearWarmupCosineAnnealingLR`` and ``linear_warmup_decay`` —
  capability parity with reference tools/schedulers/lr_scheduler.py:13-198.
- Layer freezing — the reference mutates ``requires_grad``
  (models/segmentation/base.py:24-31); in JAX freezing is an optimizer
  mask: frozen subtrees get ``optax.set_to_zero``.
- Gradient clipping — reference Lightning ``gradient_clip_val: 1.0``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import optax

logger = logging.getLogger(__name__)

def _betas(kw: dict) -> tuple[float, float]:
    """torch configs say ``betas: [b1, b2]``; accept b1/b2 too."""
    if "betas" in kw:
        b1, b2 = kw["betas"]
        return float(b1), float(b2)
    return float(kw.get("b1", 0.9)), float(kw.get("b2", 0.999))


def _scale_by_amsgrad_torch(b1: float, b2: float, eps: float):
    """torch-exact AMSGrad (torch/optim/adam.py): the running max is kept
    over the RAW second moment and bias-corrected afterwards; optax's
    ``scale_by_amsgrad`` maxes the bias-corrected values instead, which
    diverges from torch after step 1."""
    import jax.numpy as jnp

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return {"mu": zeros(), "nu": zeros(), "nu_max": zeros(),
                "count": jnp.zeros([], jnp.int32)}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], grads)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max,
        )
        return updates, {"mu": mu, "nu": nu, "nu_max": nu_max, "count": count}

    return optax.GradientTransformation(init, update)


def _make_adam(lr, kw: dict) -> optax.GradientTransformation:
    """``torch.optim.Adam``: ``weight_decay`` is L2 — added to the raw
    gradient BEFORE the moment updates (torch/optim/adam.py), i.e.
    ``add_decayed_weights`` in front of the adam core, unlike AdamW's
    decoupled decay."""
    b1, b2 = _betas(kw)
    eps = float(kw.get("eps", 1e-8))
    if kw.get("amsgrad", False):
        core = optax.chain(
            _scale_by_amsgrad_torch(b1, b2, eps),
            optax.scale_by_learning_rate(lr),
        )
    else:
        core = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    wd = float(kw.get("weight_decay", 0.0))
    if wd:
        return optax.chain(optax.add_decayed_weights(wd), core)
    return core


def _make_adamw(lr, kw: dict) -> optax.GradientTransformation:
    """``torch.optim.AdamW``: decoupled decay (torch default 0.01)."""
    b1, b2 = _betas(kw)
    eps = float(kw.get("eps", 1e-8))
    wd = float(kw.get("weight_decay", 0.01))
    if kw.get("amsgrad", False):
        # compose decoupled decay around the torch-exact amsgrad core,
        # the way optax.adamw itself is composed
        return optax.chain(
            _scale_by_amsgrad_torch(b1, b2, eps),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lr),
        )
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)


def _make_sgd(lr, kw: dict) -> optax.GradientTransformation:
    """``torch.optim.SGD``: ``weight_decay`` is L2 (pre-momentum);
    dampening has no optax counterpart and is refused rather than
    silently dropped."""
    if float(kw.get("dampening", 0.0)) != 0.0:
        msg = "SGD dampening != 0 is not supported (no optax analog)"
        raise NotImplementedError(msg)
    core = optax.sgd(
        lr,
        momentum=float(kw.get("momentum", 0.0)) or None,
        nesterov=bool(kw.get("nesterov", False)),
    )
    wd = float(kw.get("weight_decay", 0.0))
    if wd:
        return optax.chain(optax.add_decayed_weights(wd), core)
    return core


_OPTIMIZERS = {
    "adam": _make_adam,
    "adamw": _make_adamw,
    "sgd": _make_sgd,
}

# every kwarg each factory understands; anything else is warned about
# instead of silently dropped (torch raises TypeError on unknown args)
_KNOWN_KW = {
    "adam": {"betas", "b1", "b2", "eps", "weight_decay", "amsgrad"},
    "adamw": {"betas", "b1", "b2", "eps", "weight_decay", "amsgrad"},
    "sgd": {"momentum", "nesterov", "weight_decay", "dampening"},
}

# torch class_path aliases so reference configs translate verbatim
_ALIASES = {
    "torch.optim.Adam": "adam",
    "torch.optim.AdamW": "adamw",
    "torch.optim.SGD": "sgd",
}


def linear_warmup_cosine_annealing(
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
    base_lr: float = 1e-3,
) -> optax.Schedule:
    """Reference ``LinearWarmupCosineAnnealingLR`` (tools/schedulers/
    lr_scheduler.py:13-163), expressed in steps of its ``interval`` unit.

    Matches the reference's closed form exactly (golden-tested): the
    warmup ramp divides by ``warmup_epochs - 1`` — base_lr is REACHED at
    epoch warmup_epochs - 1 and held through epoch warmup_epochs — and
    the cosine phase spans ``max_epochs - warmup_epochs`` epochs down to
    ``eta_min``. (optax's warmup_cosine_decay_schedule divides the ramp
    by warmup_steps instead, which runs ~one epoch behind.)
    """
    ramp = optax.linear_schedule(
        init_value=warmup_start_lr,
        end_value=base_lr,
        transition_steps=max(warmup_epochs - 1, 1),
    )
    span = max(max_epochs - warmup_epochs, 1)
    if base_lr == 0.0:
        cosine = optax.constant_schedule(0.0)
    else:
        cosine = optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=span, alpha=eta_min / base_lr
        )
    return optax.join_schedules([ramp, cosine], [warmup_epochs])


def linear_warmup_decay(
    warmup_steps: int,
    total_steps: int,
    base_lr: float,
    cosine: bool = True,
    linear: bool = False,
) -> optax.Schedule:
    """Reference ``linear_warmup_decay`` lambda factory
    (tools/schedulers/lr_scheduler.py:167-198)."""
    if cosine and linear:
        msg = "cosine and linear decay are mutually exclusive"
        raise ValueError(msg)
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    rest = total_steps - warmup_steps
    if cosine:
        decay = optax.cosine_decay_schedule(base_lr, max(rest, 1))
    elif linear:
        decay = optax.linear_schedule(base_lr, 0.0, max(rest, 1))
    else:
        decay = optax.constant_schedule(base_lr)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def one_cycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """torch ``OneCycleLR`` (cos annealing strategy), golden-matched.

    Implemented closed-form rather than via optax's
    ``cosine_onecycle_schedule`` because torch anneals phase 1 over
    ``pct_start * total_steps - 1`` steps and phase 2 over the remaining
    steps to ``total_steps - 1`` (both inclusive endpoints), while optax
    uses ``pct_start * total_steps`` — a visible off-by-one in short
    cycles. ``anneal_cos(a, b, pct) = b + (a - b)/2 * (1 + cos(pi*pct))``.
    Past the cycle end the final LR is held (torch raises instead; the
    reference's buffer-steps fallback deliberately overestimates totals
    so the tail is reachable, segmentation_dofa.py:171-180).
    """
    import jax.numpy as jnp

    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    s1 = float(pct_start * total_steps) - 1.0
    s2 = float(total_steps) - 1.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(s1, 1e-8), 0.0, 1.0)
        up = max_lr + (initial_lr - max_lr) / 2.0 * (
            1.0 + jnp.cos(jnp.pi * pct_up)
        )
        pct_dn = jnp.clip(
            (step - s1) / jnp.maximum(s2 - s1, 1e-8), 0.0, 1.0
        )
        dn = min_lr + (max_lr - min_lr) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct_dn))
        return jnp.where(step <= s1, up, dn)

    return schedule


@dataclass
class PlateauController:
    """Host-side ReduceLROnPlateau (torch semantics).

    Call :meth:`update` once per epoch with the monitored metric; it
    returns the current LR *scale* in [min_lr/base_lr, 1]. The trainer
    writes ``base_lr * scale`` into the optimizer's injected hyperparams.
    """

    mode: str = "min"
    factor: float = 0.1
    patience: int = 10
    cooldown: int = 0
    min_lr: float = 0.0
    threshold: float = 1e-4
    threshold_mode: str = "rel"  # torch: 'rel' | 'abs'
    base_lr: float = 1e-3
    eps: float = 1e-8  # torch: skip reductions smaller than this
    scale: float = field(default=1.0, init=False)
    _best: float | None = field(default=None, init=False)
    _bad_epochs: int = field(default=0, init=False)
    _cooldown_left: int = field(default=0, init=False)

    def _is_better(self, value: float) -> bool:
        # exact torch ReduceLROnPlateau.is_better over the
        # (mode, threshold_mode) grid
        if self._best is None:
            return True
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return value < self._best * (1.0 - self.threshold)
            return value < self._best - self.threshold
        if self.threshold_mode == "rel":
            return value > self._best * (1.0 + self.threshold)
        return value > self._best + self.threshold

    def update(self, value: float) -> float:
        # exact torch ReduceLROnPlateau.step() flow (golden-tested in
        # tests/test_golden_schedulers_samplers.py): cooldown decrements
        # every epoch — improving or not — and sub-eps reductions are
        # skipped (but still reset patience/cooldown)
        if self._is_better(value):
            self._best = value
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
        if self._cooldown_left > 0:
            self._cooldown_left -= 1
            self._bad_epochs = 0
        if self._bad_epochs > self.patience:
            old_lr = self.base_lr * self.scale
            new_lr = max(old_lr * self.factor, self.min_lr)
            if old_lr - new_lr > self.eps:
                self.scale = new_lr / self.base_lr
                logger.info("ReduceLROnPlateau: lr -> %g", new_lr)
            self._cooldown_left = self.cooldown
            self._bad_epochs = 0
        return self.scale

    @property
    def lr(self) -> float:
        return self.base_lr * self.scale


def freeze_mask(params: Any, patterns: list[str]) -> Any:
    """Label tree: 'frozen' where the flattened path matches any pattern.

    Path format: '/'-joined module names, e.g. ``encoder/block0/attn/q``.
    """

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> str:
        keys = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        return "/".join(str(k) for k in keys)

    labels = {}
    for path, _ in flat:
        name = label_of(path)
        labels[name] = "frozen" if any(s in name for s in patterns) else "train"
    # rebuild a tree of labels matching params' structure
    treedef = jax.tree_util.tree_structure(params)
    label_leaves = [labels[label_of(p)] for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, label_leaves)


def build_optimizer(
    params: Any,
    optimizer: str = "adam",
    lr: float = 1e-4,
    schedule: Callable | None = None,
    plateau: PlateauController | None = None,
    grad_clip: float | None = None,
    freeze_patterns: list[str] | None = None,
    accumulate_steps: int = 1,
    **kwargs,
) -> optax.GradientTransformation:
    """Assemble the full gradient transformation.

    Exactly one of ``schedule`` (step-based) / ``plateau`` (epoch,
    metric-driven) / plain ``lr`` drives the learning rate.
    ``accumulate_steps > 1`` wraps the whole transform in
    ``optax.MultiSteps`` (the reference's Lightning
    ``accumulate_grad_batches``).
    """
    name = _ALIASES.get(optimizer, optimizer).lower()
    if name not in _OPTIMIZERS:
        msg = f"unknown optimizer {optimizer!r}; known: {sorted(_OPTIMIZERS)}"
        raise ValueError(msg)
    make = _OPTIMIZERS[name]
    unknown = set(kwargs) - _KNOWN_KW[name]
    if unknown:
        logger.warning(
            "optimizer %r: ignoring unrecognized init_args %s (known: %s)",
            name, sorted(unknown), sorted(_KNOWN_KW[name]),
        )

    if plateau is not None:
        plateau.base_lr = lr

        def core_fn(learning_rate):
            return make(learning_rate, kwargs)

        core = optax.inject_hyperparams(core_fn)(learning_rate=lr)
    elif schedule is not None:
        core = make(schedule, kwargs)
    else:
        core = make(lr, kwargs)

    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(core)
    tx = optax.chain(*parts) if len(parts) > 1 else core

    if freeze_patterns:
        labels = freeze_mask(params, freeze_patterns)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Write a new LR into an ``inject_hyperparams`` optimizer state
    (possibly nested under chain/multi_transform wrappers)."""

    import jax.numpy as jnp

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(state.hyperparams["learning_rate"]).dtype
            )
            return state._replace(hyperparams=hp)
        if hasattr(state, "inner_states"):  # multi_transform
            inner = {k: visit(v) for k, v in state.inner_states.items()}
            return state._replace(inner_states=inner)
        if hasattr(state, "inner_state"):  # masked / wrappers
            return state._replace(inner_state=visit(state.inner_state))
        if isinstance(state, tuple):  # chain state or plain tuple
            vals = [visit(s) for s in state]
            if hasattr(state, "_fields"):
                return type(state)(*vals)
            return tuple(vals)
        return state

    return visit(opt_state)
