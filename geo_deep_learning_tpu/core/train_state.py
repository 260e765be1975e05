"""Train state: the single PyTree that flows through jitted steps.

Functional replacement for the reference's stateful LightningModule
(reference: tasks_with_models/*.py own params, optimizer, and BN buffers
implicitly via torch modules). Here everything mutable is an explicit
field so the whole state can be donated to the jitted step, sharded over
the mesh, and checkpointed as one Orbax PyTree.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Params + optimizer state + BN batch stats + RNG + step counter.

    ``apply_fn``/``tx`` are static (not traced); everything else is a
    PyTree leaf that lives on device.
    """

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    batch_stats: Any  # {} for BN-free models (SegFormer/DOFA)
    rng: jax.Array  # per-step augmentation/dropout key
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any, **updates) -> "TrainState":
        grad_updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, grad_updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **updates,
        )

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None, rng=None) -> "TrainState":
        import jax.numpy as jnp

        if isinstance(params, FrozenDict):
            params = params.unfreeze()
        if isinstance(batch_stats, FrozenDict):
            batch_stats = batch_stats.unfreeze()
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats if batch_stats is not None else {},
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            apply_fn=apply_fn,
            tx=tx,
        )
