"""Train state: params + batch stats + SGD-Nesterov optimizer.

Matches the reference recipe: SGD(lr=1.0 via injected schedule,
momentum=0.9, nesterov, weight_decay) with a ReduceLROnPlateau controller
driving the injected learning rate (reference:
train_rtpose_light3d_kdh3d.py:313-319).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def sgd_nesterov(learning_rate=1.0, momentum=0.9, weight_decay=0.0):
    """SGD + Nesterov momentum + (coupled) weight decay, torch-style.

    `learning_rate` may be a float or an optax schedule; use
    optax.inject_hyperparams-compatible plain float when driven by
    ReduceLROnPlateau.
    """
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=True))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def adam_l2(learning_rate=3.5e-4, weight_decay=0.0):
    """torch.optim.Adam semantics: L2 weight decay folded into the gradient
    BEFORE the Adam moments (not AdamW), as the A2J recipe uses
    (reference: train_a2j_mpaug_new.py:443 Adam(lr=3.5e-4, wd=1e-4))."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_input, learning_rate=1.0, momentum=0.9,
                       weight_decay=0.0, tx=None, optimizer: str = "sgd"):
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if tx is None:
        if optimizer == "sgd":
            tx = optax.inject_hyperparams(
                sgd_nesterov, static_args=("momentum", "weight_decay")
            )(learning_rate=learning_rate, momentum=momentum, weight_decay=weight_decay)
        elif optimizer == "adam":
            tx = optax.inject_hyperparams(adam_l2, static_args=("weight_decay",))(
                learning_rate=learning_rate, weight_decay=weight_decay
            )
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning rate (plateau scheduler hook)."""
    opt_state = state.opt_state
    new_hp = dict(opt_state.hyperparams)
    new_hp["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    new_opt = opt_state._replace(hyperparams=new_hp)
    return state.replace(opt_state=new_opt)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])
