"""Train state: params + BN batch stats + AMSGrad optimizer.

The reference optimizes with ``optim.Adam(lr, amsgrad=True)``
(``pytorch/main_strong.py:223-224``); the optax equivalent is
``optax.amsgrad`` with torch-default betas/eps.
"""

from __future__ import annotations

from typing import Any

import optax
from flax.training import train_state


class SedTrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    return optax.amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(model, rng, example_input, learning_rate: float = 1e-3,
                       variables: dict | None = None) -> SedTrainState:
    """Initialize (or adopt) variables and build the train state."""
    if variables is None:
        variables = model.init({'params': rng}, example_input, train=False)
    return SedTrainState.create(
        apply_fn=model.apply,
        params=variables['params'],
        batch_stats=variables.get('batch_stats'),
        tx=make_optimizer(learning_rate))
