"""Exponential moving average of a parameter pytree.

Functional equivalent of the reference's ``EMAHelper`` (models/ema.py:4-47):
``shadow = mu * shadow + (1 - mu) * param`` after every optimizer step, with
the EMA params usable as a drop-in parameter tree for sampling/eval.
"""

from __future__ import annotations

import jax


def ema_init(params):
    # materialise DISTINCT buffers (not aliases of the params): the train
    # steps donate the whole state, and donation rejects the same buffer
    # appearing twice (params + ema_params)
    return jax.tree.map(lambda p: jax.numpy.array(p, copy=True), params)


def ema_update(shadow, params, mu: float = 0.999):
    return jax.tree.map(lambda s, p: mu * s + (1.0 - mu) * p, shadow, params)
