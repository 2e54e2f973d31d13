"""Optimizer factory (reference ``LiDARGen/losses/__init__.py:3-13``)."""

from __future__ import annotations

import optax

from ..config import cfg_get


def get_optimizer(config):
    name = cfg_get(config, "optim.optimizer", "Adam")
    lr = cfg_get(config, "optim.lr", 1e-4)
    weight_decay = cfg_get(config, "optim.weight_decay", 0.0)
    beta1 = cfg_get(config, "optim.beta1", 0.9)
    eps = cfg_get(config, "optim.eps", 1e-8)
    if name == "Adam":
        if weight_decay and weight_decay > 0:
            return optax.adamw(lr, b1=beta1, eps=eps, weight_decay=weight_decay)
        return optax.adam(lr, b1=beta1, eps=eps)
    if name == "RMSProp":
        return optax.rmsprop(lr, decay=0.9, eps=eps)
    if name == "SGD":
        return optax.sgd(lr, momentum=0.9)
    raise NotImplementedError(f"Optimizer {name} not understood.")
