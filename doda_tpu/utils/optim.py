"""Optimizer factory and LR schedules (optax).

Mirrors the reference surface: SGD(momentum, weight_decay) / Adam / AdamW
selected by ``OPTIMIZATION.optim`` (ref: util/common_utils.py:196-215) and
step / poly / cos schedules applied per iteration
(ref: util/common_utils.py:154-193). Schedules are pure functions of the
global step so they can live inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def step_lr(base_lr, epoch, step_epoch, multiplier=0.1, clip=1e-6):
    """Decay by ``multiplier`` every ``step_epoch`` epochs
    (ref: util/common_utils.py:154-158)."""
    return jnp.maximum(base_lr * multiplier ** (epoch // step_epoch), clip)


def poly_lr(base_lr, curr_iter, max_iter, power=0.9):
    """(ref: util/common_utils.py:161-165)"""
    frac = jnp.clip(curr_iter / max_iter, 0.0, 1.0)
    return base_lr * (1.0 - frac) ** power


def cos_lr(base_lr, curr_iter, max_iter, warm_iter=0, hold_base_iter=0):
    """(ref: util/common_utils.py:168-172)"""
    t = (curr_iter - warm_iter - hold_base_iter) / (
        max_iter - warm_iter - hold_base_iter)
    return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * t))


def make_lr_fn(optim_cfg, total_epochs, iters_per_epoch):
    """lr(epoch, it) matching ref ``adjust_lr``
    (util/common_utils.py:175-193): step uses (epoch - 1) // step_epoch;
    poly/cos use epoch * iters + it + 1."""
    decay = optim_cfg.lr_decay
    base = optim_cfg.base_lr
    if decay == 'step':
        return lambda epoch, it: step_lr(
            base, epoch - 1, optim_cfg.step_epoch,
            optim_cfg.get('multiplier', 0.1))
    max_iter = total_epochs * iters_per_epoch
    if decay == 'poly':
        return lambda epoch, it: poly_lr(
            base, epoch * iters_per_epoch + it + 1, max_iter)
    if decay == 'cos':
        return lambda epoch, it: cos_lr(
            base, epoch * iters_per_epoch + it + 1, max_iter)
    raise NotImplementedError(decay)


def build_optimizer(optim_cfg):
    """Returns an optax transform whose lr is injected via
    ``optax.inject_hyperparams`` so schedules can update it per step."""
    kind = optim_cfg.get('optim', 'sgd')
    wd = optim_cfg.get('weight_decay', 0.0)
    if kind == 'sgd':
        def make(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.sgd(learning_rate,
                                   momentum=optim_cfg.get('momentum', 0.9)))
            return optax.chain(*parts)
    elif kind == 'adam':
        def make(learning_rate):
            return optax.adam(learning_rate)
    elif kind == 'adamw':
        def make(learning_rate):
            return optax.adamw(learning_rate)
    else:
        raise NotImplementedError(kind)
    return optax.inject_hyperparams(make)(
        learning_rate=optim_cfg.base_lr)
