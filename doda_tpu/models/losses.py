"""Segmentation losses: masked cross-entropy and Lovász-softmax.

Reference selects between ``nn.CrossEntropyLoss(ignore_index)`` and a
Lovász-softmax surrogate via ``OPTIMIZATION.loss``
(ref: model/unet.py:107-113, util/loss_utils.py:9-15,
util/lovasz_loss.py:129-173). Both are reimplemented with static shapes:
ignored/padded points stay in the arrays and are neutralized by masking —
for Lovász, invalid entries get error -1 so a descending sort pushes them
past every valid entry where their ReLU'd error contributes zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  ignore_label: int = 255,
                  sample_weight: jax.Array | None = None):
    """Mean CE over non-ignored points.

    logits (N, C) f32, labels (N,) int32. Padded points must carry
    ``ignore_label``. With ``sample_weight`` given, reduces as
    sum(w * ce) / (sum(w) + 1e-9) matching the reference's weighted path
    (ref: model/unet.py:169-172).
    Returns (loss, valid_count).
    """
    n_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe = jnp.clip(labels, 0, n_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if sample_weight is not None:
        w = jnp.where(valid, sample_weight, 0.0)
        return nll @ w / (w.sum() + 1e-9), valid.sum()
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count, valid.sum()


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors
    (ref: util/lovasz_loss.py:14-26)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-9)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(logits: jax.Array, labels: jax.Array,
                   ignore_label: int = 255):
    """Multi-class Lovász-softmax over 'present' classes
    (ref: util/lovasz_loss.py:129-173 with classes='present';
    entry point lovasz_softmax_with_logit, util/loss_utils.py:9-15)."""
    n_classes = logits.shape[-1]
    valid = labels != ignore_label
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def class_loss(c):
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, c])
        errors = jnp.where(valid, errors, -1.0)  # sort invalid last
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        grad = _lovasz_grad(fg[order])
        loss_c = jnp.maximum(errors_sorted, 0.0) @ grad
        present = fg.sum() > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(n_classes))
    p = present.astype(jnp.float32)
    return (losses * p).sum() / jnp.maximum(p.sum(), 1.0)


def soft_cross_entropy(logits: jax.Array, soft_labels: jax.Array,
                       valid: jax.Array | None = None):
    """CE against soft target distributions (the SOFT_LABEL branch,
    ref: model/unet.py:174-194). soft_labels (N, C) rows sum to 1;
    rows with top1 confidence == 1 are effectively hard labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_point = -(soft_labels * logp).sum(-1)
    if valid is None:
        valid = soft_labels.sum(-1) > 0
    per_point = jnp.where(valid, per_point, 0.0)
    return per_point.sum() / jnp.maximum(valid.sum(), 1)


def soft_to_hard_labels(soft_labels: jax.Array, rng_key,
                        ignore_label: int = 255):
    """Sample hard labels from soft distributions (the convert_to_hard
    path, ref: model/unet.py:179-182)."""
    n_classes = soft_labels.shape[-1]
    cum = jnp.cumsum(soft_labels, axis=-1)
    u = jax.random.uniform(rng_key, soft_labels.shape[:-1] + (1,))
    hard = n_classes - jnp.sum(cum > u, axis=-1)
    empty = soft_labels.sum(-1) <= 0
    return jnp.where(empty, ignore_label, jnp.clip(hard, 0,
                                                   n_classes - 1))


def build_criterion(cfg):
    """Loss factory keyed by OPTIMIZATION.loss (ref: model/unet.py:107-113)."""
    kind = cfg.OPTIMIZATION.get('loss', 'cross_entropy')
    ignore = cfg.DATA_CONFIG.DATA_CLASS.ignore_label
    if kind == 'cross_entropy':
        return lambda logits, labels, w=None: cross_entropy(
            logits, labels, ignore, w)[0]
    if kind == 'lovasz':
        return lambda logits, labels, w=None: lovasz_softmax(
            logits, labels, ignore)
    raise NotImplementedError(kind)
