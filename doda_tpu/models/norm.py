"""Masked batch normalization with optional per-domain statistics.

One module unifies three reference components:
* plain ``nn.BatchNorm1d`` (ref: model/unet.py:28),
* ``SyncBatchNorm`` / the vendored thread sync_bn (ref: tool/train.py:330,
  lib/sync_bn/batchnorm.py) — under GSPMD jit the batch reductions below
  run over the *sharded* voxel axes, so XLA inserts the cross-replica
  collectives automatically; sync-BN is the default, not an option,
* ``DSNorm`` (ref: model/dsnorm.py:12-84) — running mean/var get a leading
  domain axis of size 2 (0 = source, 1 = target) selected by a traced
  ``domain`` scalar instead of Python-side module mutation
  (ref set_ds_source/set_ds_target, model/dsnorm.py:335-344).

Statistics are computed over *valid* voxels only (the reference operates on
dense (N, C) voxel features with no padding; we pad, so masking is load-
bearing). Outputs are re-masked to keep the zero-at-inactive-cells
invariant required by the brick engine.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over masked elements with (optionally) per-domain stats.

    Call with x (..., C) and mask (...) broadcastable to x's leading dims.
    ``domain`` is a traced int32 scalar (ignored unless ``dsnorm``).
    Matches torch BN semantics: normalize by biased batch variance, track
    running stats with unbiased variance, momentum 0.1
    (ref: model/unet.py:28 uses eps=1e-4, momentum=0.1).
    """

    features: int
    eps: float = 1e-4
    momentum: float = 0.1
    dsnorm: bool = False
    affine: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool, domain=0):
        c = self.features
        n_domains = 2 if self.dsnorm else 1
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((n_domains, c)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((n_domains, c)))
        d = jnp.asarray(domain if self.dsnorm else 0, jnp.int32)

        if train:
            m = mask.astype(jnp.float32)[..., None]
            # Sums over every leading axis: with the batch dim sharded on a
            # mesh this is a global (cross-replica) reduction -> SyncBN.
            count = jnp.maximum(m.sum(), 1.0)
            xm = x.astype(jnp.float32) * m
            mean = xm.sum(axis=tuple(range(x.ndim - 1))) / count
            var = (xm * x).sum(axis=tuple(range(x.ndim - 1))) / count \
                - mean * mean
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                mom = self.momentum
                ra_mean.value = ra_mean.value.at[d].set(
                    (1 - mom) * ra_mean.value[d] + mom * mean)
                ra_var.value = ra_var.value.at[d].set(
                    (1 - mom) * ra_var.value[d] + mom * unbiased)
        else:
            mean = ra_mean.value[d]
            var = ra_var.value[d]

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param('scale', nn.initializers.ones, (c,))
            bias = self.param('bias', nn.initializers.zeros, (c,))
            y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(x.dtype)
