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

    ``domain`` is a traced int32 scalar (ignored unless ``dsnorm``).
    Matches torch BN semantics: normalize by biased batch variance, track
    running stats with unbiased variance, momentum 0.1
    (ref: model/unet.py:28 uses eps=1e-4, momentum=0.1).

    Layout: x is wide-lane 2D ``(rows, 64*C)`` with ``mask`` the ``(rows,
    64)`` cell-occupancy — per-channel quantities are tiled across the 64
    cell blocks so no C-minor tensor is ever materialized (8x HBM tile
    padding at C = 16; see ops/bricks2d.py).
    """

    features: int
    eps: float = 1e-4
    momentum: float = 0.1
    dsnorm: bool = False
    affine: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool, domain=0, fold: bool = False):
        """With ``fold=True`` returns the effective per-channel
        ``(scale, bias)`` of shape (C,) instead of applying them —
        running stats are still computed/updated from the masked cells
        exactly as in the applying path. Callers fold the affine into a
        cheaper downstream pass (e.g. after the voxel->point gather,
        786k rows instead of 12.6M cells at the bench shape)."""
        return self._norm(x, mask, train, domain, fold)

    def _norm(self, x, mask, train, domain, fold):
        c = self.features
        cells = x.shape[-1] // c
        n_domains = 2 if self.dsnorm else 1
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((n_domains, c)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((n_domains, c)))
        d = jnp.asarray(domain if self.dsnorm else 0, jnp.int32)

        if train:
            mrep = jnp.repeat(mask, c, axis=1)
            xm = jnp.where(mrep, x, 0).astype(jnp.float32)
            # Sums over all rows and cells: with the row dim sharded on a
            # mesh this is a global (cross-replica) reduction -> SyncBN.
            # Reduce the wide (rows, 64C) tensor along rows FIRST and only
            # then fold the 64 cell blocks: reshaping the full tensor to
            # (rows*64, C) is C-minor and the remat'd backward materializes
            # it at 4x tile padding (measured 5.0 GB f32[10.5M, 32] temp at
            # L0 decoder, the single largest allocation of the batch-4
            # train step). Column-sums keep the lane layout; the reshape
            # then touches a (64C,) vector.
            count = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
            mean = xm.sum(0).reshape(cells, c).sum(0) / count
            var = ((xm * xm).sum(0).reshape(cells, c).sum(0) / count
                   - mean * mean)
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

        rs = jax.lax.rsqrt(var + self.eps)
        scale_eff, bias_eff = rs, -mean * rs
        if self.affine:
            scale = self.param('scale', nn.initializers.ones, (c,))
            bias = self.param('bias', nn.initializers.zeros, (c,))
            scale_eff = rs * scale
            bias_eff = bias - mean * rs * scale
        if fold:
            return scale_eff, bias_eff
        # apply in the activation dtype: the f32 upcast of the whole
        # (rows, 64C) tensor doubled the vector width of the apply pass
        # (traced at ~104 GB/s); scale/bias stay f32-prepared and are
        # rounded once. f32 activations (tests/oracles) are unaffected.
        st = jnp.tile(scale_eff, cells).astype(x.dtype)
        bt = jnp.tile(bias_eff, cells).astype(x.dtype)
        y = x * st + bt
        zero = jnp.zeros((), x.dtype)
        return jnp.where(jnp.repeat(mask, c, axis=1), y, zero)
