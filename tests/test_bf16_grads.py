"""bf16 compute path must be differentiable (catches dtype-mix VJP bugs)."""

import jax
import jax.numpy as jnp
import numpy as np

from doda_tpu.models.unet import (SparseConvNet, build_level_plan,
                                  default_brick_caps)


def test_unet_bf16_grads(rng):
    coords = rng.integers(0, 40, size=(1, 256, 3)).astype(np.int32)
    valid = np.ones((1, 256), bool)
    feats = rng.normal(size=(1, 256, 3)).astype(np.float32)
    caps = default_brick_caps(128, 3, floor=32)
    plan = build_level_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    model = SparseConvNet(in_channel=3, mid_channel=4, n_classes=5,
                          num_levels=3)  # default bf16 compute dtype
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), plan,
                           train=True)

    def loss(params):
        logits, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            jnp.asarray(feats), plan, train=True, mutable=['batch_stats'])
        return (logits ** 2).mean()

    g = jax.grad(loss)(variables['params'])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(np.abs(np.asarray(x)).sum()) for x in leaves) > 0
