import jax
import jax.numpy as jnp
import numpy as np

from doda_tpu.models.unet import (SparseConvNet, build_level_plan,
                                  default_brick_caps)

F32 = jnp.float32


def make_batch(rng, batch=2, n_cap=512, n_real=400, extent=60):
    coords = rng.integers(0, extent, size=(batch, n_cap, 3)).astype(np.int32)
    valid = np.zeros((batch, n_cap), bool)
    valid[:, :n_real] = True
    feats = rng.normal(size=(batch, n_cap, 3)).astype(np.float32)
    return jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats)


def test_unet_forward_shapes_and_masking(rng):
    coords, valid, feats = make_batch(rng)
    caps = default_brick_caps(256, 4, floor=32)
    plan = build_level_plan(coords, valid, caps)
    model = SparseConvNet(in_channel=3, mid_channel=4, n_classes=5,
                          num_levels=4, dtype=F32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)
    logits = model.apply(variables, feats, plan, train=False)
    assert logits.shape == (2, 512, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_unet_train_step_decreases_loss(rng):
    import optax
    from doda_tpu.models.losses import cross_entropy

    coords, valid, feats = make_batch(rng, batch=2)
    labels = rng.integers(0, 5, size=(2, 512)).astype(np.int32)
    labels[~np.asarray(valid)] = 255
    labels = jnp.asarray(labels)
    caps = default_brick_caps(256, 3, floor=32)
    plan = build_level_plan(coords, valid, caps)
    model = SparseConvNet(in_channel=3, mid_channel=4, n_classes=5,
                          num_levels=3, dtype=F32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=True)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, updates = model.apply(
                {'params': p, 'batch_stats': batch_stats}, feats, plan,
                train=True, mutable=['batch_stats'])
            loss, _ = cross_entropy(logits.reshape(-1, 5),
                                    labels.reshape(-1), 255)
            return loss, updates['batch_stats']

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), new_bs, opt_state, loss

    losses = []
    for _ in range(5):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses
    assert all(b <= a + 1e-3 for a, b in zip(losses, losses[1:])), losses


def test_unet_dsnorm_domains_differ(rng):
    coords, valid, feats = make_batch(rng, batch=1)
    caps = default_brick_caps(256, 3, floor=32)
    plan = build_level_plan(coords, valid, caps)
    model = SparseConvNet(in_channel=3, mid_channel=4, n_classes=5,
                          num_levels=3, dsnorm=True, dtype=F32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=True)

    # push a few train steps with domain 0 only -> target stats stay init
    v = variables
    for _ in range(3):
        _, upd = model.apply(v, feats * 3.0 + 1.0, plan, train=True,
                             domain=0, mutable=['batch_stats'])
        v = {'params': v['params'], 'batch_stats': upd['batch_stats']}
    bs = jax.tree.leaves(v['batch_stats'])
    # every stats array has leading domain dim 2; domain 1 must be untouched
    stats = jax.tree.map(lambda a: a, v['batch_stats'])
    flat = jax.tree.leaves(stats)
    changed = [np.abs(np.asarray(a[0]) - np.asarray(a[1])).max() for a in
               flat if a.ndim == 2]
    assert max(changed) > 0  # source row moved away from target row

    # eval outputs differ by selected domain
    out0 = model.apply(v, feats, plan, train=False, domain=0)
    out1 = model.apply(v, feats, plan, train=False, domain=1)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-6


def test_unet_engine_equivalence_slab_vs_oracle(rng, monkeypatch):
    """Model forward on the default (slab at L0/L1 + 2d deeper) engine
    matches the shell-gather oracle engine, on a sparse scene that
    exercises missing-face-neighbor halo planes."""
    coords, valid, feats = make_batch(rng, batch=2, n_cap=512,
                                      n_real=350, extent=100)
    caps = default_brick_caps(512, 3, floor=32)
    plan = build_level_plan(coords, valid, caps)
    model = SparseConvNet(in_channel=3, mid_channel=4, n_classes=5,
                          num_levels=3, dtype=F32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)

    monkeypatch.setenv('DODA_CONV', 'slab')
    out_slab = np.asarray(model.apply(variables, feats, plan, train=False))
    monkeypatch.delenv('DODA_CONV', raising=False)
    out_2d = np.asarray(model.apply(variables, feats, plan, train=False))
    monkeypatch.setenv('DODA_CONV', 'oracle')
    out_or = np.asarray(model.apply(variables, feats, plan, train=False))
    np.testing.assert_allclose(out_slab, out_or, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_2d, out_or, rtol=2e-4, atol=2e-4)

    # per-level deep routing: shallow levels on the 2d engine, levels at
    # or under the row threshold on the v2 3D engine (DODA_DEEP_XLA)
    monkeypatch.delenv('DODA_CONV', raising=False)
    monkeypatch.setenv('DODA_DEEP_XLA', '600')
    out_mixed = np.asarray(model.apply(variables, feats, plan,
                                       train=False))
    np.testing.assert_allclose(out_mixed, out_or, rtol=2e-4, atol=2e-4)
