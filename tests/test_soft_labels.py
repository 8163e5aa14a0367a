"""SOFT_LABEL self-training path (the branch the reference declares at
model/unet.py:174-194 but never wires — its helpers don't exist
upstream). Covers the three split modes, the producer/loader round trip,
and an end-to-end st_step convergence smoke on synthetic soft labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doda_tpu.config import CfgNode
from doda_tpu.models import model_fn as mf
from doda_tpu.models.losses import soft_cross_entropy, soft_to_hard_labels
from doda_tpu.utils import pseudo_labels as pl_utils
from doda_tpu.utils.optim import build_optimizer


def make_cfg(soft_mode='plain'):
    soft = {'enabled': True}
    if soft_mode == 'hard':
        soft['convert_to_hard'] = True
    elif soft_mode == 'thres':
        soft['thres'] = {'enabled': True}
    return CfgNode({
        'COMMON_CLASSES': {'n_classes': 5},
        'MODEL': {'BACKBONE': {'use_xyz': False, 'in_channel': 3,
                               'mid_channel': 4, 'block_residual': True,
                               'block_reps': 2, 'num_levels': 2},
                  'dsnorm': True},
        'DATA_CONFIG': {'DATA_CLASS': {'ignore_label': 255,
                                       'n_classes': 5}},
        'OPTIMIZATION': {'optim': 'sgd', 'base_lr': 0.1, 'momentum': 0.9,
                         'weight_decay': 0.0, 'loss': 'cross_entropy'},
        'SOFT_LABEL': soft,
    })


def make_batch(rng, batch=2, n_cap=128, n_classes=5):
    coords = rng.integers(0, 24, (batch, n_cap, 3)).astype(np.int32)
    labels = rng.integers(0, n_classes, (batch, n_cap)).astype(np.int32)
    valid = np.ones((batch, n_cap), bool)
    valid[:, 100:] = False
    labels[~valid] = 255
    points = mf.PointBatch(
        coords=jnp.asarray(coords),
        feats=jnp.asarray(rng.normal(size=(batch, n_cap, 3))
                          .astype(np.float32)),
        labels=jnp.asarray(labels),
        valid=jnp.asarray(valid))
    # soft labels: half the points hard one-hot, half a 2-class mix
    soft = np.zeros((batch, n_cap, n_classes), np.float32)
    hard = rng.random((batch, n_cap)) < 0.5
    for b in range(batch):
        for i in range(100):
            c = labels[b, i]
            if hard[b, i]:
                soft[b, i, c] = 1.0
            else:
                soft[b, i, c] = 0.7
                soft[b, i, (c + 1) % n_classes] = 0.3
    return points, jnp.asarray(soft)


@pytest.mark.parametrize('mode', ['plain', 'thres', 'hard'])
def test_st_step_soft_converges(rng, mode):
    cfg = make_cfg(mode)
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    _, _, st_step = mf.make_steps(cfg, model, tx, (64, 32))
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    src, _ = make_batch(rng)
    tar, soft = make_batch(rng)
    losses = []
    for i in range(8):
        state, m = st_step(state, src, tar, 0.1, 1.0, 1.0,
                           tar_soft=soft, rng=jax.random.PRNGKey(i))
        losses.append(float(m['loss_u']))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_soft_label_split_semantics(rng):
    """thres mode: hard rows (top1==1) train with CE on top-1; soft rows
    with soft-CE; empty rows contribute nothing."""
    cfg = make_cfg('thres')
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    _, _, st_step = mf.make_steps(cfg, model, tx, (64, 32))
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    src, _ = make_batch(rng)
    tar, soft = make_batch(rng)
    # zero out all soft rows -> target loss must be exactly 0
    state2, m = st_step(state, src, tar, 0.0, 1.0, 1.0,
                        tar_soft=jnp.zeros_like(soft),
                        rng=jax.random.PRNGKey(0))
    assert float(m['loss_u']) == 0.0


def test_soft_to_hard_sampling_distribution(rng):
    soft = jnp.asarray(np.tile(np.array([[0.25, 0.75, 0.0]], np.float32),
                               (4000, 1)))
    hard = np.asarray(soft_to_hard_labels(soft, jax.random.PRNGKey(1)))
    frac1 = (hard == 1).mean()
    assert 0.7 < frac1 < 0.8
    assert ((hard == 0) | (hard == 1)).all()


def test_soft_cross_entropy_matches_hard_ce_on_onehot(rng):
    logits = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
    labels = rng.integers(0, 5, 64).astype(np.int32)
    onehot = jnp.asarray(np.eye(5, dtype=np.float32)[labels])
    from doda_tpu.models.losses import cross_entropy
    a = float(soft_cross_entropy(logits, onehot))
    b = float(cross_entropy(logits, jnp.asarray(labels), 255)[0])
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_soft_label_store_roundtrip(tmp_path, rng):
    softmax = rng.random((50, 5)).astype(np.float32)
    softmax /= softmax.sum(-1, keepdims=True)
    hard_mask = rng.random(50) < 0.4
    pl_utils.save_scene_soft_labels(tmp_path, 'scene0', softmax, hard_mask)
    back = pl_utils.load_scene_soft_labels(tmp_path, 'scene0')
    assert back.shape == (50, 5)
    top1 = back.max(-1)
    np.testing.assert_allclose(top1[hard_mask], 1.0)
    np.testing.assert_allclose(back[~hard_mask],
                               softmax[~hard_mask], atol=1e-3)
