"""Checkpoint lifecycle: save/resume/pretrain/best/rolling-delete."""

import jax
import numpy as np

from doda_tpu.config import CfgNode
from doda_tpu.models import model_fn as mf
from doda_tpu.utils import checkpoint as ck
from doda_tpu.utils.optim import build_optimizer


def make_cfg(dsnorm=False):
    return CfgNode({
        'COMMON_CLASSES': {'n_classes': 5},
        'MODEL': {'BACKBONE': {'use_xyz': False, 'in_channel': 3,
                               'mid_channel': 4, 'block_residual': True,
                               'block_reps': 2, 'num_levels': 3},
                  'dsnorm': dsnorm},
        'DATA_CONFIG': {'DATA_CLASS': {'ignore_label': 255,
                                       'n_classes': 5}},
        'OPTIMIZATION': {'optim': 'sgd', 'base_lr': 0.01, 'momentum': 0.9,
                         'weight_decay': 1e-4, 'loss': 'cross_entropy'},
    })


def make_state(cfg, seed=0):
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    return model, tx, mf.init_state(cfg, model, tx,
                                    jax.random.PRNGKey(seed))


def test_save_resume_roundtrip(tmp_path):
    cfg = make_cfg()
    _, _, state = make_state(cfg)
    path = tmp_path / 'train_epoch_3'
    ck.save_params(path, state, 3, metric=0.5)
    _, _, fresh = make_state(cfg, seed=1)
    restored, epoch = ck.load_params_from_ckpt(path, fresh)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer structure (optax NamedTuples) must survive
    assert jax.tree.structure(restored.opt_state) \
        == jax.tree.structure(state.opt_state)
    assert ck.load_metric_from_ckpt(path) == (0.5, 3)


def test_auto_resume_and_rolling_delete(tmp_path):
    cfg = make_cfg()
    _, _, state = make_state(cfg)
    for e in (1, 2, 3):
        ck.save_params(tmp_path / f'train_epoch_{e}', state, e)
    assert ck.auto_resume_path(tmp_path).endswith('train_epoch_3')
    ck.rolling_delete(tmp_path, 3, save_freq=1)
    assert not (tmp_path / 'train_epoch_1').exists()
    assert (tmp_path / 'train_epoch_2').exists()


def test_pretrain_bn_to_dsnorm(tmp_path):
    """A plain-BN checkpoint loads into a DSNorm model: running stats
    broadcast to both domains (ref: model/dsnorm.py:138-141 compat)."""
    cfg_bn = make_cfg(dsnorm=False)
    _, _, state_bn = make_state(cfg_bn)
    path = tmp_path / 'pretrain'
    ck.save_params(path, state_bn, 7, metric=0.4)

    cfg_ds = make_cfg(dsnorm=True)
    _, _, state_ds = make_state(cfg_ds, seed=1)
    loaded = ck.load_params_from_pretrain(path, state_ds, strict=True)
    for a, b in zip(jax.tree.leaves(state_bn.params),
                    jax.tree.leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # every stats leaf has both domain rows equal to the BN stats
    bn_stats = jax.tree.leaves(state_bn.batch_stats)
    ds_stats = jax.tree.leaves(loaded.batch_stats)
    for a, b in zip(bn_stats, ds_stats):
        assert b.shape[0] == 2
        np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(a[0]))
        np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a[0]))


def test_pretrain_dsnorm_to_bn(tmp_path):
    cfg_ds = make_cfg(dsnorm=True)
    _, _, state_ds = make_state(cfg_ds)
    path = tmp_path / 'pretrain_ds'
    ck.save_params(path, state_ds, 1)
    cfg_bn = make_cfg(dsnorm=False)
    _, _, state_bn = make_state(cfg_bn, seed=1)
    loaded = ck.load_params_from_pretrain(path, state_bn, strict=True)
    for a, b in zip(jax.tree.leaves(state_ds.batch_stats),
                    jax.tree.leaves(loaded.batch_stats)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a[:1]))


def test_pretrain_not_strict_tolerates_missing(tmp_path):
    cfg = make_cfg()
    _, _, state = make_state(cfg)
    path = tmp_path / 'pre'
    ck.save_params(path, state, 1)
    # a model with different head size: strict fails, non-strict keeps init
    cfg2 = make_cfg()
    cfg2.COMMON_CLASSES.n_classes = 7
    _, _, state2 = make_state(cfg2, seed=1)
    import pytest
    with pytest.raises(ValueError):
        ck.load_params_from_pretrain(path, state2, strict=True)
    loaded = ck.load_params_from_pretrain(path, state2, strict=False)
    assert loaded.params['linear']['kernel'].shape[-1] == 7
