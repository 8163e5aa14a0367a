"""Device-side augmentation (data/device_aug.py) vs the host aug_ops.

The device path must reproduce the host math stage by stage: the box
blur vs scipy's uniform_filter1d, the trilinear lookup vs
_trilinear_regular on the same noise grid, rotation-matrix structure,
and the end-to-end re-voxelize conventions (masking, min-shift, floor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from doda_tpu.config import CfgNode
from doda_tpu.data import device_aug
from doda_tpu.data.augmentor import aug_ops
from doda_tpu.data.augmentor.augmentor import DataAugmentor
from doda_tpu.models.model_fn import PointBatch


def test_blur3_matches_scipy(rng):
    n = rng.normal(size=(3, 9, 9, 9)).astype(np.float32)
    got = np.asarray(device_aug._blur3(jnp.asarray(n)))
    want = n.copy()
    for _ in range(2):
        for axis in range(1, 4):
            want = scipy.ndimage.uniform_filter1d(
                want, size=3, axis=axis, mode='constant', cval=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_elastic_offsets_match_host_trilinear(rng):
    d, gran = 17, 4
    noise = rng.normal(size=(3, d, d, d)).astype(np.float32)
    xyz = (rng.random((500, 3)).astype(np.float32) * 2 - 1) \
        * (d - 1) * gran * 1.1  # ~10% of queries out of bounds
    got = np.asarray(device_aug.elastic_offsets(
        jnp.asarray(noise), gran, jnp.asarray(xyz)))
    want = aug_ops._trilinear_regular(
        [noise[0], noise[1], noise[2]], np.array([d, d, d]), gran, xyz)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotation_matrix_structure():
    # rotation-only: orthogonal, det +1; with flip p=1: det -1
    cfg = CfgNode({'rotation': {'p': 1.0, 'value': [0.0, 0.0, 1.0]}})
    m = np.asarray(device_aug._rotation_matrix(cfg, jax.random.PRNGKey(3)))
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(m) > 0.99
    # z-rotation only: the z axis is fixed
    np.testing.assert_allclose(m[2], [0, 0, 1], atol=1e-6)
    cfg = CfgNode({'rotation': {'p': 1.0, 'value': [0.0, 0.0, 1.0]},
                   'flip': {'p': 1.0}})
    m = np.asarray(device_aug._rotation_matrix(cfg, jax.random.PRNGKey(3)))
    assert np.linalg.det(m) < -0.99


def _aug_cfg(device=True, jitter=False):
    return CfgNode({
        'enabled': True,
        'device': device,
        'aug_list': ['scene_aug', 'elastic', 'crop', 'shuffle'],
        'scene_aug': {'rotation': {'p': 1.0, 'value': [0.0, 0.0, 1.0]},
                      'jitter': jitter, 'flip': {'p': 0.5}},
        'elastic': {'enabled': True, 'value': [[6, 40], [20, 160]],
                    'apply_to_feat': False, 'p': 1.0},
        'shuffle': True,
    })


def _batch(rng, b=2, n=128, n_valid=100):
    xyz = (rng.random((b, n, 3)).astype(np.float32) * 2 - 1) * 2.0
    valid = np.zeros((b, n), bool)
    valid[:, :n_valid] = True
    xyz[~valid] = 0.0
    return PointBatch(
        coords=jnp.zeros((b, n, 3), jnp.int32),
        feats=jnp.asarray(xyz),
        labels=jnp.zeros((b, n), jnp.int32),
        valid=jnp.asarray(valid))


def test_device_augment_conventions(rng):
    cfg = _aug_cfg()
    batch = _batch(rng)
    out = jax.jit(lambda b, k: device_aug.device_augment(cfg, 50, b, k))(
        batch, jax.random.PRNGKey(0))
    coords = np.asarray(out.coords)
    feats = np.asarray(out.feats)
    valid = np.asarray(batch.valid)
    # invalid rows stay zero
    assert (coords[~valid] == 0).all() and (feats[~valid] == 0).all()
    # per-scene min-shift: coords start at 0 on every axis
    for i in range(coords.shape[0]):
        assert (coords[i][valid[i]].min(axis=0) == 0).all()
        assert coords[i][valid[i]].min() >= 0
    # rotation-only scene_aug (no jitter) preserves point norms;
    # apply_to_feat=False keeps feats rotated but not distorted
    r0 = np.linalg.norm(np.asarray(batch.feats)[valid], axis=-1)
    r1 = np.linalg.norm(feats[valid], axis=-1)
    np.testing.assert_allclose(r0, r1, rtol=1e-4, atol=1e-5)
    # elastic moved the voxel coords away from plain floor(rotated*50)
    assert (np.abs(coords[valid]).max() > 0)


def test_device_augment_deterministic(rng):
    cfg = _aug_cfg()
    batch = _batch(rng)
    f = jax.jit(lambda b, k: device_aug.device_augment(cfg, 50, b, k))
    o1 = f(batch, jax.random.PRNGKey(7))
    o2 = f(batch, jax.random.PRNGKey(7))
    o3 = f(batch, jax.random.PRNGKey(8))
    assert (np.asarray(o1.coords) == np.asarray(o2.coords)).all()
    assert (np.asarray(o1.coords) != np.asarray(o3.coords)).any()


def test_aug_fn_for_gating():
    data_cfg = CfgNode({'DATA_AUG': _aug_cfg(device=False),
                        'DATA_PROCESSOR': {'voxel_scale': 50}})
    assert device_aug.aug_fn_for(data_cfg) is None
    data_cfg.DATA_AUG.device = True
    assert device_aug.aug_fn_for(data_cfg) is not None
    # post-mix list without a device stage -> None
    assert device_aug.aug_fn_for(data_cfg, ['crop', 'shuffle']) is None
    # post-mix list with elastic -> active
    assert device_aug.aug_fn_for(
        data_cfg, ['elastic', 'crop', 'shuffle']) is not None


def test_host_pipeline_skips_device_stages(rng):
    cfg = _aug_cfg(device=True)
    aug = DataAugmentor(cfg, 'scannet', ['a', 'b'], 255, 50, 4,
                        [128, 512], 2 ** 30, 200000, seed=0)
    names = [n for n, _, _ in aug.pipeline]
    assert 'scene_aug' not in names          # moved on-device
    assert names == ['elastic', 'crop', 'shuffle']
    xyz = rng.random((200, 3)).astype(np.float64) * 2 - 1
    label = rng.integers(0, 2, 200)
    data = aug.forward({'xyz_middle': xyz.copy(), 'label': label})
    # elastic ran its pass-through branch: xyz == xyz_middle*scale - min
    want = xyz * 50
    want = want - want.min(0)
    got = data['xyz']
    # crop/shuffle may permute rows; compare as sorted sets
    np.testing.assert_allclose(np.sort(got, axis=0),
                               np.sort(want, axis=0), atol=1e-6)


def test_train_step_with_device_aug(rng):
    from doda_tpu.models import model_fn as mf
    from doda_tpu.utils.optim import build_optimizer
    cfg = CfgNode({
        'COMMON_CLASSES': {'n_classes': 5},
        'MODEL': {'BACKBONE': {'use_xyz': False, 'in_channel': 3,
                               'mid_channel': 4, 'block_residual': True,
                               'block_reps': 2, 'num_levels': 3},
                  'dsnorm': False},
        'DATA_CONFIG': {'DATA_CLASS': {'ignore_label': 255, 'n_classes': 5},
                        'DATA_AUG': _aug_cfg(device=True),
                        'DATA_PROCESSOR': {'voxel_scale': 50}},
        'OPTIMIZATION': {'optim': 'sgd', 'base_lr': 0.05, 'momentum': 0.9,
                         'weight_decay': 1e-4, 'loss': 'cross_entropy'},
    })
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    train_step, _, _ = mf.make_steps(cfg, model, tx, (128, 64, 32))
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    batch = _batch(rng, b=2, n=256, n_valid=200)
    batch = batch._replace(
        labels=jnp.asarray(np.where(np.asarray(batch.valid),
                                    rng.integers(0, 5, (2, 256)),
                                    255).astype(np.int32)))
    s1, m1 = train_step(state, batch, 0.05, 0)
    assert np.isfinite(float(m1['loss']))
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(state.params)))
    assert delta > 0
    # different state.step -> different aug draw -> different metrics
    s2, m2 = train_step(s1, batch, 0.05, 0)
    assert float(m2['loss']) != float(m1['loss'])
