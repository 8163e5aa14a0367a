"""Loss oracles: CE (w/ ignore + weights), Lovász, soft labels."""

import jax
import jax.numpy as jnp
import numpy as np

from doda_tpu.models.losses import (cross_entropy, lovasz_softmax,
                                    soft_cross_entropy,
                                    soft_to_hard_labels)


def np_ce(logits, labels, ignore):
    valid = labels != ignore
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    nll = -np.log(p[np.arange(len(labels)),
                    np.clip(labels, 0, logits.shape[1] - 1)] + 1e-30)
    return nll[valid].mean()


def test_cross_entropy_matches_numpy(rng):
    logits = rng.normal(size=(100, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 100).astype(np.int32)
    labels[70:] = 255
    loss, count = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                255)
    np.testing.assert_allclose(float(loss),
                               np_ce(logits, labels, 255), rtol=1e-5)
    assert int(count) == 70


def test_cross_entropy_weighted(rng):
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 50).astype(np.int32)
    w = rng.uniform(0, 1, 50).astype(np.float32)
    loss, _ = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255,
                            jnp.asarray(w))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    nll = -np.log(p[np.arange(50), labels] + 1e-30)
    # ref: (loss * weight).sum() / (weight.sum() + eps)
    # (model/unet.py:169-172)
    np.testing.assert_allclose(float(loss), (nll * w).sum() / w.sum(),
                               rtol=1e-4)


def np_lovasz(logits, labels, ignore):
    """Oracle following ref util/lovasz_loss.py:129-173 exactly."""
    valid = labels != ignore
    probas = np.exp(logits - logits.max(-1, keepdims=True))
    probas /= probas.sum(-1, keepdims=True)
    probas, labels = probas[valid], labels[valid]
    losses = []
    for c in range(logits.shape[1]):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probas[:, c])
        order = np.argsort(-errors)
        fg_s = fg[order]
        gts = fg_s.sum()
        inter = gts - np.cumsum(fg_s)
        union = gts + np.cumsum(1 - fg_s)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((errors[order] * jac).sum())
    return np.mean(losses)


def test_lovasz_matches_reference_formula(rng):
    logits = rng.normal(size=(80, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 80).astype(np.int32)
    labels[60:] = 255
    got = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                               255))
    expect = np_lovasz(logits, labels, 255)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_lovasz_ignores_padding(rng):
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 50).astype(np.int32)
    l1 = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                              255))
    # appending ignored points must not change the loss
    logits2 = np.concatenate([logits,
                              rng.normal(size=(30, 4)).astype(np.float32)])
    labels2 = np.concatenate([labels, np.full(30, 255, np.int32)])
    l2 = float(lovasz_softmax(jnp.asarray(logits2), jnp.asarray(labels2),
                              255))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_soft_cross_entropy(rng):
    logits = rng.normal(size=(20, 4)).astype(np.float32)
    soft = rng.dirichlet(np.ones(4), 20).astype(np.float32)
    loss = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    np.testing.assert_allclose(loss, -(soft * np.log(p + 1e-30)).sum(1)
                               .mean(), rtol=1e-4)


def test_soft_to_hard_sampling(rng):
    soft = np.zeros((1000, 3), np.float32)
    soft[:, 1] = 0.8
    soft[:, 2] = 0.2
    hard = np.asarray(soft_to_hard_labels(jnp.asarray(soft),
                                          jax.random.PRNGKey(0)))
    frac1 = (hard == 1).mean()
    assert 0.7 < frac1 < 0.9
    assert set(np.unique(hard)) <= {1, 2}


def test_oversized_scene_collate(rng):
    """Scenes past the largest bucket subsample + carry full arrays."""
    from doda_tpu.config import CfgNode
    from doda_tpu.data.dataset import Dataset
    cfg = CfgNode({
        'DATA_ROOT': '.', 'DATASET': 'scannet',
        'DATA_PROCESSOR': {'voxel_scale': 50, 'max_npoint': 100,
                           'full_scale': [128, 512],
                           'point_range': int(2e8), 'voxel_mode': 4},
        'DATA_CLASS': {'ignore_label': 255, 'class_names': ['a', 'b'],
                       'n_classes': 2},
        'DATA_AUG': {'enabled': False, 'aug_list': []},
    })
    ds = Dataset(cfg, ['a', 'b'], batch_size=1)
    max_cap = ds.capacity_buckets[-1]
    n = max_cap * 2
    xyz_v = rng.uniform(0, 100, (n, 3))
    item = (xyz_v, xyz_v / 50, rng.integers(0, 2, n), 0, {})
    batch = ds.test_collate_fn([item])
    assert batch.points.coords.shape[1] == max_cap
    assert batch.points.valid.sum() == max_cap
    assert batch.full is not None
    assert batch.full['xyz_middle_all'][0].shape[0] == n
