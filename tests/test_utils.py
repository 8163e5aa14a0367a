"""Utility-layer oracles: pseudo-label thresholds, metrics, LR schedules."""

import numpy as np

from doda_tpu.config import CfgNode
from doda_tpu.utils import pseudo_labels as pl
from doda_tpu.utils.metrics import calc_metrics, intersection_and_union
from doda_tpu.utils.optim import make_lr_fn


def test_histogram_threshold_matches_sorted_quantile(rng):
    """Histogram-quantile thresholds must match the reference's
    sort-all-confidences definition (ref pseudo_labels_util.py:128-144:
    threshold = confidence of the (ratio*n)-th highest point) up to bin
    resolution."""
    n_classes = 3
    hist = np.zeros((n_classes, pl.N_BINS), np.int64)
    confs = {c: rng.uniform(0.2, 1.0, 5000) for c in range(n_classes)}
    preds = np.concatenate([np.full(5000, c) for c in range(n_classes)])
    conf = np.concatenate([confs[c] for c in range(n_classes)])
    pl.accumulate_confidence_histogram(preds, conf,
                                       np.ones_like(preds, bool),
                                       n_classes, hist)
    thres = pl.thresholds_from_histogram(hist, [0.3])
    for c in range(n_classes):
        srt = np.sort(confs[c])[::-1]
        expect = srt[max(1, int(0.3 * len(srt))) - 1]
        assert abs(thres[c] - expect) < 2.0 / pl.N_BINS
    # empty class -> threshold 0 (ref :142-143)
    hist2 = np.zeros((2, pl.N_BINS), np.int64)
    hist2[0, 512] = 10
    t = pl.thresholds_from_histogram(hist2, [0.5])
    assert t[1] == 0.0


def test_get_perclass_thres_global(rng):
    cfg = CfgNode({'COMMON_CLASSES': {'n_classes': 4},
                   'SELF_TRAIN': {'global_thres': True, 'thres': [0.7]}})
    assert pl.get_perclass_thres(cfg, lambda: None) == [0.7] * 4


def test_metrics_match_reference_formula(rng):
    """intersection_and_union vs ref intersectionAndUnion
    (util/common_utils.py:218-230)."""
    k = 5
    preds = rng.integers(0, k, 1000)
    labels = rng.integers(0, k, 1000)
    labels[800:] = 255
    i, u, t = (np.asarray(x) for x in intersection_and_union(
        preds.astype(np.int32), labels.astype(np.int32), k, 255))
    out = preds.copy()
    out[labels == 255] = 255
    inter = out[out == labels]
    ai = np.histogram(inter, bins=np.arange(k + 1))[0]
    ao = np.histogram(out, bins=np.arange(k + 1))[0]
    at = np.histogram(labels, bins=np.arange(k + 1))[0]
    np.testing.assert_array_equal(i, ai)
    np.testing.assert_array_equal(u, ao + at - ai)
    np.testing.assert_array_equal(t, at)
    miou, macc, allacc, iou_c, acc_c = calc_metrics(i, u, t)
    np.testing.assert_allclose(iou_c, ai / (ao + at - ai + 1e-10))


def test_lr_schedules_match_reference():
    """step/poly/cos vs util/common_utils.py:154-193 (including the
    reference's epoch-1 quirk where epoch 0 runs at multiplier^-1)."""
    opt = CfgNode({'lr_decay': 'step', 'base_lr': 0.01, 'step_epoch': 10,
                   'multiplier': 0.5})
    f = make_lr_fn(opt, total_epochs=30, iters_per_epoch=100)
    np.testing.assert_allclose(float(f(0, 0)), 0.02, rtol=1e-5)
    # ^ (0-1)//10 = -1 -> 0.5^-1 (the reference's epoch-0 quirk)
    np.testing.assert_allclose(float(f(1, 0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(f(11, 0)), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(f(21, 50)), 0.0025, rtol=1e-5)

    opt = CfgNode({'lr_decay': 'poly', 'base_lr': 0.01})
    f = make_lr_fn(opt, total_epochs=10, iters_per_epoch=100)
    expect = 0.01 * (1 - 501 / 1000) ** 0.9
    np.testing.assert_allclose(float(f(5, 0)), expect, rtol=1e-6)

    opt = CfgNode({'lr_decay': 'cos', 'base_lr': 0.01})
    f = make_lr_fn(opt, total_epochs=10, iters_per_epoch=100)
    expect = 0.5 * 0.01 * (1 + np.cos(np.pi * 501 / 1000))
    np.testing.assert_allclose(float(f(5, 0)), expect, rtol=1e-6)


def test_sharded_sampler_pads_and_strides():
    """ref DistributedSampler override: pad to total_size then stride by
    rank (dataset/__init__.py:21-41)."""
    from doda_tpu.data.loader import ShardedSampler
    samplers = [ShardedSampler(10, batch_size=2, shuffle=False,
                               world_size=4, rank=r) for r in range(4)]
    chunks = [s.indices() for s in samplers]
    assert all(len(c) == len(chunks[0]) for c in chunks)
    merged = np.stack(chunks, 1).reshape(-1)
    assert set(merged[:10].tolist()) == set(range(10))
    # train drop_last divides evenly
    s = ShardedSampler(10, batch_size=2, shuffle=True, world_size=4,
                       rank=0, drop_last=True)
    assert len(s.indices()) % 2 == 0
    # reshuffles per epoch
    a = s.indices()
    s.set_epoch(1)
    b = s.indices()
    assert not np.array_equal(a, b)
