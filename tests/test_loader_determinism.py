"""Run-to-run determinism of the threaded input pipeline.

The loader's ThreadPoolExecutor workers must not share one
np.random.Generator (not thread-safe; stream depends on completion
order). Every ``__getitem__`` derives its own Generator from
(seed, epoch, item) — so two runs with the same seed produce identical
batches at any worker count, and a new epoch reshuffles the draws
(the torch analog: per-worker seeding, ref util/common_utils.py:303-306).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from make_synth_data import make_scannet  # noqa: E402

from doda_tpu.config import CfgNode, cfg_from_yaml_file  # noqa: E402
from doda_tpu.data import build_dataloader  # noqa: E402


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_det')
    make_scannet(str(root), n_train=6, n_val=2, n_points=2000,
                 rng=np.random.default_rng(0))
    return root


def _data_cfg(synth_root):
    cfg = CfgNode()
    cfg_from_yaml_file('cfgs/scannet/spconv.yaml', cfg)
    dc = cfg.DATA_CONFIG
    dc.DATA_ROOT = str(synth_root) + '/scannetv2'
    dc.DATA_PROCESSOR.max_npoint = 2000
    return dc


def _materialize(loader):
    out = []
    for batch in loader:
        p = batch.points
        out.append((np.asarray(p.coords), np.asarray(p.feats),
                    np.asarray(p.labels), np.asarray(p.valid)))
    return out


def _run_epoch(synth_root, workers, seed=7, epoch=0):
    _, loader, sampler = build_dataloader(
        _data_cfg(synth_root), batch_size=2, workers=workers, seed=seed)
    sampler.set_epoch(epoch)
    return _materialize(loader)

def test_same_seed_same_batches_across_worker_counts(synth_root):
    a = _run_epoch(synth_root, workers=4)
    b = _run_epoch(synth_root, workers=4)
    c = _run_epoch(synth_root, workers=1)
    assert len(a) == len(b) == len(c) > 0
    for xa, xb, xc in zip(a, b, c):
        for ta, tb, tc in zip(xa, xb, xc):
            np.testing.assert_array_equal(ta, tb)
            np.testing.assert_array_equal(ta, tc)


def test_new_epoch_changes_augmentation(synth_root):
    a = _run_epoch(synth_root, workers=4, epoch=0)
    b = _run_epoch(synth_root, workers=4, epoch=1)
    assert any((xa[0].shape != xb[0].shape) or (xa[0] != xb[0]).any()
               for xa, xb in zip(a, b))


def test_different_seed_changes_batches(synth_root):
    a = _run_epoch(synth_root, workers=2, seed=7)
    b = _run_epoch(synth_root, workers=2, seed=8)
    assert any((xa[0].shape != xb[0].shape) or (xa[0] != xb[0]).any()
               for xa, xb in zip(a, b))
