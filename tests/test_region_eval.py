"""Region-split eval (DATA_PROCESSOR.region_eval): oversized scenes are
quadrant-split so EVERY point is forwarded; predictions restitch by 1-NN.

The reference defines quadrant masks (dataset/dataset.py:99-113) but
never calls them — its real oversized path is subsample + 1-NN broadcast
(dataset/s3dis.py:60-63 + model/unet.py:135-145), which is our default
test collate. region_eval is the exact-coverage upgrade."""

import numpy as np
import pytest

from doda_tpu.config import CfgNode
from doda_tpu.data.dataset import Dataset
from doda_tpu.ops.pointops import knn_broadcast_labels


def make_dataset(region_eval=True, max_npoint=2048):
    cfg = CfgNode({
        'DATA_ROOT': '/tmp/none',
        'DATASET': 'scannet',
        'DATA_PROCESSOR': {'voxel_scale': 50, 'max_npoint': max_npoint,
                           'full_scale': [128, 512], 'point_range': 4,
                           'voxel_mode': 4, 'region_eval': region_eval},
        'DATA_CLASS': {'ignore_label': 255},
        'DATA_AUG': {'enabled': False, 'aug_list': []},
    })
    ds = Dataset(cfg, ['wall', 'floor'], batch_size=2, split='test',
                 training=False, seed=0)
    ds.data_list = ['scene0', 'scene1']
    return ds


def make_scene(rng, n):
    xyz_mid = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    xyz_v = (xyz_mid * 50)
    xyz_v -= xyz_v.min(0)
    label = rng.integers(0, 2, n).astype(np.int64)
    return xyz_v, xyz_mid, label


def test_split_covers_every_point(rng):
    ds = make_dataset()
    max_cap = ds.capacity_buckets[-1]
    xyz_v, xyz_mid, label = make_scene(rng, int(max_cap * 2.5))
    # tag each point by index through the label channel
    idx_label = np.arange(len(xyz_mid), dtype=np.int64)
    regions = ds.split_to_regions(xyz_v, xyz_mid, idx_label)
    assert all(r[1].shape[0] <= max_cap for r in regions)
    covered = np.unique(np.concatenate([r[2] for r in regions]))
    assert len(covered) == len(xyz_mid)   # zero dropped points


def test_region_collate_groups(rng):
    ds = make_dataset()
    max_cap = ds.capacity_buckets[-1]
    big = make_scene(rng, int(max_cap * 1.5)) + (0, {})
    small = make_scene(rng, 500) + (1, {})
    batch = ds.collate_batch([big, small])
    assert batch.groups is not None and len(batch.groups) == 2
    assert len(batch.groups[0]) >= 2      # big scene split into regions
    assert batch.groups[1] == [max(batch.groups[0]) + 1]
    # rows fit the buckets and carry only real points
    for g, item in zip(batch.groups, (big, small)):
        total = sum(batch.lengths[r] for r in g)
        assert total >= item[1].shape[0]  # overlap may duplicate points
    assert batch.full is not None
    assert batch.full['xyz_middle_all'][0].shape[0] == big[1].shape[0]


def test_region_restitch_matches_oracle(rng):
    """A region-split + 1-NN restitch of a piecewise-constant labeling
    must reproduce it exactly (each full-res point's nearest crop point
    carries the right label)."""
    ds = make_dataset()
    max_cap = ds.capacity_buckets[-1]
    xyz_v, xyz_mid, _ = make_scene(rng, int(max_cap * 2.2))
    true_label = (xyz_mid[:, 0] > 4).astype(np.int32)
    batch = ds.collate_batch([(xyz_v, xyz_mid, true_label, 0, {})])
    rows = batch.groups[0]
    crop_xyz = np.concatenate(
        [np.asarray(batch.points.feats[r, :batch.lengths[r]])
         for r in rows])
    crop_pred = np.concatenate(
        [np.asarray(batch.points.labels[r, :batch.lengths[r]])
         for r in rows]).astype(np.int32)
    nn = knn_broadcast_labels(crop_xyz,
                              np.arange(len(crop_xyz), dtype=np.int32),
                              batch.full['xyz_middle_all'][0])
    restitched = crop_pred[np.asarray(nn)]
    np.testing.assert_array_equal(restitched, true_label)


def test_default_collate_unchanged(rng):
    """region_eval off: oversized scenes keep the subsample+carry path."""
    ds = make_dataset(region_eval=False)
    max_cap = ds.capacity_buckets[-1]
    big = make_scene(rng, int(max_cap * 1.5)) + (0, {})
    batch = ds.collate_batch([big])
    assert batch.groups is None
    assert batch.points.valid.shape[0] == 1
    assert batch.full is not None
    assert batch.full['xyz_middle_all'][0].shape[0] == big[1].shape[0]
