"""Data layer tests: mappers, augmentations, collate, config system."""

import numpy as np
import pytest

from doda_tpu.config import CfgNode, cfg_from_list, merge_new_config
from doda_tpu.data.augmentor import aug_ops
from doda_tpu.data.augmentor.augmentor import Queue, SplitSampler
from doda_tpu.data.class_mapper import MAPPERS, get_mapper


def test_class_mappers_match_reference_shape():
    for name in MAPPERS:
        remap, classes = get_mapper(name)
        assert remap.shape == (256,)
        mapped = remap[remap != 255]
        assert len(mapped) and mapped.max() < len(classes)
        # path-style lookup works too
        remap2, _ = get_mapper(f'dataset/class_mapper/{name}.json')
        np.testing.assert_array_equal(remap, remap2)


def test_class_mapper_front3d_scannet_facts():
    remap, classes = get_mapper('3dfront_2_scannet')
    assert classes[-1] == 'desk' and len(classes) == 11
    assert remap[42] == classes.index('floor')
    assert remap[24] == classes.index('desk')
    assert remap[37] == classes.index('wall')
    assert remap[1] == 255  # unmapped raw label


def test_elastic_perturbs_but_preserves_shape(rng):
    xyz = rng.uniform(0, 100, (500, 3))
    out = aug_ops.elastic(xyz.copy(), 6, 40.0 / 50, rng)
    assert out.shape == xyz.shape
    d = np.abs(out - xyz)
    assert d.max() > 0 and d.max() < 20


def test_scene_aug_rotation_preserves_norm(rng):
    xyz = rng.normal(size=(200, 3))
    cfg = {'rotation': {'p': 1.0, 'value': [0.0, 0.0, 1.0]}}
    out = aug_ops.scene_aug(cfg, xyz.copy(), rng)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(xyz, axis=1), rtol=1e-6)


def test_crop_respects_max_npoint(rng):
    xyz = rng.uniform(0, 400, (5000, 3))
    out, valid = aug_ops.crop(xyz, [128, 512], 2e8, 1000, rng)
    assert valid.sum() <= 1000
    kept = out[valid]
    assert (kept >= 0).all()


def test_depth_buffer_visibility_occludes(rng):
    # two concentric shells: inner shell should occlude outer
    def shell(r, n):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return v * r
    inner, outer = shell(1.0, 2000), shell(2.0, 2000)
    pts = np.concatenate([inner, outer])
    vis = aug_ops.depth_buffer_visibility(pts, np.zeros(3))
    assert vis[:2000].mean() > 0.95
    assert vis[2000:].mean() < 0.35


def test_vss_reduces_points(rng):
    # a room: floor plane, one wall, and a dense pillar of 'chair' points
    n_f, n_w, n_c = 30000, 6000, 2000
    floor = np.c_[rng.uniform(0, 5, (n_f, 2)), rng.uniform(0, 0.05, n_f)]
    wall = np.c_[rng.uniform(0, 5, n_w), rng.uniform(0, 0.05, n_w),
                 rng.uniform(0, 3, n_w)]
    pillar = np.c_[rng.uniform(2, 2.5, (n_c, 2)), rng.uniform(0, 3, n_c)]
    xyz = np.concatenate([floor, wall, pillar])
    labels = np.concatenate([np.full(n_f, 1), np.full(n_w, 0),
                             np.full(n_c, 2)])
    n = len(xyz)
    class_names = ['wall', 'floor', 'chair']
    param = {'value': 2, 'mode': 'fixed', 'radius': 1000,
             'camera_view': 180,
             'random_jitter': {'enabled': True, 'value': 0.01, 'p': 1.0}}
    out_xyz, keep = aug_ops.virtual_scan_simulation(
        param, xyz.copy(), labels, class_names, rng)
    assert keep.dtype == bool
    assert 0 < keep.sum() < n  # some occlusion happened


def test_split_space_partitions(rng):
    xyz = rng.uniform(-3, 3, (4000, 3))
    smax, srange = aug_ops.split_space(xyz, [2, 2, 1], rng)
    assert smax.shape == (4, 3)
    counts = np.zeros(4000, np.int32)
    for s in range(4):
        counts += aug_ops.points_in_cuboid(xyz, smax[s], srange[s])
    assert (counts == 1).all()  # exact partition


def test_tacm_mixes_two_clouds(rng):
    xyz1 = rng.uniform(-3, 3, (3000, 3))
    lab1 = rng.integers(0, 5, 3000)
    xyz2 = rng.uniform(-2, 2, (2500, 3))
    lab2 = rng.integers(0, 5, 2500)
    param = {'split': [2, 2, 1], 'p': 1.0, 'mix_ratio': 0.5,
             'permute_cuboid': {'enabled': True, 'p': 0.5},
             'cuboid_queue': {'enabled': False}}
    xyz, label, info = aug_ops.tacm(param, None, list('abcde'),
                                    (xyz1, lab1), (xyz2, lab2), rng)
    assert xyz.shape[0] == label.shape[0] > 0
    assert info['pc1_mask'].sum() + info['pc2_mask'].sum() == len(label)


def test_tacm_with_queue_sampler(rng):
    sampler = SplitSampler({'size': 16, 'num_class': 2})
    ratio = np.array([0.5, 0.3, 0.1, 0.05, 0.05])
    sampler.init_class_ratio({'class_ratio': ratio})
    cq = {'enabled': True, 'size': 16, 'num_cuboid': 2.0, 'num_class': 2,
          'update_class_ratio': True}
    sampler.update_cfg(cq)
    assert set(np.asarray(cq['tail_class_idx'])) == {3, 4}
    # seed queues with fake cuboids
    sampler.update([[np.concatenate([rng.normal(size=(50, 3)),
                                     np.full((50, 1), 3)], 1)],
                    [np.concatenate([rng.normal(size=(50, 3)),
                                     np.full((50, 1), 4)], 1)]])
    param = {'split': [2, 2, 1], 'p': 1.0, 'mix_ratio': 0.3,
             'permute_cuboid': {'enabled': True, 'p': 0.5},
             'cuboid_queue': cq}
    xyz1 = rng.uniform(-3, 3, (3000, 3))
    lab1 = rng.integers(0, 2, 3000)  # no tail classes present
    xyz2 = rng.uniform(-2, 2, (2500, 3))
    lab2 = rng.integers(0, 5, 2500)
    xyz, label, info = aug_ops.tacm(param, sampler, list('abcde'),
                                    (xyz1, lab1), (xyz2, lab2), rng)
    # queue cuboids injected -> tail labels appear in the mix
    assert ((label == 3) | (label == 4)).sum() > 0


def test_queue_ring_buffer(rng):
    q = Queue(4)
    q.update([1, 2, 3])
    assert q.cur_size == 3
    q.update([4, 5])
    assert q.cur_size == 4
    got = q.sample(10, rng)
    assert len(got) == 4


def test_config_merge_and_overrides(tmp_path):
    base = tmp_path / 'base.yaml'
    base.write_text('A: 1\nB:\n  c: 2\n  d: [1, 2]\n')
    child = tmp_path / 'child.yaml'
    child.write_text(f'_BASE_CONFIG_: {base}\nB:\n  c: 3\nE: hi\n')
    cfg = CfgNode()
    import yaml
    merge_new_config(cfg, yaml.safe_load(child.read_text()))
    assert cfg.A == 1 and cfg.B.c == 3 and cfg.E == 'hi'
    cfg_from_list(['B.c', '7', 'B.d', '4,5,6'], cfg)
    assert cfg.B.c == 7 and cfg.B.d == [4, 5, 6]
    with pytest.raises(AssertionError):
        cfg_from_list(['NOPE.x', '1'], cfg)


def test_collate_pads_and_buckets(rng):
    from doda_tpu.data.dataset import Dataset

    cfg = CfgNode({
        'DATA_ROOT': '.', 'DATASET': 'scannet',
        'DATA_PROCESSOR': {'voxel_scale': 50, 'max_npoint': 1000,
                           'full_scale': [128, 512], 'point_range': int(2e8),
                           'voxel_mode': 4, 'cache': False},
        'DATA_CLASS': {'ignore_label': 255,
                       'class_names': ['a', 'b'], 'n_classes': 2},
        'DATA_AUG': {'enabled': False, 'aug_list': []},
    })
    ds = Dataset(cfg, ['a', 'b'], batch_size=2)
    items = []
    for n in (300, 500):
        xyz_v = rng.uniform(0, 100, (n, 3))
        items.append((xyz_v, xyz_v / 50, rng.integers(0, 2, n), 0, {}))
    batch = ds.collate_fn(items)
    pts = batch.points
    assert pts.coords.shape[0] == 2
    assert pts.coords.shape[1] == 512  # bucket >= 500
    assert pts.valid.sum() == 800
    assert (pts.labels[~pts.valid] == 255).all()
