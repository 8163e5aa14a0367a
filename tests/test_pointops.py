"""pointops parity tests vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from doda_tpu.ops import pointops as po


def test_knn_matches_numpy(rng):
    base = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    idx, dist = po.knn(5, jnp.asarray(q), jnp.asarray(base), chunk=16)
    d = ((q[:, None, :] - base[None]) ** 2).sum(-1)
    expect = np.argsort(d, axis=1)[:, :5]
    got = np.sort(np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.sort(expect, 1), got)
    np.testing.assert_allclose(np.asarray(dist)[:, 0], np.sqrt(d.min(1)),
                               rtol=1e-4, atol=1e-5)


def test_knn_respects_validity(rng):
    base = rng.normal(size=(100, 3)).astype(np.float32)
    valid = np.arange(100) < 10
    q = base[:5]
    idx, _ = po.knn(3, jnp.asarray(q), jnp.asarray(base),
                    base_valid=jnp.asarray(valid), chunk=8)
    assert np.asarray(idx).max() < 10


def test_fps_spreads_points(rng):
    # two clusters far apart: fps must pick from both
    a = rng.normal(size=(100, 3)).astype(np.float32)
    b = a + 100.0
    xyz = np.concatenate([a, b])
    sel = np.asarray(po.furthest_point_sampling(jnp.asarray(xyz), 10))
    assert sel[0] == 0
    assert (sel < 100).any() and (sel >= 100).any()
    assert len(np.unique(sel)) == 10


def test_interpolation_exact_at_sources(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    feats = rng.normal(size=(50, 4)).astype(np.float32)
    out = np.asarray(po.interpolation(jnp.asarray(src), jnp.asarray(src),
                                      jnp.asarray(feats)))
    np.testing.assert_allclose(out, feats, rtol=1e-3, atol=1e-3)


def test_ballquery_radius(rng):
    xyz = rng.uniform(0, 4, (200, 3)).astype(np.float32)
    idx, cnt = po.ballquery(jnp.asarray(xyz), 0.5, 16, chunk=32)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    d = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    for i in range(0, 200, 37):
        inside = np.nonzero(d[i] <= 0.25)[0]
        got = idx[i][idx[i] >= 0]
        assert cnt[i] == len(got)
        assert set(got) <= set(inside)
        assert len(got) == min(len(inside), 16)


def test_bfs_cluster_components(rng):
    # three well-separated blobs, two share a semantic label
    blob = lambda c: rng.normal(size=(40, 3)).astype(np.float32) * 0.1 + c
    xyz = np.concatenate([blob(0.0), blob(5.0), blob(10.0)])
    sem = np.concatenate([np.zeros(40), np.zeros(40), np.ones(40)])
    valid = np.ones(120, bool)
    idx, _ = po.ballquery(jnp.asarray(xyz), 1.0, 32, chunk=32)
    labels = np.asarray(po.bfs_cluster(idx, jnp.asarray(sem.astype(np.int32)),
                                       jnp.asarray(valid)))
    assert len(np.unique(labels)) == 3
    assert len(np.unique(labels[:40])) == 1
    assert len(np.unique(labels[40:80])) == 1
    assert labels[0] != labels[40]  # same semantic, disconnected


def test_sec_reductions(rng):
    feats = rng.normal(size=(20, 3)).astype(np.float32)
    offsets = jnp.asarray(np.array([0, 5, 12, 20], np.int32))
    mean = np.asarray(po.sec_mean(jnp.asarray(feats), offsets))
    np.testing.assert_allclose(mean[0], feats[:5].mean(0), rtol=1e-5)
    np.testing.assert_allclose(mean[2], feats[12:].mean(0), rtol=1e-5)
    mx = np.asarray(po.sec_max(jnp.asarray(feats), offsets))
    np.testing.assert_allclose(mx[1], feats[5:12].max(0), rtol=1e-5)
    mn = np.asarray(po.sec_min(jnp.asarray(feats), offsets))
    np.testing.assert_allclose(mn[1], feats[5:12].min(0), rtol=1e-5)


def test_roipool_and_get_iou(rng):
    feats = rng.normal(size=(30, 4)).astype(np.float32)
    pids = np.array([0] * 10 + [1] * 10 + [-1] * 10, np.int32)
    out = np.asarray(po.roipool(jnp.asarray(feats), jnp.asarray(pids), 2))
    np.testing.assert_allclose(out[0], feats[:10].max(0), rtol=1e-5)
    np.testing.assert_allclose(out[1], feats[10:20].max(0), rtol=1e-5)

    inst = np.array([0] * 10 + [1] * 5 + [0] * 5 + [-1] * 10, np.int32)
    iou = np.asarray(po.get_iou(jnp.asarray(pids), jnp.asarray(inst), 2, 2))
    np.testing.assert_allclose(iou[0, 0], 10 / 15, rtol=1e-5)
    np.testing.assert_allclose(iou[1, 1], 5 / 10, rtol=1e-5)


def test_subtraction_aggregation(rng):
    f1 = rng.normal(size=(10, 6)).astype(np.float32)
    f2 = rng.normal(size=(10, 6)).astype(np.float32)
    idx = rng.integers(0, 10, (10, 4)).astype(np.int32)
    sub = np.asarray(po.subtraction(jnp.asarray(f1), jnp.asarray(f2),
                                    jnp.asarray(idx)))
    np.testing.assert_allclose(sub[3, 2], f1[3] - f2[idx[3, 2]], rtol=1e-6)

    pos = rng.normal(size=(10, 4, 6)).astype(np.float32)
    w = rng.normal(size=(10, 4, 3)).astype(np.float32)  # c // w_c = 2
    agg = np.asarray(po.aggregation(jnp.asarray(f1), jnp.asarray(pos),
                                    jnp.asarray(w), jnp.asarray(idx)))
    expect = np.zeros((10, 6))
    for i in range(10):
        for s in range(4):
            g = (f1[idx[i, s]] + pos[i, s]).reshape(3, 2)
            expect[i] += (g * w[i, s][:, None]).reshape(-1)
    np.testing.assert_allclose(agg, expect, rtol=1e-4, atol=1e-5)


def test_knn_broadcast_labels(rng):
    sub = rng.normal(size=(30, 3))
    labels = rng.integers(0, 5, 30)
    out = po.knn_broadcast_labels(sub, labels, sub + 1e-6)
    np.testing.assert_array_equal(out, labels)
