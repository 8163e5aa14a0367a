"""Offset-convention pointops wrappers vs a NumPy oracle (component #22g,
ref lib/pointops2/functions/{pointops,pointops2,pointops_ablation}.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

import doda_tpu.ops.pointops_offsets as pof


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _two_scenes(rng, n1=40, n2=25):
    xyz = rng.normal(size=(n1 + n2, 3)).astype(np.float32)
    xyz[n1:] += 50.0        # far apart: cross-scene neighbors are wrong
    legacy = np.array([n1, n1 + n2])
    lead0 = np.array([0, n1, n1 + n2])
    return xyz, legacy, lead0


def _oracle_knn(k, xyz, new_xyz, spans):
    idx = np.zeros((len(new_xyz), k), np.int64)
    dist = np.zeros((len(new_xyz), k), np.float32)
    for s, e in spans:
        d = np.linalg.norm(new_xyz[s:e, None] - xyz[None, s:e], axis=-1)
        order = np.argsort(d, axis=1)[:, :k]
        idx[s:e] = order + s
        dist[s:e] = np.take_along_axis(d, order, axis=1)
    return idx, dist


def test_knnquery_both_conventions(rng):
    xyz, legacy, lead0 = _two_scenes(rng)
    oracle_idx, oracle_d = _oracle_knn(4, xyz, xyz, [(0, 40), (40, 65)])
    for off in (legacy, lead0):
        idx, dist = pof.knnquery(4, xyz, None, off, off)
        # ties can permute equal-distance columns; compare sorted dists.
        # tolerance: the core computes d2 = |q|^2+|b|^2-2qb on the MXU,
        # losing ~1e-2 relative vs the oracle's direct norm
        np.testing.assert_allclose(np.sort(np.asarray(dist), axis=1),
                                   np.sort(oracle_d, axis=1),
                                   rtol=3e-2, atol=5e-3)
        # scene isolation: global indices stay inside the query's scene
        assert (np.asarray(idx)[:40] < 40).all()
        assert (np.asarray(idx)[40:] >= 40).all()


def test_knnquery_short_segment_pads(rng):
    xyz, _, _ = _two_scenes(rng, n1=3, n2=10)
    idx, dist = pof.knnquery(8, xyz, None, np.array([3, 13]),
                             np.array([3, 13]))
    idx = np.asarray(idx)
    assert idx.shape == (13, 8)
    assert (idx[:3] < 3).all()          # padded columns repeat in-scene ids


def test_furthestsampling_global_indices(rng):
    xyz, legacy, _ = _two_scenes(rng)
    sel = np.asarray(pof.furthestsampling(xyz, legacy, np.array([5, 10])))
    assert sel.shape == (10,)
    assert (sel[:5] < 40).all() and (sel[5:] >= 40).all()
    assert sel[0] == 0 and sel[5] == 40      # ref starts each scene at 0
    assert len(np.unique(sel)) == 10


def test_queryandgroup_variants(rng):
    xyz, legacy, _ = _two_scenes(rng)
    feat = rng.normal(size=(65, 6)).astype(np.float32)
    nf = np.asarray(pof.queryandgroup(4, xyz, None, feat, None,
                                      legacy, legacy))
    assert nf.shape == (65, 4, 9)
    # self is its own nearest neighbor: diff column 0 is ~0
    np.testing.assert_allclose(nf[:, 0, :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(nf[:, 0, 3:], feat, atol=1e-6)

    nf2, gxyz = pof.queryandgroup(4, xyz, None, feat, None, legacy, legacy,
                                  return_grouped_xyz=True)
    np.testing.assert_allclose(np.asarray(nf2), nf, atol=0)
    np.testing.assert_allclose(np.asarray(gxyz)[:, 0], xyz, atol=1e-6)

    nf3 = np.asarray(pof.queryandgroup(4, xyz, None, feat, None, legacy,
                                       legacy, relative=False))
    np.testing.assert_allclose(nf3[:, 0, :3], xyz, atol=1e-6)


def test_interpolation_matches_reference_weighting(rng):
    xyz, legacy, _ = _two_scenes(rng)
    feat = rng.normal(size=(65, 4)).astype(np.float32)
    q = xyz + rng.normal(scale=0.05, size=xyz.shape).astype(np.float32)
    out = np.asarray(pof.interpolation(xyz, q, feat, legacy, legacy, k=3))

    # weighting-formula parity (1/(d+eps), ref pointops2.py:192-194), on
    # the implementation's own neighbor picks with exact distances — the
    # k-set itself is covered by test_knnquery_both_conventions
    idx, dist = pof.knnquery(3, xyz, q, legacy, legacy)
    idx, dist = np.asarray(idx), np.asarray(dist)
    # 1/(d+eps) is ill-conditioned at tiny d, so feed the oracle the
    # implementation's own distances; the distances themselves are
    # checked (vs exact norms) in test_knnquery_both_conventions
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    expect = (feat[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)
    assert pof.interpolation2 is pof.interpolation


def test_subtraction_aggregation_reexports(rng):
    feat = rng.normal(size=(10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, (10, 3))
    out = np.asarray(pof.subtraction(jnp.asarray(feat), jnp.asarray(feat),
                                     jnp.asarray(idx)))
    np.testing.assert_allclose(out, feat[:, None] - feat[idx], atol=1e-6)
