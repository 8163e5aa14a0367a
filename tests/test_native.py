"""Native host-ops lib vs NumPy fallbacks (both paths exercised)."""

import numpy as np
import pytest

from doda_tpu.native import host_ops


def test_voxelize_unique_first_appearance(rng):
    coords = rng.integers(0, 5, (500, 3)).astype(np.int32)
    p2v, vox = host_ops.voxelize_unique(coords)
    # pairing correct
    np.testing.assert_array_equal(vox[p2v], coords)
    # first-appearance order (reference insert-order semantics)
    seen = {}
    expect = []
    for c in map(tuple, coords):
        if c not in seen:
            seen[c] = len(seen)
            expect.append(c)
    np.testing.assert_array_equal(vox, np.array(expect))


def test_voxelize_mean(rng):
    coords = rng.integers(0, 3, (100, 3)).astype(np.int32)
    feats = rng.normal(size=(100, 4)).astype(np.float32)
    p2v, vox = host_ops.voxelize_unique(coords)
    out = host_ops.voxelize_mean(feats, p2v, len(vox))
    for v in range(len(vox)):
        np.testing.assert_allclose(out[v], feats[p2v == v].mean(0),
                                   rtol=1e-5, atol=1e-6)


def test_nn1_matches_kdtree(rng):
    src = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(200, 3)).astype(np.float32)
    idx = host_ops.nn1(src, q, cell=0.3)
    from scipy.spatial import cKDTree
    expect = cKDTree(src).query(q, k=1)[1]
    d_got = ((src[idx] - q) ** 2).sum(1)
    d_exp = ((src[expect] - q) ** 2).sum(1)
    np.testing.assert_allclose(d_got, d_exp, rtol=1e-5, atol=1e-6)


def test_connected_components(rng):
    blob = lambda c: rng.normal(size=(40, 3)).astype(np.float32) * 0.05 + c
    xyz = np.concatenate([blob(0.0), blob(5.0), blob(10.0)])
    key = np.concatenate([np.zeros(40), np.zeros(40),
                          np.ones(40)]).astype(np.int32)
    out = host_ops.connected_components(xyz, key, radius=1.0)
    assert len(np.unique(out)) == 3
    assert len(np.unique(out[:40])) == 1
    assert out[0] != out[40]


def test_native_lib_loaded():
    # the .so is built in-repo by `make -C doda_tpu/native`; if this
    # fails the NumPy fallbacks covered above still apply
    if not host_ops.native_available():
        pytest.skip('native lib not built')
    assert host_ops.native_available()


def test_elastic_interp_matches_numpy():
    """Native trilinear elastic lookup == the NumPy reference path."""
    import numpy as np
    from doda_tpu.native import host_ops
    from doda_tpu.data.augmentor import aug_ops
    if not host_ops.native_available():
        import pytest
        pytest.skip('native lib not built')
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-40, 200, (20000, 3))
    # include out-of-grid points (clip pushes some past the grid)
    xyz[:50] *= 10
    dims = (np.abs(xyz).max(0).astype(np.int32) // 6 + 3)
    # shrink dims to force plenty of oob queries too
    dims = np.maximum(dims // 2, 4)
    noise = [rng.standard_normal(dims).astype(np.float32)
             for _ in range(3)]
    want = xyz + aug_ops._trilinear_regular(noise, dims, 6, xyz) * 40.0
    got = host_ops.elastic_interp(
        np.stack([n.reshape(-1) for n in noise]), dims, 6.0, 40.0, xyz)
    assert got is not None
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
