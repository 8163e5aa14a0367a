import jax.numpy as jnp
import numpy as np

from doda_tpu.ops.voxelize import (devoxelize_feats, voxelize_coords,
                                   voxelize_feats)


def np_voxelize(coords, feats, valid, mode):
    """NumPy oracle of ref voxelize semantics (voxelize.cpp:61-155 +
    voxelize.cu:10-31), with lexicographic voxel ordering."""
    c = coords[valid]
    f = feats[valid]
    uniq, inv = np.unique(c, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), feats.shape[1]), feats.dtype)
    for v in range(len(uniq)):
        rows = f[inv == v]
        if mode == 4:
            out[v] = rows.mean(0)
        elif mode == 3:
            out[v] = rows.sum(0)
        elif mode == 2:
            out[v] = rows[0]
        elif mode == 1:
            out[v] = rows[-1]
    return uniq, inv, out


def setup(rng, n=120, n_valid=100, extent=5, c=4):
    coords = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    valid = np.arange(n) < n_valid
    return coords, feats, valid


def test_voxelize_modes_match_oracle(rng):
    coords, feats, valid = setup(rng)
    grid = voxelize_coords(jnp.asarray(coords), jnp.asarray(valid), 256)
    for mode in (1, 2, 3, 4):
        uniq, _, expect = np_voxelize(coords, feats, valid, mode)
        got = np.asarray(voxelize_feats(jnp.asarray(feats), grid, mode))
        n = len(uniq)
        np.testing.assert_allclose(got[:n], expect, rtol=1e-5, atol=1e-5)
        # padded voxel rows are zero
        assert np.abs(got[n:]).max() == 0


def test_devoxelize_roundtrip(rng):
    coords, feats, valid = setup(rng)
    grid = voxelize_coords(jnp.asarray(coords), jnp.asarray(valid), 256)
    vf = voxelize_feats(jnp.asarray(feats), grid, 4)
    pf = np.asarray(devoxelize_feats(vf, grid))
    # each valid point must see its voxel's mean feature
    uniq, inv, expect = np_voxelize(coords, feats, valid, 4)
    np.testing.assert_allclose(pf[:100], expect[inv], rtol=1e-5, atol=1e-5)
    assert np.abs(pf[100:]).max() == 0


def test_voxelize_grad_flows(rng):
    import jax
    coords, feats, valid = setup(rng)
    grid = voxelize_coords(jnp.asarray(coords), jnp.asarray(valid), 256)

    def loss(f):
        v = voxelize_feats(f, grid, 4)
        return (devoxelize_feats(v, grid) ** 2).sum()

    g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    assert np.isfinite(g).all()
    assert np.abs(g[:100]).sum() > 0
    assert np.abs(g[100:]).max() == 0  # no grad into padding
