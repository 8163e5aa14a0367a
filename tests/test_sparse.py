"""Golden tests: sparse conv ops vs dense conv oracles on tiny grids."""

import jax
import jax.numpy as jnp
import numpy as np

from doda_tpu.ops.coords import unique_coords
from doda_tpu.ops.sparse import (build_downsample, build_subm_rulebook,
                                 downsample_conv, inverse_conv,
                                 kernel_offsets, subm_conv)


def dense_from_sparse(coords, feats, extent, c):
    dense = np.zeros((extent, extent, extent, c), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return dense


def np_subm_conv(coords, feats, weights, extent):
    """Oracle: dense 3^3 conv evaluated at active sites only, reading only
    active sites (submanifold semantics)."""
    k3, cin, cout = weights.shape
    offs = kernel_offsets(3)
    active = {tuple(xyz): i for i, xyz in enumerate(coords)}
    out = np.zeros((len(coords), cout), np.float32)
    for i, xyz in enumerate(coords):
        for o, off in enumerate(offs):
            nb = tuple(xyz + off)
            j = active.get(nb)
            if j is not None:
                out[i] += feats[j] @ weights[o]
    return out


def make_scene(rng, n=40, extent=6, c=3, cap=64):
    coords = np.unique(rng.integers(0, extent, size=(n, 3)), axis=0)
    coords = coords.astype(np.int32)
    feats = rng.normal(size=(len(coords), c)).astype(np.float32)
    table = unique_coords(jnp.asarray(coords),
                          jnp.ones(len(coords), bool), cap)
    # unique_coords sorts: re-order feats to match table rows
    order = np.asarray(table.p2v)
    feats_t = np.zeros((cap, c), np.float32)
    feats_t[order] = feats
    coords_t = np.asarray(table.coords[:int(table.n)])
    return table, coords_t, feats_t, int(table.n)


def test_subm_conv_matches_dense_oracle(rng):
    table, coords, feats, n = make_scene(rng)
    cin, cout = 3, 5
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    rb = build_subm_rulebook(table, 3)
    out = np.asarray(subm_conv(jnp.asarray(feats), rb, jnp.asarray(w)))
    expect = np_subm_conv(coords, feats[:n], w, 6)
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-4)
    assert np.abs(out[n:]).max() == 0


def test_subm_rulebook_center_is_identity(rng):
    table, _, _, n = make_scene(rng)
    rb = np.asarray(build_subm_rulebook(table, 3))
    np.testing.assert_array_equal(rb[:n, 13], np.arange(n))
    assert (rb[n:] == table.cap).all()


def test_downsample_conv_matches_oracle(rng):
    table, coords, feats, n = make_scene(rng, extent=8, cap=64)
    cin, cout = 3, 4
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    ds = build_downsample(table, 32)
    out = np.asarray(downsample_conv(jnp.asarray(feats), ds,
                                     jnp.asarray(w)))

    # oracle: group children by floor(coord/2); offset = bits
    parents = {}
    for i, xyz in enumerate(coords):
        p = tuple(xyz // 2)
        o = (xyz[0] & 1) * 4 + (xyz[1] & 1) * 2 + (xyz[2] & 1)
        parents.setdefault(p, []).append((o, i))
    uniq_parents = sorted(parents)
    pn = int(ds.parent.n)
    assert pn == len(uniq_parents)
    p_coords = np.asarray(ds.parent.coords[:pn])
    np.testing.assert_array_equal(p_coords, np.array(uniq_parents))
    expect = np.zeros((pn, cout), np.float32)
    for pi, p in enumerate(uniq_parents):
        for o, i in parents[p]:
            expect[pi] += feats[i] @ w[o]
    np.testing.assert_allclose(out[:pn], expect, rtol=1e-4, atol=1e-4)


def test_inverse_conv_matches_oracle(rng):
    table, coords, feats, n = make_scene(rng, extent=8, cap=64)
    ds = build_downsample(table, 32)
    pn = int(ds.parent.n)
    cin, cout = 4, 3
    pf = rng.normal(size=(32, cin)).astype(np.float32)
    pf[pn:] = 0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    out = np.asarray(inverse_conv(jnp.asarray(pf), ds, jnp.asarray(w)))
    # each child gets parent_feat @ w[child_offset]
    cp = np.asarray(ds.child_parent)
    co = np.asarray(ds.child_offset)
    for i in range(n):
        np.testing.assert_allclose(out[i], pf[cp[i]] @ w[co[i]],
                                   rtol=1e-4, atol=1e-4)
    assert np.abs(out[n:]).max() == 0


def test_conv_grads_finite(rng):
    table, _, feats, n = make_scene(rng)
    rb = build_subm_rulebook(table, 3)
    w = jnp.asarray(rng.normal(size=(27, 3, 3)).astype(np.float32))

    def loss(f, w):
        return (subm_conv(f, rb, w) ** 2).sum()

    gf, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats), w)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert np.abs(np.asarray(gf)[n:]).max() == 0
