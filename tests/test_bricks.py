"""Brick engine must agree with the (oracle-verified) gather engine."""

import jax.numpy as jnp
import numpy as np

from doda_tpu.ops import bricks
from doda_tpu.ops.coords import unique_coords
from doda_tpu.ops.sparse import (build_downsample, build_subm_rulebook,
                                 downsample_conv, inverse_conv, subm_conv)

F32 = jnp.float32


def make_scene(rng, n=200, extent=14):
    coords = np.unique(rng.integers(0, extent, size=(n, 3)), axis=0)
    coords = coords.astype(np.int32)
    feats = rng.normal(size=(len(coords), 6)).astype(np.float32)
    return coords, feats


def voxel_setup(coords, feats, cap=512):
    table = unique_coords(jnp.asarray(coords), jnp.ones(len(coords), bool),
                          cap)
    vfeats = np.zeros((cap, feats.shape[1]), np.float32)
    vfeats[np.asarray(table.p2v)] = feats
    return table, jnp.asarray(vfeats)


def brick_setup(coords, feats, b_cap=64):
    n_cap = 256
    c = np.zeros((n_cap, 3), np.int32)
    c[:len(coords)] = coords
    valid = np.arange(n_cap) < len(coords)
    grid = bricks.brickify(jnp.asarray(c), jnp.asarray(valid), b_cap)
    f = np.zeros((n_cap, feats.shape[1]), np.float32)
    f[:len(coords)] = feats
    bf = bricks.brick_feats(jnp.asarray(f), grid, 4)
    return grid, bf, jnp.asarray(c), jnp.asarray(valid), jnp.asarray(f)


def cellwise(grid, bf, coords):
    """Extract brick-engine values at given voxel coords."""
    b_cap = grid.b_cap
    from doda_tpu.ops.coords import lookup_packed as lookup
    bid = np.asarray(lookup(grid.table, jnp.asarray(coords // bricks.BRICK)))
    cell = np.asarray(bricks._cell_index(jnp.asarray(coords % bricks.BRICK)))
    out = np.asarray(bf)
    return out[bid, cell]


def test_brickify_roundtrip(rng):
    coords, feats = make_scene(rng)
    grid, bf, c, valid, f = brick_setup(coords, feats)
    assert int(grid.num_voxels) == len(coords)
    # mean-reduce then broadcast back must reproduce feats (unique coords)
    back = np.asarray(bricks.unbrick_feats(bf, grid))
    np.testing.assert_allclose(back[:len(coords)], feats, rtol=1e-5)
    assert np.abs(back[len(coords):]).max() == 0


def test_subm_conv3_matches_gather_engine(rng):
    coords, feats = make_scene(rng)
    w = rng.normal(size=(27, 6, 8)).astype(np.float32)

    table, vfeats = voxel_setup(coords, feats)
    rb = build_subm_rulebook(table, 3)
    ref = np.asarray(subm_conv(vfeats, rb, jnp.asarray(w)))
    n = int(table.n)
    ref_coords = np.asarray(table.coords[:n])

    grid, bf, *_ = brick_setup(coords, feats)
    nbr = bricks.build_brick_rulebook(grid.table)
    out = bricks.subm_conv3(bf, grid.occ, nbr, jnp.asarray(w),
                            compute_dtype=F32)
    got = cellwise(grid, out, ref_coords)
    np.testing.assert_allclose(got, ref[:n], rtol=1e-4, atol=1e-4)


def test_down_conv2_matches_gather_engine(rng):
    coords, feats = make_scene(rng)
    w = rng.normal(size=(8, 6, 7)).astype(np.float32)

    table, vfeats = voxel_setup(coords, feats)
    ds = build_downsample(table, 256)
    ref = np.asarray(downsample_conv(vfeats, ds, jnp.asarray(w)))
    pn = int(ds.parent.n)
    ref_coords = np.asarray(ds.parent.coords[:pn])

    grid, bf, *_ = brick_setup(coords, feats)
    bds = bricks.build_brick_downsample(grid.table, grid.occ, 32)
    out = bricks.down_conv2(bf, bds, jnp.asarray(w), compute_dtype=F32)

    from doda_tpu.ops.coords import lookup_packed as lookup
    bid = np.asarray(lookup(bds.parent, jnp.asarray(ref_coords // bricks.BRICK)))
    cell = np.asarray(bricks._cell_index(jnp.asarray(ref_coords % bricks.BRICK)))
    got = np.asarray(out)[bid, cell]
    np.testing.assert_allclose(got, ref[:pn], rtol=1e-4, atol=1e-4)
    # parent occupancy matches the gather-engine parent table
    assert int(np.asarray(bds.parent_occ).sum()) == pn


def test_up_conv2_matches_gather_engine(rng):
    coords, feats = make_scene(rng)
    table, vfeats = voxel_setup(coords, feats)
    ds = build_downsample(table, 256)
    pn = int(ds.parent.n)
    pfeats = rng.normal(size=(256, 5)).astype(np.float32)
    pfeats[pn:] = 0
    w = rng.normal(size=(8, 5, 6)).astype(np.float32)
    ref = np.asarray(inverse_conv(jnp.asarray(pfeats), ds, jnp.asarray(w)))
    n = int(table.n)
    ref_coords = np.asarray(table.coords[:n])

    grid, bf, *_ = brick_setup(coords, feats)
    bds = bricks.build_brick_downsample(grid.table, grid.occ, 32)
    # place parent voxel features into parent bricks
    p_coords = np.asarray(ds.parent.coords[:pn])
    from doda_tpu.ops.coords import lookup_packed as lookup
    pbid = np.asarray(lookup(bds.parent, jnp.asarray(p_coords // bricks.BRICK)))
    pcell = np.asarray(bricks._cell_index(jnp.asarray(p_coords % bricks.BRICK)))
    pbf = np.zeros((32, bricks.CELLS, 5), np.float32)
    pbf[pbid, pcell] = pfeats[:pn]
    out = bricks.up_conv2(jnp.asarray(pbf), grid.occ, bds, jnp.asarray(w),
                          compute_dtype=F32)
    got = cellwise(grid, out, ref_coords)
    np.testing.assert_allclose(got, ref[:n], rtol=1e-4, atol=1e-4)


def test_subm_conv3_masks_inactive(rng):
    coords, feats = make_scene(rng)
    grid, bf, *_ = brick_setup(coords, feats)
    nbr = bricks.build_brick_rulebook(grid.table)
    w = rng.normal(size=(27, 6, 8)).astype(np.float32)
    out = np.asarray(bricks.subm_conv3(bf, grid.occ, nbr, jnp.asarray(w),
                                       compute_dtype=F32))
    occ = np.asarray(grid.occ)
    assert np.abs(out[~occ]).max() == 0


def test_brick_feats_2d_matches_3d():
    """Wide-lane brick_feats_2d == brick_feats reshaped (mean + sum)."""
    import numpy as np
    import jax.numpy as jnp
    from doda_tpu.ops import bricks

    rng = np.random.default_rng(11)
    coords = rng.integers(0, 16, (2048, 3)).astype(np.int32)
    valid = rng.random(2048) < 0.9
    g = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), 128)
    feats = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
    for mode in (3, 4):
        want = np.asarray(bricks.brick_feats(feats, g, mode)).reshape(
            128, -1)
        got = np.asarray(bricks.brick_feats_2d(feats, g, mode))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_brick_feats_sorted_matches_scatter(monkeypatch):
    """The sort+cumsum feats path (default) equals the segment-sum
    scatter path for sum and mean modes, including invalid points and
    empty scenes."""
    import os
    rng = np.random.default_rng(17)
    coords = rng.integers(0, 40, (5000, 3)).astype(np.int32)
    valid = rng.random(5000) < 0.9
    g = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), 1024)
    feats = jnp.asarray(rng.normal(size=(5000, 3)).astype(np.float32))
    for mode in (3, 4):
        monkeypatch.setenv('DODA_FEATS', 'scatter')
        want = np.asarray(bricks.brick_feats_2d(feats, g, mode))
        monkeypatch.delenv('DODA_FEATS')
        got = np.asarray(bricks.brick_feats_2d(feats, g, mode))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_brickify_matches_plain_dedup():
    """brickify's fused (key, cell) sort must produce the same table,
    p2v and occ as a plain unique_coords_packed dedup, and its carried
    sort stream must be (brick, cell)-ordered."""
    import numpy as np
    import jax.numpy as jnp
    from doda_tpu.ops import bricks
    from doda_tpu.ops.coords import unique_coords_packed
    rng = np.random.default_rng(9)
    coords = rng.integers(0, 40, (5000, 3)).astype(np.int32)
    valid = rng.random(5000) < 0.9
    for cap in (2048, 64):     # 64 forces brick overflow
        g = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), cap)
        t = unique_coords_packed(jnp.asarray(coords) // bricks.BRICK,
                                 jnp.asarray(valid), cap)
        np.testing.assert_array_equal(np.asarray(g.table.coords),
                                      np.asarray(t.coords))
        np.testing.assert_array_equal(np.asarray(g.table.p2v),
                                      np.asarray(t.p2v))
        assert int(g.table.n) == int(t.n)
        sc = np.asarray(g.sort_cell)
        sp = np.asarray(g.sort_pos)
        sent = np.iinfo(np.int32).max
        real = sc != sent
        assert np.all(np.diff(sc[real]) >= 0)          # sorted stream
        # the stream pairs each original point with its flat cell id
        flat = np.asarray(g.flat_index())
        want = np.where(flat[sp] >= cap * bricks.CELLS, sent, flat[sp])
        np.testing.assert_array_equal(sc, want)
