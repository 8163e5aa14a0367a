import jax.numpy as jnp
import numpy as np

from doda_tpu.ops.coords import lookup, pad_rows, unique_coords


def make_coords(rng, n, extent=20, n_valid=None):
    coords = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    valid = np.ones(n, dtype=bool)
    if n_valid is not None:
        valid[n_valid:] = False
    return coords, valid


def np_unique(coords, valid):
    uniq = np.unique(coords[valid], axis=0)  # lexicographic rows
    return uniq


def test_unique_matches_numpy(rng):
    coords, valid = make_coords(rng, 200, extent=8, n_valid=150)
    cap = 256
    t = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)
    uniq = np_unique(coords, valid)
    assert int(t.n) == len(uniq)
    np.testing.assert_array_equal(np.asarray(t.coords[:len(uniq)]), uniq)
    # p2v pairing: every valid point maps to its own coord's table row
    p2v = np.asarray(t.p2v)
    for i in range(150):
        np.testing.assert_array_equal(np.asarray(t.coords)[p2v[i]], coords[i])
    # padded points -> null slot
    assert (p2v[150:] == cap).all()


def test_unique_overflow_clamps(rng):
    coords, valid = make_coords(rng, 100, extent=50)
    cap = 8
    t = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)
    assert int(t.n) <= cap
    assert np.asarray(t.p2v).max() <= cap


def test_unique_all_invalid():
    coords = np.zeros((10, 3), np.int32)
    valid = np.zeros(10, bool)
    t = unique_coords(jnp.asarray(coords), jnp.asarray(valid), 4)
    assert int(t.n) == 0
    assert (np.asarray(t.p2v) == 4).all()


def test_lookup_hits_and_misses(rng):
    coords, valid = make_coords(rng, 300, extent=10, n_valid=250)
    cap = 512
    t = unique_coords(jnp.asarray(coords), jnp.asarray(valid), cap)
    n = int(t.n)
    table_np = np.asarray(t.coords[:n])

    # every table coord must be found at its own position
    idx = np.asarray(lookup(t, jnp.asarray(table_np)))
    np.testing.assert_array_equal(idx, np.arange(n))

    # coords guaranteed absent (outside extent) must miss -> cap
    misses = np.array([[11, 0, 0], [0, -1, 0], [3, 3, 100]], np.int32)
    idx = np.asarray(lookup(t, jnp.asarray(misses)))
    assert (idx == cap).all()

    # invalid queries must miss
    idx = np.asarray(lookup(t, jnp.asarray(table_np[:3]),
                            jnp.zeros(3, dtype=bool)))
    assert (idx == cap).all()


def test_lookup_multidim_queries(rng):
    coords, valid = make_coords(rng, 64, extent=6)
    t = unique_coords(jnp.asarray(coords), jnp.asarray(valid), 128)
    q = np.asarray(t.coords[:4]).reshape(2, 2, 3)
    idx = np.asarray(lookup(t, jnp.asarray(q)))
    assert idx.shape == (2, 2)
    np.testing.assert_array_equal(idx.reshape(-1), np.arange(4))


def test_pad_rows():
    x = jnp.ones((3, 2))
    p = pad_rows(x)
    assert p.shape == (4, 2)
    assert (np.asarray(p[3]) == 0).all()


def test_unique_coords_packed_matches_two_key():
    from doda_tpu.ops.coords import (lookup, lookup_packed, unique_coords,
                                     unique_coords_packed)
    rng = np.random.default_rng(9)
    coords = rng.integers(0, 500, (3000, 3)).astype(np.int32)
    valid = rng.random(3000) < 0.9
    a = unique_coords(jnp.asarray(coords), jnp.asarray(valid), 4096)
    b = unique_coords_packed(jnp.asarray(coords), jnp.asarray(valid), 4096)
    np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
    np.testing.assert_array_equal(np.asarray(a.p2v), np.asarray(b.p2v))
    assert int(a.n) == int(b.n)
    q = rng.integers(-2, 502, (500, 3)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(lookup(a, jnp.asarray(q))),
        np.asarray(lookup_packed(b, jnp.asarray(q))))


def test_unique_coords_packed_drops_out_of_range():
    from doda_tpu.ops.coords import unique_coords_packed
    coords = np.array([[5, 5, 5], [1024, 0, 0], [0, 2000, 3], [7, 7, 7]],
                      np.int32)
    t = unique_coords_packed(jnp.asarray(coords),
                             jnp.ones(4, bool), 16)
    assert int(t.n) == 2          # the two in-range coords
    p2v = np.asarray(t.p2v)
    assert (p2v[[1, 2]] == 16).all()   # out-of-range -> null slot
