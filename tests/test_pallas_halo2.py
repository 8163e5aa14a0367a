"""Gen-2 fused halo-conv kernel + piece-major XLA path vs the oracle.

Covers: cell-exact forward (incl. channel chunking past C_CHUNK),
custom-VJP grads, and the piece-major extraction layout invariant.
Runs the kernel in interpreter mode on CPU (same harness as
test_pallas_halo.py); the compiled kernel is exercised on the real chip
by bench.py's kernel-vs-oracle assertion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doda_tpu.ops import bricks

F32 = jnp.float32


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault('interpret', True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', patched)
    import doda_tpu.ops.pallas_halo2 as ph2
    monkeypatch.setattr(ph2.pl, 'pallas_call', patched)
    yield


def setup_scene(rng, n=3000, extent=30, b_cap=16, c=6):
    coords = rng.integers(0, extent, (4096, 3)).astype(np.int32)
    valid = np.arange(4096) < n
    grid = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), b_cap)
    nbr = bricks.build_brick_rulebook(grid.table)
    feats = rng.normal(size=(b_cap, bricks.CELLS, c)).astype(np.float32)
    feats = feats * np.asarray(grid.occ)[..., None]
    return grid, nbr, jnp.asarray(feats)


def test_extract_pieces_layout(rng):
    """Piece p rows [start, start+n) hold exactly the cells direction-o
    neighbors read (the shell cells, x-y-z raster order)."""
    x4 = jnp.asarray(rng.normal(size=(3, 4, 4, 4, 5)).astype(np.float32))
    tab = np.asarray(bricks.extract_pieces(x4))
    plan, total = bricks._piece_plan()
    assert tab.shape == (3, total, 5)
    for o, (sx, sy, sz), _, st, n in plan:
        expect = np.asarray(x4)[:, sx, sy, sz].reshape(3, -1, 5)
        np.testing.assert_array_equal(tab[:, st:st + n], expect)


def test_subm_conv3_v2_matches_oracle(rng):
    grid, nbr, feats = setup_scene(rng)
    w = jnp.asarray(rng.normal(size=(27, 6, 8)).astype(np.float32))
    expect = bricks.subm_conv3(feats, grid.occ, nbr, w, compute_dtype=F32)
    got = bricks.subm_conv3_v2(feats, grid.occ, nbr, w, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_halo_conv2_matches_oracle(rng):
    from doda_tpu.ops.pallas_halo2 import halo_conv2
    grid, nbr, feats = setup_scene(rng)
    w = jnp.asarray(rng.normal(size=(27, 6, 8)).astype(np.float32))
    expect = bricks.subm_conv3(feats, grid.occ, nbr, w, compute_dtype=F32)
    got = halo_conv2(feats, grid.occ, nbr, w, F32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_halo_conv2_channel_chunking(rng):
    """cin/cout past C_CHUNK are split across kernel calls; results must
    still be exact."""
    from doda_tpu.ops.pallas_halo2 import C_CHUNK, halo_conv2
    c = C_CHUNK + 8
    grid, nbr, feats = setup_scene(rng, c=c)
    w = jnp.asarray(rng.normal(size=(27, c, C_CHUNK + 4)).astype(np.float32))
    expect = bricks.subm_conv3(feats, grid.occ, nbr, w, compute_dtype=F32)
    got = halo_conv2(feats, grid.occ, nbr, w, F32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_halo_conv2_grads_match_oracle(rng):
    from doda_tpu.ops.pallas_halo2 import halo_conv2
    grid, nbr, feats = setup_scene(rng, b_cap=8, c=4)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))

    def loss_pl(f, w):
        return (halo_conv2(f, grid.occ, nbr, w, F32) ** 2).sum()

    def loss_xla(f, w):
        return (bricks.subm_conv3(f, grid.occ, nbr, w,
                                  compute_dtype=F32) ** 2).sum()

    gx_p, gw_p = jax.grad(loss_pl, argnums=(0, 1))(feats, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(feats, w)
    occ = np.asarray(grid.occ)
    np.testing.assert_allclose(np.asarray(gx_p)[occ], np.asarray(gx_x)[occ],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-3, atol=1e-3)


def test_banded_weights_roundtrip(rng):
    """_unband_dw is the exact transpose of _banded_weights."""
    from doda_tpu.ops.pallas_halo2 import (_band_map, _banded_weights,
                                           _unband_dw)
    w = jnp.asarray(rng.normal(size=(27, 3, 5)).astype(np.float32))
    wb = _banded_weights(w)
    # every tap appears BRICK x BRICK = 16 times in the banded form
    back = _unband_dw(wb, 3, 5)
    np.testing.assert_allclose(np.asarray(back), 16 * np.asarray(w),
                               rtol=1e-5)
    m = _band_map()
    assert m.sum() == 3 * 16 * 9  # 27 taps x 16 (y,z) outputs
