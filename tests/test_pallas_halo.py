"""Pallas fused halo-conv vs the XLA brick engine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doda_tpu.ops import bricks

F32 = jnp.float32


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run Pallas kernels in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault('interpret', True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', patched)
    import doda_tpu.ops.pallas_halo as ph
    monkeypatch.setattr(ph.pl, 'pallas_call', patched)
    yield


def setup_scene(rng, n=3000, extent=30, b_cap=16, c=6):
    coords = rng.integers(0, extent, (4096, 3)).astype(np.int32)
    valid = np.arange(4096) < n
    grid = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), b_cap)
    nbr = bricks.build_brick_rulebook(grid.table)
    feats = rng.normal(size=(b_cap, bricks.CELLS, c)).astype(np.float32)
    feats = feats * np.asarray(grid.occ)[..., None]
    return grid, nbr, jnp.asarray(feats)


def test_halo_conv_matches_subm_conv3(rng):
    from doda_tpu.ops.pallas_halo import halo_conv
    grid, nbr, feats = setup_scene(rng)
    w = jnp.asarray(rng.normal(size=(27, 6, 8)).astype(np.float32))
    expect = bricks.subm_conv3(feats, grid.occ, nbr, w, compute_dtype=F32)
    got = halo_conv(feats, grid.occ, nbr, w, F32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_halo_conv_grads_match_xla(rng):
    from doda_tpu.ops.pallas_halo import halo_conv
    grid, nbr, feats = setup_scene(rng, b_cap=8, c=4)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))

    def loss_pl(f, w):
        return (halo_conv(f, grid.occ, nbr, w, F32) ** 2).sum()

    def loss_xla(f, w):
        return (bricks.subm_conv3(f, grid.occ, nbr, w,
                                  compute_dtype=F32) ** 2).sum()

    gx_p, gw_p = jax.grad(loss_pl, argnums=(0, 1))(feats, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(feats, w)
    # dx may differ at inactive cells (XLA path's VJP flows through the
    # final mask only; ours returns raw conv-transpose there) — compare
    # at active cells, which is all that reaches parameters upstream.
    occ = np.asarray(grid.occ)
    np.testing.assert_allclose(np.asarray(gx_p)[occ], np.asarray(gx_x)[occ],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-3, atol=1e-3)
