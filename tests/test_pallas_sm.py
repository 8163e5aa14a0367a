"""Source-major conv path vs the oracle: the shifted-GEMM XLA form
(DODA_SM=xla) and the fused Mosaic kernel (interpret mode on CPU via
DODA_SM_INTERPRET; the compiled kernel is exercised on the real chip by
bench.py's kernel_check)."""

import os as _os
import pytest as _pytest

# Frozen opt-in engine (PERF.md "engine garden disposition"): receives no
# optimization work by declaration; its equivalence tests double as
# documentation but cost multi-minute XLA:CPU compiles on the 8-dev mesh.
# Run with DODA_TEST_FROZEN=1 (weekly/full runs).
pytestmark = _pytest.mark.skipif(
    _os.environ.get('DODA_TEST_FROZEN') != '1',
    reason='frozen opt-in engine; set DODA_TEST_FROZEN=1 to run')

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from doda_tpu.ops import bricks, bricks2d
from doda_tpu.ops.pallas_sm import fits_sm


def _grid(seed, n, extent, cap):
    rng = np.random.default_rng(seed)
    coords = rng.integers(0, extent, (n, 3)).astype(np.int32)
    g = bricks.brickify(jnp.asarray(coords), jnp.ones(n, bool), cap)
    nbr = bricks.build_brick_rulebook(g.table)
    return g, nbr, rng


def _check(monkeypatch, mode, cin, cout, seed=3):
    monkeypatch.setenv('DODA_SM', mode)
    if mode == '1':
        monkeypatch.setenv('DODA_SM_INTERPRET', '1')
    g, nbr, rng = _grid(seed, 4096, 24, 512)
    f = rng.normal(size=(512, 64, cin)).astype(np.float32)
    f = f * np.asarray(g.occ)[..., None]
    w = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    want = np.asarray(bricks.subm_conv3(
        jnp.asarray(f), g.occ, nbr, w, compute_dtype=jnp.float32))
    got = np.asarray(bricks2d.subm_conv3_2d(
        jnp.asarray(f.reshape(512, -1)), g.occ, nbr, w,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5)


def test_sm_xla_matches_oracle(monkeypatch):
    _check(monkeypatch, 'xla', 16, 16)
    _check(monkeypatch, 'xla', 32, 16, seed=5)


def test_sm_kernel_matches_oracle(monkeypatch):
    assert fits_sm(512, 16, 16, 4)
    _check(monkeypatch, '1', 16, 16)


def test_sm_kernel_sparse_grads(monkeypatch):
    """Custom VJP: dx routes through the sm path too (flipped stencil)."""
    monkeypatch.setenv('DODA_SM', '1')
    monkeypatch.setenv('DODA_SM_INTERPRET', '1')
    g, nbr, rng = _grid(11, 1200, 64, 1024)
    cin = cout = 16
    f = rng.normal(size=(1024, 64, cin)).astype(np.float32)
    f = jnp.asarray(f * np.asarray(g.occ)[..., None])
    w = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    gx2, gw2 = jax.grad(
        lambda x, w: (bricks2d.subm_conv3_2d(
            x, g.occ, nbr, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(f.reshape(1024, -1), w)
    gx3, gw3 = jax.grad(
        lambda x, w: (bricks.subm_conv3(
            x, g.occ, nbr, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(f, w)
    np.testing.assert_allclose(np.asarray(gx2).reshape(gx3.shape),
                               np.asarray(gx3), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw3),
                               rtol=1e-4, atol=1e-4)


def test_sm_fallback_shapes(monkeypatch):
    """cin=3 (input conv) and odd couts stay on the rows6 path."""
    monkeypatch.setenv('DODA_SM', '1')
    _check(monkeypatch, '1', 3, 16, seed=7) if False else None
    g, nbr, rng = _grid(7, 2048, 24, 512)
    f = rng.normal(size=(512, 64, 3)).astype(np.float32)
    f = f * np.asarray(g.occ)[..., None]
    w = jnp.asarray(
        rng.normal(size=(27, 3, 16)).astype(np.float32) * 0.1)
    want = np.asarray(bricks.subm_conv3(
        jnp.asarray(f), g.occ, nbr, w, compute_dtype=jnp.float32))
    got = np.asarray(bricks2d.subm_conv3_2d(
        jnp.asarray(f.reshape(512, -1)), g.occ, nbr, w,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5)
