"""Fused banded-conv Mosaic kernel vs the oracle (interpret mode on CPU;
the compiled kernel is exercised on the real chip by bench.py's
kernel_check)."""

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
from doda_tpu.ops.pallas_banded import fits_pallas


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setenv('DODA_PALLAS', 'force')


def _grid(seed, n, extent, cap):
    rng = np.random.default_rng(seed)
    coords = rng.integers(0, extent, (n, 3)).astype(np.int32)
    g = bricks.brickify(jnp.asarray(coords), jnp.ones(n, bool), cap)
    nbr = bricks.build_brick_rulebook(g.table)
    return g, nbr, rng


def test_banded_kernel_matches_oracle(force_pallas):
    g, nbr, rng = _grid(3, 4096, 24, 512)
    for cin, cout in ((16, 16), (8, 16)):
        assert fits_pallas(512, cin, cout, 4)
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


def test_banded_kernel_sparse_grads(force_pallas):
    """Custom VJP routes dx through the kernel too (flipped stencil)."""
    g, nbr, rng = _grid(11, 1200, 64, 1024)
    cin = cout = 8
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


# Gen-2 y-split kernel (DODA_PALLAS=2, duplicated-halves 48C rows) was
# deleted in round 5: it hung the real chip during bench kernel_check
# (see pallas_banded.py docstring); its oracle/grad coverage went with it.
