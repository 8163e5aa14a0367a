"""Wide-lane (2D) engine vs the 3D brick oracle — cell-exact equivalence.

Covers subm conv (banded 1D formulation), k2s2 down/up, and the
block-diagonal 1x1, all in f32 so comparisons are exact on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from doda_tpu.ops import bricks, bricks2d


@pytest.fixture(scope='module')
def grid():
    rng = np.random.default_rng(3)
    coords = rng.integers(0, 24, (4096, 3)).astype(np.int32)
    valid = np.ones(4096, bool)
    g = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), 512)
    nbr = bricks.build_brick_rulebook(g.table)
    return g, nbr, rng


def make_feats(rng, b_cap, cin, occ):
    f = rng.normal(size=(b_cap, bricks.CELLS, cin)).astype(np.float32)
    return jnp.asarray(f * np.asarray(occ)[..., None])


@pytest.fixture(scope='module')
def sparse_grid():
    """Sparse scene: isolated voxels + a missing-face-neighbor cluster.

    Dense fixtures never exercise the case where a brick's face
    x-neighbor is absent but a diagonal (dx, dy, dz) brick touches the
    halo plane — the round-2 engine dropped those taps."""
    rng = np.random.default_rng(11)
    coords = rng.integers(0, 96, (1500, 3)).astype(np.int32)
    # crafted corner contact: bricks (1,1,1) and (0,0,1), no (0,1,1)
    crafted = np.array([[4, 4, 4], [3, 3, 4], [3, 3, 7], [4, 7, 4]],
                       np.int32)
    coords = np.concatenate([coords, crafted])
    valid = np.ones(len(coords), bool)
    g = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid), 2048)
    nbr = bricks.build_brick_rulebook(g.table)
    return g, nbr, rng


def test_subm_conv_2d_sparse_diagonals(sparse_grid):
    """x±-halo planes must include diagonal-brick taps even when the
    face x-neighbor brick is absent (9-source plane assembly)."""
    g, nbr, rng = sparse_grid
    for cin, cout in ((16, 16), (4, 8)):
        feats = make_feats(rng, g.b_cap, cin, g.occ)
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
        want = np.asarray(bricks.subm_conv3(
            feats, g.occ, nbr, w, compute_dtype=jnp.float32))
        got = np.asarray(bricks2d.subm_conv3_2d(
            feats.reshape(g.b_cap, -1), g.occ, nbr, w,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(
            got.reshape(want.shape), want, rtol=1e-5, atol=1e-5)


def test_subm_conv_2d_sparse_grads(sparse_grid):
    """Custom-VJP gradients stay oracle-exact on sparse grids."""
    g, nbr, rng = sparse_grid
    cin = cout = 8
    feats = make_feats(rng, g.b_cap, cin, g.occ)
    w = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)

    gx2, gw2 = jax.grad(
        lambda x, w: (bricks2d.subm_conv3_2d(
            x, g.occ, nbr, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(feats.reshape(g.b_cap, -1), w)
    gx3, gw3 = jax.grad(
        lambda x, w: (bricks.subm_conv3(
            x, g.occ, nbr, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx2).reshape(gx3.shape),
                               np.asarray(gx3), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw3),
                               rtol=1e-4, atol=1e-4)


def test_subm_conv_2d_matches_oracle(grid):
    g, nbr, rng = grid
    for cin, cout in ((16, 16), (3, 16), (32, 16)):
        feats = make_feats(rng, g.b_cap, cin, g.occ)
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
        want = np.asarray(bricks.subm_conv3(
            feats, g.occ, nbr, w, compute_dtype=jnp.float32))
        x2 = feats.reshape(g.b_cap, -1)
        got = np.asarray(bricks2d.subm_conv3_2d(
            x2, g.occ, nbr, w, compute_dtype=jnp.float32))
        np.testing.assert_allclose(
            got.reshape(want.shape), want, rtol=1e-5, atol=1e-5)


def _down_maps(ds):
    from doda_tpu.models.unet import FlatDown
    return FlatDown(child_parent=ds.child_parent, parity=ds.parity,
                    parent_children=ds.parent_children)


def test_down_conv_2d_matches_oracle(grid):
    g, nbr, rng = grid
    ds = bricks.build_brick_downsample(g.table, g.occ, 256)
    cin, cout = 16, 32
    feats = make_feats(rng, g.b_cap, cin, g.occ)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
    want = np.asarray(bricks.down_conv2(feats, ds, w,
                                        compute_dtype=jnp.float32))
    got = np.asarray(bricks2d.down_conv2_2d(
        feats.reshape(g.b_cap, -1), ds.parent_occ, _down_maps(ds), w,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5)


def test_up_conv_2d_matches_oracle(grid):
    g, nbr, rng = grid
    ds = bricks.build_brick_downsample(g.table, g.occ, 256)
    cin, cout = 32, 16
    pf = rng.normal(size=(256, bricks.CELLS, cin)).astype(np.float32)
    pf = jnp.asarray(pf * np.asarray(ds.parent_occ)[..., None])
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
    want = np.asarray(bricks.up_conv2(pf, g.occ, ds, w,
                                      compute_dtype=jnp.float32))
    got = np.asarray(bricks2d.up_conv2_2d(
        pf.reshape(256, -1), g.occ, _down_maps(ds), w,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5)


def test_down_up_2d_grads_match_oracle(grid):
    """Gather-only custom VJPs vs the 3D oracle's autodiff."""
    g, nbr, rng = grid
    ds = bricks.build_brick_downsample(g.table, g.occ, 256)
    dm = _down_maps(ds)
    cin, cout = 8, 8
    feats = make_feats(rng, g.b_cap, cin, g.occ)
    wd = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))

    gx2, gw2 = jax.grad(
        lambda x, w: (bricks2d.down_conv2_2d(
            x, ds.parent_occ, dm, w, compute_dtype=jnp.float32) ** 2
        ).sum(), argnums=(0, 1))(feats.reshape(g.b_cap, -1), wd)
    gx3, gw3 = jax.grad(
        lambda x, w: (bricks.down_conv2(
            x, ds, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(feats, wd)
    np.testing.assert_allclose(np.asarray(gx2).reshape(gx3.shape),
                               np.asarray(gx3), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw3),
                               rtol=1e-4, atol=1e-4)

    pf = rng.normal(size=(256, bricks.CELLS, cin)).astype(np.float32)
    pf = jnp.asarray(pf * np.asarray(ds.parent_occ)[..., None])
    gp2, gw2 = jax.grad(
        lambda p, w: (bricks2d.up_conv2_2d(
            p, g.occ, dm, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(pf.reshape(256, -1), wd)
    gp3, gw3 = jax.grad(
        lambda p, w: (bricks.up_conv2(
            p, g.occ, ds, w, compute_dtype=jnp.float32) ** 2).sum(),
        argnums=(0, 1))(pf, wd)
    np.testing.assert_allclose(np.asarray(gp2).reshape(gp3.shape),
                               np.asarray(gp3), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw3),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_2d(grid):
    g, nbr, rng = grid
    # channel pairs hit different block sizes (8, 4, 2 and the 64
    # fallback for tiny channels)
    for cin, cout in ((16, 32), (64, 32), (128, 64), (3, 16)):
        feats = make_feats(rng, g.b_cap, cin, g.occ)
        w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
        want = np.asarray(jnp.einsum('bnc,co->bno', feats, w)
                          * g.occ[..., None])
        got = np.asarray(bricks2d.conv1x1_2d(
            feats.reshape(g.b_cap, -1), g.occ, w,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(got.reshape(want.shape), want,
                                   rtol=1e-4, atol=1e-4)


def test_subm_conv_2d_grad_flows(grid):
    """2D conv is autodiff-transparent (pure XLA ops, no custom VJP)."""
    g, nbr, rng = grid
    cin = cout = 8
    feats = make_feats(rng, g.b_cap, cin, g.occ)
    w = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    x2 = feats.reshape(g.b_cap, -1)

    def loss2d(x2, w):
        return bricks2d.subm_conv3_2d(x2, g.occ, nbr, w,
                                      compute_dtype=jnp.float32).sum()

    def loss3d(x, w):
        return bricks.subm_conv3(x, g.occ, nbr, w,
                                 compute_dtype=jnp.float32).sum()

    gx2, gw2 = jax.grad(loss2d, argnums=(0, 1))(x2, w)
    gx3, gw3 = jax.grad(loss3d, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx2).reshape(gx3.shape),
                               np.asarray(gx3), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw3),
                               rtol=1e-4, atol=1e-4)


def test_subm_conv3_norm_2d_matches_explicit(grid):
    """Fused norm+ReLU prologue == explicit mask(relu(x*s+b)) then conv,
    forward and gradients (x, W, scale, bias)."""
    g, nbr, rng = grid
    cin, cout = 16, 16
    # raw (un-normalized) input: NOT pre-masked — the prologue must mask
    f = jnp.asarray(rng.normal(size=(g.b_cap, bricks.CELLS * cin))
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32)
                    * 0.1)
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.3)

    def explicit(f, w, s, b):
        st = jnp.tile(s, bricks.CELLS)
        bt = jnp.tile(b, bricks.CELLS)
        h = jnp.where(jnp.repeat(g.occ, cin, axis=1),
                      jnp.maximum(f * st + bt, 0), 0)
        return bricks2d.subm_conv3_2d(h, g.occ, nbr, w,
                                      compute_dtype=jnp.float32)

    def fused(f, w, s, b):
        return bricks2d.subm_conv3_norm_2d(f, g.occ, nbr, w, s, b,
                                           compute_dtype=jnp.float32)

    want = np.asarray(explicit(f, w, scale, bias))
    got = np.asarray(fused(f, w, scale, bias))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    ge = jax.grad(loss(explicit), argnums=(0, 1, 2, 3))(f, w, scale, bias)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(f, w, scale, bias)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_subm_conv3_norm_2d_sparse(sparse_grid):
    """Prologue path on the sparse fixture (missing face neighbors)."""
    g, nbr, rng = sparse_grid
    cin = cout = 8
    f = jnp.asarray(rng.normal(size=(g.b_cap, bricks.CELLS * cin))
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32)
                    * 0.1)
    scale = jnp.ones((cin,), jnp.float32) * 0.7
    bias = jnp.ones((cin,), jnp.float32) * 0.1
    st, bt = jnp.tile(scale, bricks.CELLS), jnp.tile(bias, bricks.CELLS)
    h = jnp.where(jnp.repeat(g.occ, cin, axis=1),
                  jnp.maximum(f * st + bt, 0), 0)
    want = np.asarray(bricks2d.subm_conv3_2d(
        h, g.occ, nbr, w, compute_dtype=jnp.float32))
    got = np.asarray(bricks2d.subm_conv3_norm_2d(
        f, g.occ, nbr, w, scale, bias, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_down_up_norm_2d_match_explicit(grid):
    """Fused norm+ReLU prologue on down/up == explicit composition,
    forward and gradients."""
    g, nbr, rng = grid
    ds = bricks.build_brick_downsample(g.table, g.occ, 256)
    dm = _down_maps(ds)
    cin, cout = 16, 8
    f = jnp.asarray(rng.normal(size=(g.b_cap, bricks.CELLS * cin))
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.3)
    def relu_mask(x, occ, s, b):
        st, bt = jnp.tile(s, bricks.CELLS), jnp.tile(b, bricks.CELLS)
        return jnp.where(jnp.repeat(occ, cin, axis=1),
                         jnp.maximum(x * st + bt, 0), 0)

    def explicit_down(f, w, s, b):
        return bricks2d.down_conv2_2d(relu_mask(f, g.occ, s, b),
                                      ds.parent_occ,
                                      dm, w, compute_dtype=jnp.float32)

    def fused_down(f, w, s, b):
        return bricks2d.down_conv2_norm_2d(
            f, g.occ, ds.parent_occ, dm, w, s, b,
            compute_dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(fused_down(f, w, scale, bias)),
        np.asarray(explicit_down(f, w, scale, bias)),
        rtol=1e-5, atol=1e-5)
    ge = jax.grad(lambda *a: (explicit_down(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(f, w, scale, bias)
    gf = jax.grad(lambda *a: (fused_down(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(f, w, scale, bias)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)

    pf = jnp.asarray(rng.normal(size=(256, bricks.CELLS * cin))
                     .astype(np.float32))

    def explicit_up(p, w, s, b):
        return bricks2d.up_conv2_2d(relu_mask(p, ds.parent_occ, s, b),
                                    g.occ, dm, w,
                                    compute_dtype=jnp.float32)

    def fused_up(p, w, s, b):
        return bricks2d.up_conv2_norm_2d(
            p, ds.parent_occ, g.occ, dm, w, s, b,
            compute_dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(fused_up(pf, w, scale, bias)),
        np.asarray(explicit_up(pf, w, scale, bias)),
        rtol=1e-5, atol=1e-5)
    ge = jax.grad(lambda *a: (explicit_up(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(pf, w, scale, bias)
    gf = jax.grad(lambda *a: (fused_up(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(pf, w, scale, bias)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_subm_conv_2d_piece_major_matches_raster(sparse_grid, monkeypatch):
    """DODA_PM (piece-major assembly: 9 whole-source chunks per plane
    row + permuted banded weights + widened y-split) must be cell-exact
    vs the default raster assembly, forward and both VJPs, including the
    fused norm prologue. The sparse fixture exercises missing-face-
    neighbor x-planes under the permuted block plan."""
    g, nbr, rng = sparse_grid
    cin = cout = 8
    feats = make_feats(rng, g.b_cap, cin, g.occ).reshape(g.b_cap, -1)
    w = jnp.asarray(
        rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)

    def loss(x, w):
        return (bricks2d.subm_conv3_2d(
            x, g.occ, nbr, w, compute_dtype=jnp.float32) ** 2).sum()

    monkeypatch.setenv('DODA_PM', '0')
    want = np.asarray(bricks2d.subm_conv3_2d(
        feats, g.occ, nbr, w, compute_dtype=jnp.float32))
    gx0, gw0 = jax.grad(loss, argnums=(0, 1))(feats, w)
    monkeypatch.setenv('DODA_PM', 'force')
    got = np.asarray(bricks2d.subm_conv3_2d(
        feats, g.occ, nbr, w, compute_dtype=jnp.float32))
    gx1, gw1 = jax.grad(loss, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=1e-4, atol=1e-4)

    # fused norm prologue rides the pm assembly too
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.3)
    raw = jnp.asarray(rng.normal(size=feats.shape).astype(np.float32))
    monkeypatch.setenv('DODA_PM', '0')
    want_n = np.asarray(bricks2d.subm_conv3_norm_2d(
        raw, g.occ, nbr, w, scale, bias, compute_dtype=jnp.float32))
    monkeypatch.setenv('DODA_PM', 'force')
    got_n = np.asarray(bricks2d.subm_conv3_norm_2d(
        raw, g.occ, nbr, w, scale, bias, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_n, want_n, rtol=1e-5, atol=1e-5)
