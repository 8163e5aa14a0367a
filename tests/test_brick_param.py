"""BRICK parameterization stays live: engines match oracles at BRICK=2.

The production constant is 4 (see ops/bricks.py); BRICK=2 was benched a
wash on TPU (4.327 vs 4.432 scenes/sec) but the parameterization is the
lever for future occupancy tuning, so this guards every hardcoded
4/16/64 from creeping back in. Runs in a subprocess because BRICK and
all derived static maps (CELLS, piece plans, banded weights) bind at
import time.
"""

import os
import subprocess
import sys

_CHECK = r"""
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from doda_tpu.ops import bricks, bricks2d
from doda_tpu.models.unet import FlatDown

assert bricks.BRICK == 2, bricks.BRICK
rng = np.random.default_rng(7)
coords = rng.integers(0, 10, (512, 3)).astype(np.int32)
b_cap = 512
grid = bricks.brickify(jnp.asarray(coords), jnp.ones(512, bool), b_cap)
nbr = bricks.build_brick_rulebook(grid.table)
feats = rng.normal(size=(b_cap, bricks.CELLS, 16)).astype(np.float32)
feats = jnp.asarray(feats * np.asarray(grid.occ)[..., None])
w = jnp.asarray(rng.normal(size=(27, 16, 16)).astype(np.float32) * 0.1)
want = np.asarray(bricks.subm_conv3(feats, grid.occ, nbr, w,
                                    compute_dtype=jnp.float32))
got = np.asarray(bricks2d.subm_conv3_2d(
    feats.reshape(b_cap, -1), grid.occ, nbr, w,
    compute_dtype=jnp.float32)).reshape(want.shape)
assert np.abs(got - want).max() < 1e-3

ds = bricks.build_brick_downsample(grid.table, grid.occ, 256)
dm = FlatDown(child_parent=ds.child_parent, parity=ds.parity,
              parent_children=ds.parent_children)
wd = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32) * 0.1)
want_d = np.asarray(bricks.down_conv2(feats, ds, wd,
                                      compute_dtype=jnp.float32))
got_d = np.asarray(bricks2d.down_conv2_2d(
    feats.reshape(b_cap, -1), ds.parent_occ, dm, wd,
    compute_dtype=jnp.float32)).reshape(want_d.shape)
assert np.abs(got_d - want_d).max() < 1e-3

pf = rng.normal(size=(256, bricks.CELLS, 32)).astype(np.float32)
pf = jnp.asarray(pf * np.asarray(ds.parent_occ)[..., None])
wu = jnp.asarray(rng.normal(size=(8, 32, 16)).astype(np.float32) * 0.1)
want_u = np.asarray(bricks.up_conv2(pf, grid.occ, ds, wu,
                                    compute_dtype=jnp.float32))
got_u = np.asarray(bricks2d.up_conv2_2d(
    pf.reshape(256, -1), grid.occ, dm, wu,
    compute_dtype=jnp.float32)).reshape(want_u.shape)
assert np.abs(got_u - want_u).max() < 1e-3
print('BRICK=2 OK')
"""


def test_brick2_engines_match_oracle():
    env = dict(os.environ, DODA_BRICK='2', JAX_PLATFORMS='')
    env.pop('PYTHONPATH', None)
    out = subprocess.run([sys.executable, '-c', _CHECK],
                         capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'BRICK=2 OK' in out.stdout
