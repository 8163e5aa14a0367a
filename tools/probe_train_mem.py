"""Batch-N train-step compile/fit probe on the real chip.

Usage: python tools/probe_train_mem.py [batch] [remat]
Compiles and runs the full flagship train step at the given batch size
and DODA_REMAT policy, printing the step time and the full error on
failure (bench.py truncates errors to 200 chars). Evidence feed for
PERF.md's batch-4 memory attack (VERDICT round-4 item 2).
"""
import _init_path  # noqa: F401
import os
import sys
import time

import numpy as np

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
if len(sys.argv) > 2:
    os.environ['DODA_REMAT'] = sys.argv[2]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_ccache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

from bench import BRICK_CAP, N_CAP, make_scene  # noqa: E402
from __graft_entry__ import _flagship  # noqa: E402
from doda_tpu.models import model_fn as mf  # noqa: E402
from doda_tpu.models.unet import default_brick_caps  # noqa: E402
from doda_tpu.utils.optim import build_optimizer  # noqa: E402

rng = np.random.default_rng(0)
coords = np.zeros((batch, N_CAP, 3), np.int32)
valid = np.zeros((batch, N_CAP), bool)
for b in range(batch):
    c = make_scene(rng)
    coords[b, :len(c)] = c
    valid[b, :len(c)] = True
feats = rng.normal(size=(batch, N_CAP, 3)).astype(np.float32)
labels = np.where(valid, rng.integers(0, 20, valid.shape), 255)

cfg = _flagship(num_levels=7)
model = mf.build_model(cfg)
tx = build_optimizer(cfg.OPTIMIZATION)
state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
b_caps = default_brick_caps(BRICK_CAP, 7)
train_step, _, _ = mf.make_steps(cfg, model, tx, b_caps)
batch_t = mf.PointBatch(coords=jnp.asarray(coords),
                        feats=jnp.asarray(feats),
                        labels=jnp.asarray(labels.astype(np.int32)),
                        valid=jnp.asarray(valid))
print(f'batch={batch} remat={os.environ.get("DODA_REMAT", "dots")} '
      f'compiling...', flush=True)
t0 = time.perf_counter()
state, m = train_step(state, batch_t, 0.1, 0)
print(f'compile+step1 {time.perf_counter() - t0:.1f}s '
      f'loss={float(m["loss"]):.4f}', flush=True)
n = 5
t0 = time.perf_counter()
for _ in range(n):
    state, m = train_step(state, batch_t, 0.1, 0)
float(m['loss'])
step = (time.perf_counter() - t0) / n
print(f'step {step:.4f}s = {batch / step:.3f} scenes/sec/chip trained')
