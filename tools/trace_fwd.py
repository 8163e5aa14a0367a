"""Capture a jax.profiler trace of one bench-scale forward (real TPU).

Usage: python tools/trace_fwd.py [outdir=/tmp/trace_fwd] [levels=7]
       python tools/trace_fwd.py --train [outdir] [levels]   # full train
         step (fwd/bwd/SGD) at DODA_TRAIN_BATCH (default 4)
Then:  python tools/xplane_summary.py <outdir>

Engine selection follows the model path (env DODA_CONV; see
doda_tpu/models/unet.py::_subm_impl). Prints steady-state forward time
before writing the trace, so numbers and trace always match.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench as B  # noqa: E402
from doda_tpu.models import model_fn as mf  # noqa: E402
from doda_tpu.models.unet import build_level_plan, default_brick_caps  # noqa: E402
from doda_tpu.utils.optim import build_optimizer  # noqa: E402
from __graft_entry__ import _flagship  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if a != '--train']
    train = '--train' in sys.argv[1:]
    outdir = args[0] if args else (
        '/tmp/trace_train' if train else '/tmp/trace_fwd')
    levels = int(args[1]) if len(args) > 1 else 7
    batch = (int(os.environ.get('DODA_TRAIN_BATCH', 4)) if train
             else B.BATCH)

    rng = np.random.default_rng(0)
    coords = np.zeros((batch, B.N_CAP, 3), np.int32)
    valid = np.zeros((batch, B.N_CAP), bool)
    for b in range(batch):
        c = B.make_scene(rng)
        coords[b, :len(c)] = c
        valid[b, :len(c)] = True
    feats = rng.normal(size=(batch, B.N_CAP, 3)).astype(np.float32)
    cfg = _flagship(num_levels=levels)
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    b_caps = default_brick_caps(B.BRICK_CAP, levels)

    if train:
        labels = np.where(valid, rng.integers(0, 20, valid.shape),
                          255).astype(np.int32)
        batch_t = mf.PointBatch(coords=jnp.asarray(coords),
                                feats=jnp.asarray(feats),
                                labels=jnp.asarray(labels),
                                valid=jnp.asarray(valid))
        train_step, _, _ = mf.make_steps(cfg, model, tx, b_caps)
        t0 = time.perf_counter()
        state, m = train_step(state, batch_t, 0.1, 0)
        float(m['loss'])
        print(f'compile+first step {time.perf_counter() - t0:.1f}s',
              flush=True)
        for _ in range(3):
            t0 = time.perf_counter()
            state, m = train_step(state, batch_t, 0.1, 0)
            float(m['loss'])
            dt = time.perf_counter() - t0
            print(f'steady {dt:.3f}s  ({batch / dt:.2f} scenes/sec '
                  'trained)', flush=True)
        os.system(f'rm -rf {outdir}')
        jax.profiler.start_trace(outdir)
        state, m = train_step(state, batch_t, 0.1, 0)
        float(m['loss'])
        jax.profiler.stop_trace()
        print(f'trace written to {outdir}')
        return

    @jax.jit
    def fwd(params, batch_stats, coords, feats, valid):
        plan = build_level_plan(coords, valid, tuple(b_caps))
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             feats, plan, train=False)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    cd, fd, vd = map(jnp.asarray, (coords, feats, valid))
    t0 = time.perf_counter()
    int(fwd(state.params, state.batch_stats, cd, fd, vd).sum())
    print(f'compile+first run {time.perf_counter() - t0:.1f}s', flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        int(fwd(state.params, state.batch_stats, cd, fd, vd).sum())
        dt = time.perf_counter() - t0
        print(f'steady {dt:.3f}s  ({B.BATCH / dt:.2f} scenes/sec)',
              flush=True)

    os.system(f'rm -rf {outdir}')
    jax.profiler.start_trace(outdir)
    int(fwd(state.params, state.batch_stats, cd, fd, vd).sum())
    jax.profiler.stop_trace()
    print(f'trace written to {outdir}')


if __name__ == '__main__':
    main()
