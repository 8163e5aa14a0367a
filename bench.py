"""Headline benchmark: ScanNet-val-shaped scenes/sec/chip, voxelize + U-Net fwd.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

Scenes are synthetic but ScanNet-val shaped: ~150k surface points per
scene at voxel_scale 50 (~140k occupied voxels, ~20k 4^3 bricks), batch 4,
the flagship 7-level mid-16 sparse U-Net (ref model/unet.py:15-69).

``vs_baseline`` normalizes by the north-star target from BASELINE.md:
5x an estimated reference GPU throughput. The reference publishes no
throughput; spconv v1.2's 7-level U-Net forward at this scene size runs
~15 scenes/sec on a contemporary datacenter GPU (batch 4, fp16), so the
target is 75 scenes/sec/chip and vs_baseline = value / 75.
"""

import json
import time

import numpy as np

BATCH = 4
N_CAP = 262144
N_REAL = 150_000
BRICK_CAP = 24576
TARGET_SCENES_PER_SEC = 75.0


def make_scene(rng):
    """Surface-heavy synthetic room (floor slab + two walls + clutter)."""
    n = N_REAL
    fl = rng.uniform(0, 7, (n // 2, 3))
    fl[:, 2] = np.abs(rng.normal(0, 0.02, n // 2))
    w1 = rng.uniform(0, 7, (n // 4, 3))
    w1[:, 0] = np.abs(rng.normal(0, 0.02, n // 4))
    w1[:, 2] *= 0.4
    cl = rng.uniform(0, 7, (n - n // 2 - n // 4, 3))
    cl[:, 2] = rng.uniform(0, 1.2, len(cl))
    pts = np.concatenate([fl, w1, cl])
    c = np.floor(pts * 50).astype(np.int32)
    c -= c.min(0)
    return np.clip(c, 0, 2047)


def main():
    import jax
    import jax.numpy as jnp
    from doda_tpu.models import model_fn as mf
    from doda_tpu.models.unet import build_level_plan, default_brick_caps
    from doda_tpu.utils.optim import build_optimizer
    from __graft_entry__ import _flagship

    rng = np.random.default_rng(0)
    coords = np.zeros((BATCH, N_CAP, 3), np.int32)
    valid = np.zeros((BATCH, N_CAP), bool)
    for b in range(BATCH):
        c = make_scene(rng)
        coords[b, :len(c)] = c
        valid[b, :len(c)] = True
    feats = rng.normal(size=(BATCH, N_CAP, 3)).astype(np.float32)

    cfg = _flagship(num_levels=7)
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    b_caps = default_brick_caps(BRICK_CAP, 7)

    def fwd_once(params, batch_stats, coords, feats, valid):
        plan = build_level_plan(coords, valid, tuple(b_caps))
        logits = model.apply({'params': params, 'batch_stats': batch_stats},
                             feats, plan, train=False)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    @jax.jit
    def fwd(params, batch_stats, coords, feats, valid):
        return fwd_once(params, batch_stats, coords, feats, valid)

    @jax.jit
    def fwd_loop(params, batch_stats, coords, feats, valid, n):
        # n timed iterations inside one jit so per-call tunnel dispatch
        # (~30 ms on axon) doesn't pollute the measurement; feats are
        # perturbed per step so XLA cannot CSE the iterations away.
        def body(i, acc):
            out = fwd_once(params, batch_stats, coords,
                           feats + (i.astype(jnp.float32) * 1e-6), valid)
            return acc + out.sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    coords_d, feats_d, valid_d = map(jnp.asarray, (coords, feats, valid))

    # NB: block_until_ready returns early on some platform plugins
    # (observed on the axon tunnel); force completion with a host fetch
    # of a reduction over the output.
    def run(n):
        return int(fwd_loop(state.params, state.batch_stats, coords_d,
                            feats_d, valid_d, jnp.int32(n)))

    run(1)  # compile + warm

    n_iters = 10
    t0 = time.perf_counter()
    sink = run(n_iters)
    dt = time.perf_counter() - t0

    scenes_per_sec = BATCH * n_iters / dt
    print(json.dumps({
        'metric': 'ScanNet-val-shaped scenes/sec/chip '
                  '(voxelize + 7-level sparse U-Net fwd, batch 4, '
                  '~150k pts/scene)',
        'value': round(scenes_per_sec, 3),
        'unit': 'scenes/sec/chip',
        'vs_baseline': round(scenes_per_sec / TARGET_SCENES_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
