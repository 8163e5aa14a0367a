"""Headline benchmark: ScanNet-val-shaped scenes/sec/chip, voxelize + U-Net fwd.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}
plus a train-step JSON line on stderr (trained scenes/sec/chip at
DODA_TRAIN_BATCH, default 2) so the driver's BENCH artifact tail tracks
training throughput round-over-round. DODA_BENCH_TRAIN=0 skips it;
``--train`` extends it with the input-pipeline keep-up measurement.

Scenes are synthetic but ScanNet-val shaped: ~150k surface points per
scene at voxel_scale 50 (~140k occupied voxels, ~40.3k occupied 4^3
bricks — BRICK_CAP below is sized to clear that), batch 4, the flagship
7-level mid-16 sparse U-Net (ref model/unet.py:15-69).

``vs_baseline`` normalizes by the north-star target from BASELINE.md:
5x an estimated reference GPU throughput. The reference publishes no
throughput; spconv v1.2's 7-level U-Net forward at this scene size runs
~15 scenes/sec on a contemporary datacenter GPU (batch 4, fp16), so the
target is 75 scenes/sec/chip and vs_baseline = value / 75.
"""

import json
import sys
import time

import numpy as np

BATCH = 4
# 1.25*2^17: the quarter-step collate bucket a 150k-pt scene lands in
# (the sqrt2 bucket 196608 pads every point-level sort/scatter/gather
# 1.31x; quarter-step spacing {2^k, 1.25, 1.5, 1.75} costs 2x the
# compile variants in production and trims padding to <=1.25x)
N_CAP = 163840
N_REAL = 150_000
# Measured (round 5, exact): the synthetic scenes hold 40,250-40,356
# occupied 4^3 bricks each. 24576 (round 1) silently dropped 39% of every
# scene's bricks — cap must clear the real count or the bench measures a
# truncated model; capacity_audit() below machine-checks that no level
# overflows at these caps, every run.
BRICK_CAP = 40960
TARGET_SCENES_PER_SEC = 75.0


def kernel_check():
    """Compiled-engine-vs-oracle assertion on the real chip (catches
    Mosaic/XLA drift the CPU interpret-mode tests cannot). Covers the
    production wide-lane engine (bricks2d — what the bench and the model
    actually run by default) plus the v2 3D path."""
    import jax
    import jax.numpy as jnp
    from doda_tpu.ops import bricks, bricks2d
    from doda_tpu.models.unet import FlatDown

    rng = np.random.default_rng(7)
    coords = rng.integers(0, 40, (8192, 3)).astype(np.int32)
    grid = bricks.brickify(jnp.asarray(coords),
                           jnp.ones(8192, bool), 1024)
    nbr = bricks.build_brick_rulebook(grid.table)
    feats = rng.normal(size=(1024, bricks.CELLS, 16)).astype(np.float32)
    feats = jnp.asarray(feats * np.asarray(grid.occ)[..., None])
    w = jnp.asarray(rng.normal(size=(27, 16, 16)).astype(np.float32) * 0.1)
    want = np.asarray(bricks.subm_conv3(feats, grid.occ, nbr, w,
                                        compute_dtype=jnp.float32))
    for name, fn in (
            ('2d', lambda: bricks2d.subm_conv3_2d(
                feats.reshape(1024, -1), grid.occ, nbr, w,
                compute_dtype=jnp.float32)),
            ('v2', lambda: bricks.subm_conv3_v2(
                feats, grid.occ, nbr, w, compute_dtype=jnp.float32))):
        got = np.asarray(fn()).reshape(want.shape)
        err = np.abs(got - want).max()
        assert err < 1e-3, f'{name} engine drift vs oracle on device: {err}'

    # stride-2 down/up on the wide-lane path
    ds = bricks.build_brick_downsample(grid.table, grid.occ, 512)
    dm = FlatDown(child_parent=ds.child_parent, parity=ds.parity,
                  parent_children=ds.parent_children)
    wd = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32) * 0.1)
    want_d = np.asarray(bricks.down_conv2(feats, ds, wd,
                                          compute_dtype=jnp.float32))
    got_d = np.asarray(bricks2d.down_conv2_2d(
        feats.reshape(1024, -1), ds.parent_occ, dm, wd,
        compute_dtype=jnp.float32)).reshape(want_d.shape)
    err_d = np.abs(got_d - want_d).max()
    assert err_d < 1e-3, f'down_conv2_2d drift vs oracle: {err_d}'
    pf = rng.normal(size=(512, bricks.CELLS, 32)).astype(np.float32)
    pf = jnp.asarray(pf * np.asarray(ds.parent_occ)[..., None])
    wu = jnp.asarray(rng.normal(size=(8, 32, 16)).astype(np.float32) * 0.1)
    want_u = np.asarray(bricks.up_conv2(pf, grid.occ, ds, wu,
                                        compute_dtype=jnp.float32))
    got_u = np.asarray(bricks2d.up_conv2_2d(
        pf.reshape(512, -1), grid.occ, dm, wu,
        compute_dtype=jnp.float32)).reshape(want_u.shape)
    err_u = np.abs(got_u - want_u).max()
    assert err_u < 1e-3, f'up_conv2_2d drift vs oracle: {err_u}'

    # fused norm+ReLU prologue (the production block path) vs the
    # explicit composition, on-device
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.3)
    raw = jnp.asarray(rng.normal(size=(1024, bricks.CELLS * 16))
                      .astype(np.float32))
    st, bt = jnp.tile(scale, bricks.CELLS), jnp.tile(bias, bricks.CELLS)
    h = jnp.where(jnp.repeat(grid.occ, 16, axis=1),
                  jnp.maximum(raw * st + bt, 0), 0)
    want_n = np.asarray(bricks2d.subm_conv3_2d(
        h, grid.occ, nbr, w, compute_dtype=jnp.float32))
    got_n = np.asarray(bricks2d.subm_conv3_norm_2d(
        raw, grid.occ, nbr, w, scale, bias, compute_dtype=jnp.float32))
    err_n = np.abs(got_n - want_n).max()
    assert err_n < 1e-3, f'subm_conv3_norm_2d drift on device: {err_n}'
    print(f'kernel check ok (2d+v2 subm, 2d down/up vs oracle on device)',
          file=sys.stderr)


def capacity_audit(coords, valid, b_caps):
    """Host-side proof that the caps drop nothing: per-scene occupied
    brick counts at every U-Net level vs the capacity schedule. Round 1
    measured an inflated number by silently truncating 39% of the scene;
    this assert makes the honesty parameter machine-checked instead of a
    comment."""
    from doda_tpu.ops.bricks import BRICK
    for b in range(coords.shape[0]):
        bc = coords[b][valid[b]] // BRICK
        for lvl, cap in enumerate(b_caps):
            occ = len(np.unique(bc >> lvl, axis=0))
            assert occ <= cap, (
                f'scene {b} level {lvl}: {occ} occupied bricks > cap '
                f'{cap} — bench caps truncate the scene')
    n_pts = int(valid.sum(1).max())
    assert n_pts <= N_CAP, f'{n_pts} pts > N_CAP {N_CAP}'
    print(f'capacity audit ok: worst scene fits every level '
          f'(caps {tuple(b_caps)})', file=sys.stderr)


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


TRAIN_BATCH = 2     # batch 4 FITS since round 5 (cap trimming + the
                    # MaskedBatchNorm C-minor backward fix freed ~9 GB)
                    # but measures 1.93 vs batch 2's 2.08 scenes/sec —
                    # 2/chip is the throughput-optimal train config
                    # (override: DODA_TRAIN_BATCH=N; see
                    # tools/probe_train_mem.py for the fit probe)


def train_bench(state, mf, cfg, b_caps, coords, feats, valid,
                with_loader: bool):
    """Train-step throughput (always printed so the driver's BENCH
    artifact tracks the trained number round-over-round, not just the
    forward). With ``with_loader`` (--train mode) also measures the
    input-pipeline keep-up ratio (data_time / batch_time — must stay
    well under 1 or the host feeds too slowly; recorded in PERF.md)."""
    import jax
    import jax.numpy as jnp
    from doda_tpu.utils.optim import build_optimizer

    import os
    tb = int(os.environ.get('DODA_TRAIN_BATCH', TRAIN_BATCH))
    assert tb >= 1, f'DODA_TRAIN_BATCH must be >= 1, got {tb}'
    if tb > len(coords):    # bench synthesizes BATCH scenes; tile if asked
        reps = -(-tb // len(coords))
        coords, feats, valid = (np.tile(a, (reps,) + (1,) * (a.ndim - 1))
                                for a in (coords, feats, valid))
    coords, feats, valid = (a[:tb] for a in (coords, feats, valid))
    tx = build_optimizer(cfg.OPTIMIZATION)
    train_step, _, _ = mf.make_steps(cfg, mf.build_model(cfg), tx, b_caps)
    labels = np.where(valid, np.random.default_rng(1).integers(
        0, 20, valid.shape), 255).astype(np.int32)
    batch = mf.PointBatch(coords=jnp.asarray(coords),
                          feats=jnp.asarray(feats),
                          labels=jnp.asarray(labels),
                          valid=jnp.asarray(valid))
    state, m = train_step(state, batch, 0.1, 0)   # compile
    float(m['loss'])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = train_step(state, batch, 0.1, 0)
    float(m['loss'])
    step_t = (time.perf_counter() - t0) / n
    try:        # peak HBM: headroom for batch-scaling A/Bs
        ms = jax.local_devices()[0].memory_stats() or {}
        peak = ms.get('peak_bytes_in_use')
        peak_gb = round(peak / 2**30, 2) if peak else None
    except Exception:
        peak_gb = None

    line = {
        'metric': 'trained scenes/sec/chip (full train step: voxelize + '
                  'U-Net fwd/bwd + SGD + metric histograms)',
        'train_batch': tb,
        'train_step_scenes_per_sec': round(tb / step_t, 3),
        'step_time_s': round(step_t, 4),
        'peak_hbm_gb': peak_gb,
    }
    if not with_loader:
        print(json.dumps(line), file=sys.stderr)
        return

    # real input pipeline at bench scale: synthetic ScanNet scenes through
    # the actual reader + augmentor + padded collate + thread workers
    import subprocess
    root = '/tmp/bench_synth'
    if not os.path.exists(os.path.join(root, 'scannetv2', 'train')):
        subprocess.run([sys.executable, 'tools/make_synth_data.py',
                        '--root', root, '--dataset', 'scannet',
                        '--n_train', '12', '--n_val', '2',
                        '--points', str(N_REAL)], check=True)
    from doda_tpu.config import CfgNode, cfg_from_yaml_file
    dcfg = CfgNode({})
    cfg_from_yaml_file('cfgs/scannet/spconv.yaml', dcfg)
    dcfg.DATA_CONFIG.DATA_ROOT = os.path.join(root, 'scannetv2')
    from doda_tpu.data import build_dataloader
    _, loader, _ = build_dataloader(dcfg.DATA_CONFIG, tb,
                                    dist=False, workers=4,
                                    split='training', training=True)
    it = iter(loader)
    next(it)                      # warm the worker pool
    t0 = time.perf_counter()
    n_data = 0
    for _ in range(n):
        next(it)
        n_data += 1
    data_t = (time.perf_counter() - t0) / n_data
    line['data_batch_time_s'] = round(data_t, 4)
    line['data_over_batch'] = round(data_t / step_t, 4)
    print(json.dumps(line), file=sys.stderr)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 7-level model compiles in
    5-10 min over the tunnel; cached reruns skip that entirely."""
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_ccache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)


def main():
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from doda_tpu.models import model_fn as mf
    from doda_tpu.models.unet import build_level_plan, default_brick_caps
    from doda_tpu.utils.optim import build_optimizer
    from __graft_entry__ import _flagship

    kernel_check()

    # batch-scaling probe knob (PERF.md): the headline metric is batch 4;
    # DODA_BENCH_BATCH overrides for amortization A/Bs only.
    import os
    batch = int(os.environ.get('DODA_BENCH_BATCH', BATCH))
    rng = np.random.default_rng(0)
    coords = np.zeros((batch, N_CAP, 3), np.int32)
    valid = np.zeros((batch, N_CAP), bool)
    for b in range(batch):
        c = make_scene(rng)
        coords[b, :len(c)] = c
        valid[b, :len(c)] = True
    feats = rng.normal(size=(batch, N_CAP, 3)).astype(np.float32)

    cfg = _flagship(num_levels=7)
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    import os
    if os.environ.get('DODA_BENCH_CAPS'):
        b_caps = tuple(int(v) for v in
                       os.environ['DODA_BENCH_CAPS'].split(','))
    else:
        b_caps = default_brick_caps(BRICK_CAP, 7)
    capacity_audit(coords, valid, b_caps)

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

    # Train-step line runs by DEFAULT so BENCH_r*.json tracks the trained
    # number (the metric matching what the reference actually does);
    # --train adds the input-pipeline measurement; DODA_BENCH_TRAIN=0
    # skips it entirely (compile-budget escape hatch — the headline
    # forward line must survive even if the train step breaks).
    import os as _os
    if _os.environ.get('DODA_BENCH_TRAIN', '1') != '0':
        try:
            train_bench(state, mf, cfg, b_caps, coords, feats, valid,
                        with_loader='--train' in sys.argv)
        except Exception as e:          # noqa: BLE001
            print(json.dumps({'metric': 'trained scenes/sec/chip',
                              'error': repr(e)[:200]}), file=sys.stderr)

    run(1)  # compile + warm

    n_iters = 10
    t0 = time.perf_counter()
    sink = run(n_iters)
    dt = time.perf_counter() - t0

    scenes_per_sec = batch * n_iters / dt
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
