"""Graph-size regression budget.

Round 3 shipped an engine restructure that quintupled XLA compile time
(the full suite went ~20 min -> 1h40m and the driver's 8-device dryrun
timed out) without any test noticing. XLA compile time scales
superlinearly with HLO op count, and wall-clock compile of even the
tiny 3-level train step is ~8 min on a 1-core CI host — too slow to
assert on directly. Instead this test lowers the production train step
(trace-only, ~20 s) and budgets the *StableHLO op count*: the graph
structure is deterministic, so a restructure that multiplies per-conv
ops (the round-3 failure mode: merged-gather views + twin mask
assembly) fails here immediately, machine speed notwithstanding.

Measured baseline at the budget's introduction: ~74.6k lines
(3 levels, block_reps 2, tiny caps, the default 2d engine, fwd + custom
VJPs + optimizer + metrics). The budget leaves ~15% headroom; shrink it
as the engine's op count comes down (the fused Pallas kernel path
collapses assembly into single custom calls).
"""

import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from doda_tpu.config import CfgNode
from doda_tpu.models import model_fn as mf
from doda_tpu.utils.optim import build_optimizer

BUDGET_OPS = 86_000
BUDGET_TRACE_S = 180.0      # tracing is pure Python; 3-9x headroom on a
                            # busy 1-core host (measured 21 s idle)


def make_cfg():
    return CfgNode({
        'COMMON_CLASSES': {'n_classes': 5},
        'MODEL': {'BACKBONE': {'use_xyz': False, 'in_channel': 3,
                               'mid_channel': 8, 'block_residual': True,
                               'block_reps': 2, 'num_levels': 3},
                  'dsnorm': False},
        'DATA_CONFIG': {'DATA_CLASS': {'ignore_label': 255,
                                       'n_classes': 5}},
        'OPTIMIZATION': {'optim': 'sgd', 'base_lr': 0.05, 'momentum': 0.9,
                         'weight_decay': 1e-4, 'loss': 'cross_entropy'},
    })


def test_train_step_graph_budget():
    cfg = make_cfg()
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    train_step, _, _ = mf.make_steps(cfg, model, tx, (128, 64, 32))
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = mf.PointBatch(
        coords=jnp.asarray(rng.integers(0, 40, (2, 256, 3))
                           .astype(np.int32)),
        feats=jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32)),
        labels=jnp.asarray(rng.integers(0, 5, (2, 256)).astype(np.int32)),
        valid=jnp.ones((2, 256), bool))
    t0 = time.perf_counter()
    lowered = train_step.lower(state, batch, 0.01, 0)
    trace_s = time.perf_counter() - t0
    n_ops = sum(1 for line in lowered.as_text().splitlines()
                if re.search(r'=\s+"?stablehlo\.', line))
    print(f'train_step lowered: {n_ops} stablehlo ops, trace {trace_s:.1f}s '
          f'(budgets {BUDGET_OPS}, {BUDGET_TRACE_S:.0f}s)')
    assert n_ops < BUDGET_OPS, (
        f'train-step graph blew the {BUDGET_OPS}-op budget: {n_ops} ops. '
        'An engine restructure has multiplied per-conv HLO ops — compile '
        'time scales superlinearly with this (round-3 failure mode: the '
        'multichip dryrun timed out, the test suite went 20min -> 1h40m).')
    assert trace_s < BUDGET_TRACE_S, (
        f'train-step tracing took {trace_s:.1f}s (budget '
        f'{BUDGET_TRACE_S:.0f}s) — runaway Python-side graph construction.')
