"""Microbench one subm conv at the L0/L1 bench shapes across engines.

Usage: python tools/bench_conv.py [reps]
Times N conv applications UNROLLED inside one jit for each
(engine, cin, cout) combo on the real chip. Do NOT switch this to
lax.fori_loop: a loop-carried gather table gets a brick-strided layout
and the body runs ~7x slow (measured 67 ms vs ~10 ms real) — the
unrolled chain keeps nbr/occ loop-invariant.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_ccache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
    from doda_tpu.ops import bricks, bricks2d

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)

    # L0 bench shape: 4 scenes x 49152 cap, ~40.3k real bricks each
    b = 4 * 49152
    ext = 120
    coords = np.concatenate([
        rng.integers(0, ext, (40000, 2)).astype(np.int32),
        rng.integers(0, 6, (40000, 1)).astype(np.int32)], axis=1)
    grid = bricks.brickify(jnp.asarray(coords * np.array([1, 1, 1])),
                           jnp.ones(len(coords), bool), b)
    nbr = bricks.build_brick_rulebook(grid.table)
    occ = grid.occ

    for cin, cout in ((16, 16), (32, 16), (32, 32)):
        f = rng.normal(size=(b, 64 * cin)).astype(np.float32)
        f = (f.reshape(b, 64, cin)
             * np.asarray(occ)[..., None]).reshape(b, 64 * cin)
        x = jnp.asarray(f, jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)

        for mode in ('0', 'xla', 'sm1', 'p1'):
            # '0' = rows6 y-split XLA GEMMs (production default),
            # 'xla'/'sm1' = source-major XLA / fused kernel,
            # 'p1' = banded Mosaic kernel gen-1 (full contraction);
            # gen-2 ('p2') was deleted in round 5 (hung the chip)
            os.environ['DODA_SM'] = {'xla': 'xla', 'sm1': '1'}.get(mode,
                                                                   '0')
            os.environ['DODA_PALLAS'] = '1' if mode == 'p1' else '0'

            def chain(x, w, n):
                acc = jnp.float32(0)
                for _ in range(n):
                    o = bricks2d.subm_conv3_2d(
                        x + acc.astype(jnp.bfloat16) * jnp.bfloat16(1e-6),
                        occ, nbr, w)
                    acc = acc + o.astype(jnp.float32).sum()
                return acc

            loop = jax.jit(chain, static_argnums=2)
            float(loop(x, w, reps))
            t0 = time.perf_counter()
            float(loop(x, w, reps))
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f'cin={cin:3d} cout={cout:3d} mode={mode:4s}: '
                  f'{dt:7.2f} ms/conv', flush=True)
            del loop


if __name__ == '__main__':
    main()
