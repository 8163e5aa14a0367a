"""Bytes-moved roofline for the bench forward (PERF.md evidence).

Computes, from the bench scene's measured occupancy and the engine's
static traffic model, per-level and per-bucket bytes for one batch-4
forward, and the corresponding floors:

  * bandwidth floor at the v5e's ~800 GB/s HBM,
  * gather row-rate floor at the measured ~2 ns/row (PERF.md: big-row
    gathers are ROW-rate bound, width-independent, 1.7-3.2 ns/row),
  * an IDEALIZED occupied-cell algorithm (spconv-like: work
    proportional to occupied sites — read each active cell once,
    write each once, rulebook gathers at row rate) — the bound on what
    ANY engine of that family could do on this hardware.

Run on CPU (no TPU needed): python tools/roofline.py
"""

import _init_path  # noqa: F401
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, BRICK_CAP, N_CAP, make_scene  # noqa: E402
from doda_tpu.models.unet import default_brick_caps  # noqa: E402
from doda_tpu.ops import bricks  # noqa: E402

BW = 800e9                  # v5e HBM bytes/sec
ROW_NS = 2.0                # measured big-row gather ns/row (PERF.md)
MXU = 197e12                # measured peak bf16 TF/s on deep GEMMs
DT = 2                      # bf16 bytes

CELLS = bricks.CELLS        # 64
PLANE = 36                  # (BRICK+2)^2
NGATHER = 26                # 8 in-plane dirs + 2 x 9 x-plane sources


def level_stats():
    """Occupancy per level measured on the actual bench scenes."""
    rng = np.random.default_rng(0)
    caps = default_brick_caps(BRICK_CAP, 7)
    out = []
    for b in range(BATCH):
        c = make_scene(rng)
        coords = np.zeros((N_CAP, 3), np.int32)
        coords[:len(c)] = c
        valid = np.zeros((N_CAP,), bool)
        valid[:len(c)] = True
        grid = bricks.brickify(jnp.asarray(coords), jnp.asarray(valid),
                               caps[0])
        table, occ = grid.table, grid.occ
        stats = []
        for lvl in range(7):
            n_bricks = int(np.asarray(occ).any(1).sum())
            n_cells = int(np.asarray(occ).sum())
            stats.append((n_bricks, n_cells))
            if lvl < 6:
                ds = bricks.build_brick_downsample(table, occ,
                                                   caps[lvl + 1])
                table, occ = ds.parent, ds.parent_occ
        out.append(stats)
    # sum over batch
    agg = [(sum(s[l][0] for s in out), sum(s[l][1] for s in out))
           for l in range(7)]
    return caps, agg


def main():
    caps, occ_stats = level_stats()
    chans = [16 * (i + 1) for i in range(7)]
    # subm convs per level: input(+L0) + 2 head + 2 tail blocks x 2 convs
    n_subm = [9, 8, 8, 8, 8, 8, 4]

    print(f'{"lvl":>3} {"cap*4":>8} {"bricks":>8} {"cells":>9} '
          f'{"cell_occ%":>9} {"C":>4} {"convs":>5} '
          f'{"GB(engine)":>10} {"ms@BW":>7} {"ms@rows":>8} '
          f'{"GB(ideal)":>9} {"ms(ideal)":>9}')
    tot_engine = tot_bw = tot_rows = tot_ideal_b = tot_ideal_t = 0.0
    tot_mxu = 0.0
    for lvl in range(7):
        rows = BATCH * caps[lvl]
        n_br, n_cell = occ_stats[lvl]
        c = chans[lvl]
        k = n_subm[lvl]
        # engine traffic per subm conv, C-lane units per padded row
        # (PERF.md round-3 model, trace-validated at L0):
        #   x read 64 | tab write+read 180 | plane-row write 216 |
        #   y-split GEMM re-reads 576 | out write 64 | relayout 128 |
        #   norm/mask pass 128
        units = 64 + 180 + 216 + 576 + 64 + 128 + 128
        gb = rows * units * c * DT / 1e9 * k
        ms_bw = gb / (BW / 1e9) * 1e3
        # gather row-rate floor: 26 gathers x rows per conv
        ms_rows = NGATHER * rows * k * ROW_NS / 1e6
        # idealized occupied-cell engine: read each active cell once,
        # write once, plus rulebook gather at row rate (27 x cells) and
        # the exact-tap GEMM FLOPs at peak MXU
        ideal_gb = 2 * n_cell * c * DT / 1e9 * k
        ideal_gather_ms = 27 * n_cell * k * ROW_NS / 1e6
        ideal_flops = 2 * 27 * n_cell * c * c * k
        ideal_ms = max(ideal_gb / (BW / 1e9) * 1e3,
                       ideal_flops / MXU * 1e3) + ideal_gather_ms
        print(f'{lvl:>3} {rows:>8} {n_br:>8} {n_cell:>9} '
              f'{100 * n_cell / (rows * CELLS):>9.1f} {c:>4} {k:>5} '
              f'{gb:>10.2f} {ms_bw:>7.2f} {ms_rows:>8.2f} '
              f'{ideal_gb:>9.3f} {ideal_ms:>9.2f}')
        tot_engine += gb
        tot_bw += ms_bw
        tot_rows += ms_rows
        tot_ideal_b += ideal_gb
        tot_ideal_t += ideal_ms
    print(f'{"ALL":>3} {"":>8} {"":>8} {"":>9} {"":>9} {"":>4} {"":>5} '
          f'{tot_engine:>10.2f} {tot_bw:>7.2f} {tot_rows:>8.2f} '
          f'{tot_ideal_b:>9.3f} {tot_ideal_t:>9.2f}')
    print()
    print('floors for the batch-4 forward (subm convs only; down/up '
          'convs, point ops, plan build excluded):')
    print(f'  current wide-lane algorithm @ {BW / 1e9:.0f} GB/s: '
          f'{tot_bw:.0f} ms   -> {BATCH / (tot_bw / 1e3):.1f} scenes/sec '
          'bandwidth-bound ceiling')
    print(f'  current algorithm gather row-rate floor: {tot_rows:.0f} ms '
          f'-> {BATCH / (tot_rows / 1e3):.1f} scenes/sec if ONLY gathers '
          'remained')
    print(f'  idealized occupied-cell engine: {tot_ideal_t:.0f} ms '
          f'-> {BATCH / (tot_ideal_t / 1e3):.0f} scenes/sec')


if __name__ == '__main__':
    main()
