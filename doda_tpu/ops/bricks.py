"""Dense-brick sparse tensor engine — the fast TPU backbone path.

Motivation (measured on v5e): TPU row-gathers cost ~20-25 ns per row
regardless of row width, so the voxel-level gather-GEMM engine in
``sparse.py`` pays ~170 ms per 3^3 conv at 260k voxels — 100x off HBM
speed-of-light. This module re-blocks the sparse volume into dense
4x4x4 *bricks* so that

* irregular work (dedup, neighbor search) happens at brick granularity
  (64x fewer elements),
* gathers move whole 2-4 KB brick rows (the efficient regime),
* the convolution itself is a *dense, regular* 3D conv over halo-padded
  bricks — pure MXU work with zero-masked inactive cells.

Semantics are exactly submanifold sparse convolution (spconv v1.2's
SubMConv3d / SparseConv3d k2s2 / SparseInverseConv3d as used by the
reference U-Net, model/unet_block.py:14-85): inactive cells hold zeros
on input and are re-masked on output, so they contribute nothing —
verified against the gather engine in tests/test_bricks.py.

Data model (per scene; vmap over a batch):
  BrickGrid.table : CoordTable of brick coords, capacity B_cap
  occ             : (B_cap, 64) bool — active cells (x*16 + y*4 + z)
  feats           : (B_cap, 64, C) with zeros at inactive cells

Invariant: every feature tensor entering a conv is zero at inactive
cells (norm layers re-apply the mask).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import CoordTable, pad_rows, unique_coords_packed
from .sparse import build_subm_rulebook

# Brick side. 4 is the measured sweet spot on v5e: BRICK=2 quarters the
# padded lane bytes at L0 (cell occupancy 22% vs 5.4%) but shifts the
# whole level pyramid one step (2x the gather rows at every level) —
# benched 4.327 vs 4.432 scenes/sec, a wash. All static maps derive
# from this constant; DODA_BRICK exists for experiments/tests only.
BRICK = int(__import__('os').environ.get('DODA_BRICK', '4'))
CELLS = BRICK ** 3
_H = BRICK // 2             # downsampled brick side
WINDOWS = _H ** 3           # stride-2 output positions per brick


def _cell_index(coords_mod: jax.Array) -> jax.Array:
    return (coords_mod[..., 0] * (BRICK * BRICK)
            + coords_mod[..., 1] * BRICK + coords_mod[..., 2])


class BrickGrid(NamedTuple):
    table: CoordTable   # brick coords; table.p2v maps point -> brick id
    occ: jax.Array      # (B_cap, CELLS) bool
    p2c: jax.Array      # (N_cap,) int32 cell of each point
    num_voxels: jax.Array  # () int32 active-cell count
    # the brickify sort, shared with the feature reduction (saves one
    # N-row sort per scene in _brick_feats_sorted):
    sort_cell: jax.Array   # (N_cap,) int32 flat cell id b*64+c in sorted
    #                        (brick, cell) order; INT32_MAX past valid
    sort_pos: jax.Array    # (N_cap,) int32 original point row per slot

    @property
    def b_cap(self) -> int:
        return self.occ.shape[0]

    @property
    def p2b(self) -> jax.Array:
        return self.table.p2v

    def flat_index(self) -> jax.Array:
        """Point -> flat cell id in [0, B_cap*CELLS]; null -> B_cap*CELLS."""
        idx = self.p2b * CELLS + self.p2c
        return jnp.where(self.p2b >= self.b_cap,
                         self.b_cap * CELLS, idx).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def brickify(coords: jax.Array, valid: jax.Array, b_cap: int) -> BrickGrid:
    """Voxel coords (N_cap, 3) -> brick grid (the voxelizer front door).

    Replaces the point->voxel hash of ref voxelize.cpp:61-155; here the
    dedup runs over brick coords (64x smaller) and cell occupancy is a
    boolean scatter.

    The dedup sort carries ``cell*N + pos`` as a second key, so the
    sorted stream comes out in (brick, cell) order — exactly what the
    sort-based feature reduction needs — and ``_brick_feats_sorted``
    reuses it instead of sorting the N points again (the table ids and
    p2v are identical to a plain ``unique_coords_packed``: both orders
    are lexicographic in the packed brick key)."""
    from .coords import pack_coords1, MAX_COORD, _SENTINEL
    from .coords import PACK_BITS, _PACK_LIM
    n_pts = coords.shape[0]
    bcoords = coords // BRICK
    cell = _cell_index(coords % BRICK)
    cell = jnp.where(valid, cell, 0).astype(jnp.int32)

    k = pack_coords1(bcoords, valid)
    pos = jnp.arange(n_pts, dtype=jnp.int32)
    payload = cell * n_pts + pos         # < 64*N: fits int32 for N <= 32M
    ks, pls = jax.lax.sort((k, payload), num_keys=2)
    valid_s = ks != _SENTINEL
    cell_s = pls // n_pts
    pos_s = pls % n_pts

    first = jnp.zeros((n_pts,), dtype=bool).at[0].set(True)
    new = (first | (ks != jnp.roll(ks, 1))) & valid_s
    vid_s = jnp.cumsum(new.astype(jnp.int32)) - 1
    n = jnp.minimum(vid_s[-1] + 1, b_cap).astype(jnp.int32)
    vid_s = jnp.where(valid_s & (vid_s < b_cap), vid_s, b_cap)

    coords_s = jnp.stack([ks >> (2 * PACK_BITS),
                          (ks >> PACK_BITS) & (_PACK_LIM - 1),
                          ks & (_PACK_LIM - 1)], axis=-1)
    slot = jnp.where(new & (vid_s < b_cap), vid_s, b_cap)
    tcoords = jnp.full((b_cap + 1, 3), MAX_COORD, dtype=jnp.int32)
    tcoords = tcoords.at[slot].set(coords_s)
    tcoords = tcoords.at[b_cap].set(MAX_COORD)
    tcoords = tcoords[:b_cap]

    _, p2v = jax.lax.sort((pos_s, vid_s), num_keys=1)
    tk = pack_coords1(tcoords, jnp.arange(b_cap) < n)
    table = CoordTable(coords=tcoords, k1=tk, k2=jnp.zeros_like(tk), n=n,
                       p2v=p2v)

    occ = jnp.zeros((b_cap + 1, CELLS), bool)
    occ = occ.at[vid_s, cell_s].set(valid_s)
    occ = occ[:b_cap]
    sort_cell = jnp.where(valid_s & (vid_s < b_cap),
                          vid_s * CELLS + cell_s, _SENTINEL)
    return BrickGrid(table=table, occ=occ, p2c=cell,
                     num_voxels=occ.sum().astype(jnp.int32),
                     sort_cell=sort_cell.astype(jnp.int32),
                     sort_pos=pos_s.astype(jnp.int32))


def row_gather_128(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather of a 2D table at full-(8,128)-tile granularity.

    XLA stores a (R, W) table with W < 128 lanes column-relayouted and
    lowers its row gather element-strided (measured ~24 ms for 786k x 16
    f32 rows vs the ~1 ns/row full-tile floor). When g = lcm(W,128)/W
    rows group into full tiles and R % g == 0, gather g rows at a time
    and select the sub-row with a one-hot multiply-reduce (fuses into
    the gather's output pass). Callers must pre-clamp idx into [0, R).
    """
    r, w = table.shape
    g = 1
    while (w * g) % 128 and g < 128:
        g += 1
    if g == 1 or (w * g) % 128 or r % g:
        return table[idx]
    grp = table.reshape(r // g, g * w)
    rows = grp[idx // g]                      # (..., g*w) full-tile rows
    onehot = (idx % g)[..., None] == jnp.arange(g, dtype=jnp.int32)
    picked = (rows.reshape(idx.shape + (g, w))
              * onehot[..., None].astype(rows.dtype)).sum(-2)
    return picked


def brick_feats(feats: jax.Array, grid: BrickGrid, mode: int = 4) -> jax.Array:
    """Reduce point features into brick cells: (N_cap, C) -> (B_cap, 64, C).

    mode 4 = mean, 3 = sum (ref voxelize.cu:10-31 fwd scatter)."""
    n_seg = grid.b_cap * CELLS
    flat = grid.flat_index()
    total = jax.ops.segment_sum(feats, flat, num_segments=n_seg + 1)[:n_seg]
    if mode == 3:
        out = total
    elif mode == 4:
        count = jax.ops.segment_sum(jnp.ones((feats.shape[0],), feats.dtype),
                                    flat, num_segments=n_seg + 1)[:n_seg]
        out = total / jnp.maximum(count, 1.0)[:, None]
    else:
        raise NotImplementedError(f'brick voxel mode {mode}')
    return out.reshape(grid.b_cap, CELLS, feats.shape[-1])


def brick_feats_2d(feats: jax.Array, grid: BrickGrid,
                   mode: int = 4) -> jax.Array:
    """Like ``brick_feats`` but emits the wide-lane (B_cap, 64*C) layout.

    ``DODA_FEATS=scatter`` selects the channel-major segment-sum
    (786k-row f32 scatter-add at the ~90 ns/row floor — 65 ms traced at
    bench scale); the default sort-based path reduces duplicates with a
    cumsum and never issues an f32 scatter."""
    import os
    if os.environ.get('DODA_FEATS', '') != 'scatter':
        return _brick_feats_sorted(feats, grid, mode)
    n_seg = grid.b_cap * CELLS
    flat = grid.flat_index()
    c = feats.shape[-1]
    tot_t = jax.vmap(lambda col: jax.ops.segment_sum(
        col, flat, num_segments=n_seg + 1)[:n_seg], in_axes=1)(feats)
    if mode == 4:
        count = jax.ops.segment_sum(jnp.ones((feats.shape[0],), feats.dtype),
                                    flat, num_segments=n_seg + 1)[:n_seg]
        tot_t = tot_t / jnp.maximum(count, 1.0)[None, :]
    elif mode != 3:
        raise NotImplementedError(f'brick voxel mode {mode}')
    # (C, B*64) -> (B, 64*C) cell-major interleave
    out = tot_t.reshape(c, grid.b_cap, CELLS).transpose(1, 2, 0)
    return out.reshape(grid.b_cap, CELLS * c)


def _brick_feats_sorted(feats: jax.Array, grid: BrickGrid,
                        mode: int = 4) -> jax.Array:
    """Point->cell reduction without any f32 scatter.

    The f32 scatter-add floor is ~90 ns/row regardless of width, so
    scattering every point (or even every voxel) dominates. Instead:

    1. sort points by flat cell id (one int32 key),
    2. expand each sorted point into a 16*(C+1)-lane x-slice row (its
       C features + a count 1.0 at its cell's lane block) and cumsum —
       a vector scan, no scatter,
    3. per slice-run, row value = cum[end] - cum[start-1]: run starts
       and ends come from vector compares + one small INT scatter
       (~8.6 ns/row) of run positions,
    4. the dense (B*4, 16*(C+1)) table is a row GATHER of the compact
       run values through a slice->run int map.

    Cell lanes of untouched cells/slices come out exactly zero, so the
    engine invariant holds.
    """
    n, c = feats.shape
    b4 = grid.b_cap * BRICK
    lanes = c + 1
    slice_cells = BRICK * BRICK             # 16
    sent = jnp.iinfo(jnp.int32).max

    # the (brick, cell)-sorted stream comes from brickify's dedup sort
    # (BrickGrid.sort_cell/sort_pos) — no second N-row sort here
    ks = grid.sort_cell
    pos = jnp.arange(n, dtype=jnp.int32)
    fs = feats[grid.sort_pos].astype(jnp.float32)    # (N, C)
    valid_s = ks != sent

    # lane-expanded slice rows: point at cell_lo owns lanes
    # [cell_lo*lanes, (cell_lo+1)*lanes)
    cell_lo = jnp.where(valid_s, ks % slice_cells, 0)
    fs_ext = jnp.concatenate(
        [fs, jnp.ones((n, 1), jnp.float32)], axis=1)   # (N, C+1)
    tiled = jnp.tile(fs_ext, (1, slice_cells))         # (N, 16*(C+1))
    lane_cell = jnp.arange(slice_cells * lanes, dtype=jnp.int32) // lanes
    mask = (lane_cell[None, :] == cell_lo[:, None]) & valid_s[:, None]
    cum = jnp.cumsum(jnp.where(mask, tiled, 0.0), axis=0)

    srow_s = jnp.where(valid_s, ks // slice_cells, b4)  # slice id, sorted
    first = jnp.zeros((n,), bool).at[0].set(True)
    new = (first | (srow_s != jnp.roll(srow_s, 1))) & valid_s
    run = jnp.cumsum(new.astype(jnp.int32)) - 1         # run rank
    # start position of each run (int scatter, null runs -> dump row n)
    r_cap = n                                            # runs <= points
    start_pos = jnp.full((r_cap + 1,), 0, jnp.int32)
    start_pos = start_pos.at[jnp.where(new, run, r_cap)].set(pos)
    start_pos = start_pos[:r_cap]
    run_slice = jnp.full((r_cap + 1,), b4, jnp.int32)
    run_slice = run_slice.at[jnp.where(new, run, r_cap)].set(srow_s)
    run_slice = run_slice[:r_cap]
    n_runs = jnp.where(valid_s.any(), run[-1] + 1, 0)
    # end position: one before the next run's start (last run -> n-1)
    end_pos = jnp.concatenate(
        [start_pos[1:] - 1, jnp.array([n - 1], jnp.int32)])
    end_pos = jnp.where(jnp.arange(r_cap) == n_runs - 1, n - 1, end_pos)

    # run value = cum[end] - cum[start-1]. The rows are 16*(C+1) lanes
    # (64 at Cin=3) — sub-tile, so plain gathers of cum go
    # element-strided; gather at 128-lane group granularity instead
    # (row_gather_128, ~35 ms -> ~2 ms traced at bench scale). start-1
    # handled by clamp+where, NOT a shifted cum_prev copy (which
    # duplicated the whole (N, 16L) table).
    ge = row_gather_128(cum, end_pos)
    # runs tile the sorted stream back-to-back (start_r = end_{r-1}+1),
    # so cum[start_r - 1] == cum[end_{r-1}] and the second cum gather is
    # just a one-run shift of the first — saves a full r_cap-row f32
    # gather (~12 ms traced at bench scale). Run 0 starts at sorted
    # position 0 (valid keys sort first), so its prefix is zero.
    gs = jnp.concatenate([jnp.zeros_like(ge[:1]), ge[:-1]], axis=0)
    vals = ge - gs                                       # (r_cap, 16L)
    vals = jnp.where((jnp.arange(r_cap) < n_runs)[:, None], vals, 0.0)

    # dense slice rows by gather through a slice -> run int map; null
    # slices clamp to row 0 and get zeroed by the where (rows past
    # n_runs are already zero, so clamping is safe)
    s2run = jnp.full((b4 + 1,), r_cap, jnp.int32)
    s2run = s2run.at[run_slice].set(jnp.arange(r_cap, dtype=jnp.int32))
    s2run = s2run[:b4]
    dense = row_gather_128(vals, jnp.minimum(s2run, r_cap - 1))
    dense = jnp.where((s2run < r_cap)[:, None], dense, 0.0)

    d3 = dense.reshape(b4, slice_cells, lanes)
    total = d3[:, :, :c]
    if mode == 4:
        count = jnp.maximum(d3[:, :, c], 1.0)
        total = total / count[:, :, None]
    elif mode != 3:
        raise NotImplementedError(f'brick voxel mode {mode}')
    return total.reshape(grid.b_cap, CELLS * c).astype(feats.dtype)


def unbrick_feats(bfeats: jax.Array, grid: BrickGrid) -> jax.Array:
    """Broadcast cell features back to points (voxel->point gather,
    ref model/unet.py:62). (B_cap, 64, C) -> (N_cap, C)."""
    c = bfeats.shape[-1]
    flat = bfeats.reshape(-1, c)
    return pad_rows(flat)[grid.flat_index()]


# ---------------------------------------------------------------------------
# Halo assembly + submanifold conv
# ---------------------------------------------------------------------------

def build_brick_rulebook(table: CoordTable) -> jax.Array:
    """(B_cap, 27) neighbor-brick ids (shared per level, like spconv's
    ``indice_key='subm{i}'``; ref model/unet_block.py:62)."""
    return build_subm_rulebook(table, 3, packed=True)


def _axis_range(d: int):
    """Source cells along one axis contributed to a neighbor at offset d."""
    if d == -1:
        return [BRICK - 1]
    if d == 0:
        return list(range(BRICK))
    return [0]


_OFFS3 = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          for dz in (-1, 0, 1)]


@functools.lru_cache(maxsize=None)
def _shell_layout(c: int):
    """Static maps for the exact shell-gather halo.

    Returns (piece_cols, halo_perm):
    * piece_cols: list of (offset_index o, column array) — the columns of
      a brick's flat (CELLS*c) row that neighbor direction o needs (its
      facing face/edge/corner; 6x(B^2) + 12xB + 8x1 cells total, ~2x the
      brick instead of the 27x a full-neighbor gather moves),
    * halo_perm: columns into concat([center, gathered pieces...], axis=1)
      building the flat (BRICK+2)^3*c halo.
    """
    piece_cols = []
    piece_start = {}
    start = CELLS * c  # concat buffer begins with the center brick
    for o, (dx, dy, dz) in enumerate(_OFFS3):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        cells = [x * BRICK * BRICK + y * BRICK + z
                 for x in _axis_range(dx)
                 for y in _axis_range(dy)
                 for z in _axis_range(dz)]
        cols = (np.asarray(cells, np.int32)[:, None] * c
                + np.arange(c, dtype=np.int32)).reshape(-1)
        piece_cols.append((o, cols))
        piece_start[o] = start
        start += len(cols)

    def split(h):
        if h == 0:
            return -1, BRICK - 1
        if h <= BRICK:
            return 0, h - 1
        return 1, 0

    hp = np.zeros((BRICK + 2, BRICK + 2, BRICK + 2, c), np.int32)
    for hx in range(BRICK + 2):
        dx, sx = split(hx)
        for hy in range(BRICK + 2):
            dy, sy = split(hy)
            for hz in range(BRICK + 2):
                dz, sz = split(hz)
                if (dx, dy, dz) == (0, 0, 0):
                    base = (sx * BRICK * BRICK + sy * BRICK + sz) * c
                else:
                    o = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
                    rx, ry, rz = (_axis_range(dx), _axis_range(dy),
                                  _axis_range(dz))
                    pos = (rx.index(sx) * len(ry) * len(rz)
                           + ry.index(sy) * len(rz) + rz.index(sz))
                    base = piece_start[o] + pos * c
                hp[hx, hy, hz] = base + np.arange(c)
    return piece_cols, hp.reshape(-1)


# --- v2 fast path: piece-major extraction + concat halo + XLA conv ---
#
# Measured (v5e, B=98304, cin=16): the old shell-gather assembly cost
# ~20 ms/conv, of which ~90% was *piece-table construction* (26
# lane-strided column relayouts of x2) — the row gathers themselves run at
# ~1 ns/row marginal. v2 extracts all boundary cells once into a
# contiguous piece-major table (pure slices), gathers rows from it, and
# places them into the halo with static dynamic-update-slices; the conv is
# a dense lax.conv_general_dilated (exact taps, MXU-optimal — no banding).

def _src_tgt_slices(d: int):
    """Per-axis (source cells in the neighbor, halo target cells)."""
    if d == -1:
        return slice(BRICK - 1, BRICK), slice(0, 1)
    if d == 0:
        return slice(0, BRICK), slice(1, BRICK + 1)
    return slice(0, 1), slice(BRICK + 1, BRICK + 2)


@functools.lru_cache(maxsize=None)
def _piece_plan():
    """Static plan: per direction (offset index, source slices, halo
    target slices, start offset in the piece-major table, cell count)."""
    plan = []
    start = 0
    for o, (dx, dy, dz) in enumerate(_OFFS3):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        (sx, tx), (sy, ty), (sz, tz) = (_src_tgt_slices(dx),
                                        _src_tgt_slices(dy),
                                        _src_tgt_slices(dz))
        n = ((sx.stop - sx.start) * (sy.stop - sy.start)
             * (sz.stop - sz.start))
        plan.append((o, (sx, sy, sz), (tx, ty, tz), start, n))
        start += n
    return tuple(plan), start   # start == 152 total piece cells


def extract_pieces(x4: jax.Array) -> jax.Array:
    """(B, 4, 4, 4, C) -> (B, 152, C): boundary cells, piece-major.

    Piece p of brick b (the cells direction-o neighbors read from b) is
    the contiguous rows [start_o, start_o + n_o) — so per-direction
    neighbor fetches are slice+row-gather with no lane relayout."""
    plan, _ = _piece_plan()
    parts = [x4[:, sx, sy, sz].reshape(x4.shape[0], -1, x4.shape[-1])
             for _, (sx, sy, sz), _, _, _ in plan]
    return jnp.concatenate(parts, axis=1)


def subm_conv3_v2(bfeats: jax.Array, occ: jax.Array, nbr: jax.Array,
                  weights: jax.Array, compute_dtype=jnp.bfloat16,
                  chunk: int | None = None) -> jax.Array:
    """Submanifold 3^3 conv (spconv SubMConv3d semantics,
    ref model/unet_block.py:26-29) — fast assembly, exact-tap dense conv.

    Same signature/semantics as ``subm_conv3`` (the oracle). ``chunk``
    (lax.map over brick blocks) exists only to bound halo liveness on
    tiny-HBM parts and must stay None on v5e: inside the while loop XLA
    assigns the loop-carried piece table a brick-strided layout
    ({2,0,1}) that turns every gather element-strided — traced at
    ~30x the unchunked conv cost (420 ms vs 15 ms at the bench level-0
    shape), plus ~150 ms relayout copies per conv feeding the loop."""
    b_cap, _, cin = bfeats.shape
    cout = weights.shape[2]
    w = weights.reshape(3, 3, 3, cin, cout).astype(compute_dtype)
    x4 = bfeats.astype(compute_dtype).reshape(b_cap, BRICK, BRICK, BRICK,
                                              cin)
    plan, n_piece = _piece_plan()
    tab = jnp.pad(extract_pieces(x4), ((0, 1), (0, 0), (0, 0)))

    def conv_chunk(args):
        x4c, nbrc, occc = args
        gathered = {}
        for o, (sx, sy, sz), _, st, n in plan:
            lx = sx.stop - sx.start
            ly = sy.stop - sy.start
            lz = sz.stop - sz.start
            g = tab[:, st:st + n][nbrc[:, o]]
            gathered[_OFFS3[o]] = g.reshape(-1, lx, ly, lz, cin)

        def part(dx, dy, dz):
            return x4c if (dx, dy, dz) == (0, 0, 0) else gathered[(dx, dy,
                                                                   dz)]

        def xrow(dx):
            yparts = [jnp.concatenate([part(dx, dy, -1), part(dx, dy, 0),
                                       part(dx, dy, 1)], axis=3)
                      for dy in (-1, 0, 1)]
            return jnp.concatenate(yparts, axis=2)

        halo = jnp.concatenate([xrow(-1), xrow(0), xrow(1)], axis=1)
        # barrier: without it XLA fuses the whole assembly into the
        # conv's window reads, recomputing it up to 27x (measured 114 ms
        # vs ~25 ms for the materialized form at the bench level-0 shape)
        halo = jax.lax.optimization_barrier(halo)
        out = jax.lax.conv_general_dilated(
            halo, w, (1, 1, 1), 'VALID',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        out = out.astype(jnp.float32).reshape(-1, CELLS, cout)
        return jnp.where(occc[..., None], out, 0.0)

    if chunk is None or b_cap <= chunk:
        return conv_chunk((x4, nbr, occ))
    n_chunks = -(-b_cap // chunk)
    pad = n_chunks * chunk - b_cap
    if pad:
        x4 = jnp.pad(x4, ((0, pad),) + ((0, 0),) * 4)
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)), constant_values=b_cap)
        occ = jnp.pad(occ, ((0, pad), (0, 0)))
    out = jax.lax.map(conv_chunk,
                      (x4.reshape(n_chunks, chunk, BRICK, BRICK, BRICK,
                                  cin),
                       nbr.reshape(n_chunks, chunk, 27),
                       occ.reshape(n_chunks, chunk, CELLS)))
    return out.reshape(n_chunks * chunk, CELLS, cout)[:b_cap]


def subm_conv3(bfeats: jax.Array, occ: jax.Array, nbr: jax.Array,
               weights: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Submanifold 3^3 conv on bricks: shell-gather halo + dense conv (MXU).

    bfeats  (B_cap, 64, Cin) — zero at inactive cells (invariant)
    weights (27, Cin, Cout) raster (dx, dy, dz) — same layout as the
            gather engine, reshapeable to (3, 3, 3, Cin, Cout)
    returns (B_cap, 64, Cout) f32, masked to active cells

    Halo assembly is an *exact shell gather*: each neighbor direction
    contributes only its facing face/edge/corner cells (26 small row
    gathers moving ~2x the brick data), instead of gathering 27 full
    neighbor bricks (27x amplification, measured bandwidth-bound).
    """
    b_cap = bfeats.shape[0]
    cin = weights.shape[1]
    cout = weights.shape[2]
    x2 = bfeats.astype(compute_dtype).reshape(b_cap, CELLS * cin)
    w = weights.reshape(3, 3, 3, cin, cout).astype(compute_dtype)
    piece_cols, halo_perm = _shell_layout(cin)
    halo_perm = jnp.asarray(halo_perm)

    # compact shell arrays built once per conv input (~1x brick data)
    x2p = pad_rows(x2)
    pieces = [pad_rows(x2[:, jnp.asarray(cols)]) for _, cols in piece_cols]

    def chunk_conv(nbr_chunk):
        parts = [x2p[nbr_chunk[:, 13]]]  # center == self row
        parts += [piece[nbr_chunk[:, o]]
                  for piece, (o, _) in zip(pieces, piece_cols)]
        buf = jnp.concatenate(parts, axis=1)
        halo = buf[:, halo_perm].reshape(
            -1, BRICK + 2, BRICK + 2, BRICK + 2, cin)
        # conv stays wholly in compute_dtype: a f32 preferred_element_type
        # output makes the transpose (VJP) conv see mixed f32/bf16
        # operands and fail; the MXU accumulates in f32 either way.
        out = jax.lax.conv_general_dilated(
            halo, w, (1, 1, 1), 'VALID',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return out.astype(jnp.float32).reshape(-1, CELLS, cout)

    # chunk bricks to bound transient liveness (XLA's TPU scheduler
    # otherwise overlaps many convs' halos and blows HBM)
    chunk = max(256, min(2048, b_cap))
    if b_cap <= chunk:
        out = chunk_conv(nbr)
    else:
        n_chunks = -(-b_cap // chunk)
        pad = n_chunks * chunk - b_cap
        nbr_p = jnp.pad(nbr, ((0, pad), (0, 0)),
                        constant_values=b_cap) if pad else nbr
        out = jax.lax.map(chunk_conv, nbr_p.reshape(n_chunks, chunk, 27))
        out = out.reshape(n_chunks * chunk, CELLS, cout)[:b_cap]
    return jnp.where(occ[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Stride-2 down/up sampling between brick levels
# ---------------------------------------------------------------------------

def _parity_cell_map() -> np.ndarray:
    """(8 parities, WINDOWS positions) -> parent cell id.

    A child brick with coord parity (rx, ry, rz) writes its (BRICK/2)^3
    downsampled block into the parent-brick sub-cube at corner
    (rx, ry, rz) * BRICK/2."""
    m = np.zeros((8, WINDOWS), np.int32)
    for pr in range(8):
        rx, ry, rz = pr >> 2 & 1, pr >> 1 & 1, pr & 1
        for p in range(WINDOWS):
            i, j, k = p // (_H * _H), p // _H % _H, p % _H
            m[pr, p] = ((rx * _H + i) * BRICK * BRICK
                        + (ry * _H + j) * BRICK + (rz * _H + k))
    return m


_PARITY_CELLS = _parity_cell_map()


class BrickDown(NamedTuple):
    """Level link for stride-2 sampling (spconv ``indice_key='spconv{i}'``
    pairing of SparseConv3d and SparseInverseConv3d,
    ref model/unet_block.py:70-78).

    parent       : CoordTable of coarse brick coords (P_cap)
    parent_occ   : (P_cap, CELLS) bool
    child_parent : (B_cap,) int32 (null = P_cap)
    target_cells : (B_cap, WINDOWS) int32 parent cells per child block
    parent_src   : (P_cap, CELLS) int32 — inverse map: the flat child
                   window slot (child * WINDOWS + w) feeding each parent
                   cell, or B_cap * WINDOWS for none. Each parent cell
                   has at most ONE source child (child coords are
                   unique), so both conv directions are pure gathers —
                   the scatter runs once here (int indices, per plan)
                   instead of per conv (traced at ~100 ms per f32
                   feature scatter-add at the level-0 shape).
    parity       : (B_cap,) int32 — child coord parity (octant in the
                   parent), rx*4 + ry*2 + rz.
    parent_children : (P_cap, 8) int32 — child brick id per parent
                   octant (null = B_cap); the wide-lane engine
                   (bricks2d) assembles parents by 8 row gathers.
    """

    parent: CoordTable
    parent_occ: jax.Array
    child_parent: jax.Array
    target_cells: jax.Array
    parent_src: jax.Array
    parity: jax.Array
    parent_children: jax.Array


@functools.partial(jax.jit, static_argnums=(2,))
def build_brick_downsample(table: CoordTable, occ: jax.Array,
                           p_cap: int) -> BrickDown:
    valid = table.valid
    parent = unique_coords_packed(table.coords // 2, valid, p_cap)
    child_parent = parent.p2v
    parity = ((table.coords[:, 0] & 1) * 4 + (table.coords[:, 1] & 1) * 2
              + (table.coords[:, 2] & 1))
    parity = jnp.where(valid, parity, 0)
    target_cells = jnp.asarray(_PARITY_CELLS)[parity]  # (B_cap, WINDOWS)

    # parent cell active iff any fine voxel in its 2^3 window is active
    occ_blocks = occ.reshape(-1, _H, 2, _H, 2, _H, 2)
    # per axis: cell = hi * 2 + lo -> (x_hi, x_lo, y_hi, y_lo, z_hi, z_lo)
    occ2 = occ_blocks.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        -1, WINDOWS, 8)
    child_occ2 = occ2.any(-1)  # (B_cap, WINDOWS) downsampled occupancy
    pocc = jnp.zeros((p_cap + 1, CELLS), bool)
    pocc = pocc.at[child_parent[:, None], target_cells].max(
        child_occ2 & valid[:, None])

    b_cap = child_parent.shape[0]
    flat_parent = jnp.where(valid[:, None] & (child_parent[:, None] < p_cap),
                            child_parent[:, None] * CELLS + target_cells,
                            p_cap * CELLS)
    inv = jnp.full((p_cap * CELLS + 1,), b_cap * WINDOWS, jnp.int32)
    inv = inv.at[flat_parent.reshape(-1)].set(
        jnp.arange(b_cap * WINDOWS, dtype=jnp.int32))

    pc = jnp.full((p_cap + 1, 8), b_cap, jnp.int32)
    row = jnp.where(valid & (child_parent < p_cap), child_parent, p_cap)
    pc = pc.at[row, parity].set(
        jnp.arange(b_cap, dtype=jnp.int32))
    return BrickDown(parent=parent, parent_occ=pocc[:p_cap],
                     child_parent=child_parent, target_cells=target_cells,
                     parent_src=inv[:p_cap * CELLS].reshape(p_cap, CELLS),
                     parity=parity.astype(jnp.int32),
                     parent_children=pc[:p_cap])


def _occ_cell_order(x: jax.Array) -> jax.Array:
    """Reshape (B, 64, ...) cell-major tensors to (B, 4, 4, 4, ...)."""
    return x.reshape(x.shape[0], BRICK, BRICK, BRICK, *x.shape[2:])


def _down_im2col(bfeats: jax.Array, compute_dtype) -> jax.Array:
    """(B_cap, 64, Cin) -> (B_cap*WINDOWS, 8*Cin) k2s2 window rows."""
    b_cap, _, cin = bfeats.shape
    x = _occ_cell_order(bfeats).astype(compute_dtype)
    x = x.reshape(b_cap, _H, 2, _H, 2, _H, 2, cin)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b_cap * WINDOWS, 8 * cin)


def _down_uncol(dx_col: jax.Array, b_cap: int, cin: int) -> jax.Array:
    """Transpose of ``_down_im2col`` (a pure relayout, so exact)."""
    x = dx_col.reshape(b_cap, _H, _H, _H, 2, 2, 2, cin)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b_cap, CELLS, cin)


def _gather_child(g: jax.Array, ds: BrickDown) -> jax.Array:
    """g (P_cap, CELLS, C) -> (B_cap, WINDOWS, C): each child window
    reads its parent cell (the transpose direction of ``parent_src``)."""
    p_cap, _, c = g.shape
    flat = jnp.minimum(ds.child_parent[:, None] * CELLS + ds.target_cells,
                       p_cap * CELLS)
    return pad_rows(g.reshape(-1, c))[flat]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def down_conv2(bfeats: jax.Array, ds: BrickDown, weights: jax.Array,
               compute_dtype=jnp.bfloat16) -> jax.Array:
    """SparseConv3d(k=2, s=2) on bricks.

    bfeats (B_cap, 64, Cin) -> parent (P_cap, 64, Cout).
    weights (8, Cin, Cout) indexed by fine offset (dx*4 + dy*2 + dz),
    reshapeable to (2, 2, 2, Cin, Cout).

    Both directions are gathers via the plan's precomputed maps (see
    ``BrickDown.parent_src``); the custom VJP keeps the backward a
    gather too (autodiff would emit a per-conv scatter-add)."""
    b_cap, _, cin = bfeats.shape
    cout = weights.shape[-1]
    x = _down_im2col(bfeats, compute_dtype)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    child_out = jnp.dot(x, w).astype(jnp.float32)
    pf = pad_rows(child_out)[ds.parent_src]   # (P_cap, CELLS, Cout)
    return jnp.where(ds.parent_occ[..., None], pf, 0.0)


def _down_conv2_fwd(bfeats, ds, weights, compute_dtype):
    return down_conv2(bfeats, ds, weights, compute_dtype), (bfeats, ds,
                                                            weights)


def _down_conv2_bwd(compute_dtype, res, g):
    bfeats, ds, weights = res
    b_cap, _, cin = bfeats.shape
    cout = weights.shape[-1]
    g = jnp.where(ds.parent_occ[..., None], g, 0.0)
    g_child = _gather_child(g, ds).astype(compute_dtype).reshape(
        b_cap * WINDOWS, cout)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    dx_col = jnp.dot(g_child, w.T).astype(jnp.float32)
    dx = _down_uncol(dx_col, b_cap, cin).astype(bfeats.dtype)
    x = _down_im2col(bfeats, compute_dtype)
    dw = jnp.dot(x.T, g_child).astype(weights.dtype).reshape(8, cin, cout)
    return dx, None, dw


down_conv2.defvjp(_down_conv2_fwd, _down_conv2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def up_conv2(parent_feats: jax.Array, occ: jax.Array, ds: BrickDown,
             weights: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """SparseInverseConv3d(k=2) on bricks — exact inverse of ``down_conv2``.

    parent (P_cap, 64, Cin) -> child (B_cap, 64, Cout); each fine cell v
    reads its covering parent cell v//2 through W[v mod 2] and the output
    coord set is exactly the pre-downsample one (indice_key reuse).
    ``occ`` is the *child* grid occupancy. Gathers both ways (custom VJP
    routes the backward through ``parent_src``)."""
    cin = parent_feats.shape[-1]
    cout = weights.shape[-1]
    b_cap = ds.child_parent.shape[0]
    corner = _gather_child(parent_feats, ds).astype(compute_dtype)
    # out[(xh xl)(yh yl)(zh zl)] = corner[xh, yh, zh] @ W[xl*4+yl*2+zl]
    w = jnp.transpose(weights, (1, 0, 2)).reshape(cin, 8 * cout)
    out8 = jnp.dot(corner.reshape(b_cap * WINDOWS, cin),
                   w.astype(compute_dtype))
    out8 = out8.astype(jnp.float32).reshape(b_cap, _H, _H, _H, 2, 2, 2,
                                            cout)
    #        (b, xh, yh, zh, xl, yl, zl, c) -> (b, xh, xl, yh, yl, zh, zl, c)
    out = out8.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b_cap, CELLS, cout)
    return jnp.where(occ[..., None], out, 0.0)


def _up_conv2_fwd(parent_feats, occ, ds, weights, compute_dtype):
    return (up_conv2(parent_feats, occ, ds, weights, compute_dtype),
            (parent_feats, occ, ds, weights))


def _up_conv2_bwd(compute_dtype, res, g):
    parent_feats, occ, ds, weights = res
    cin = parent_feats.shape[-1]
    cout = weights.shape[-1]
    b_cap = ds.child_parent.shape[0]
    g = jnp.where(occ[..., None], g, 0.0)
    # transpose of the out8 relayout: (b, 64, cout) -> (b*WINDOWS, 8*cout)
    g8 = g.reshape(b_cap, _H, 2, _H, 2, _H, 2, cout)
    g8 = g8.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b_cap * WINDOWS, 8 * cout).astype(compute_dtype)
    w = jnp.transpose(weights, (1, 0, 2)).reshape(cin, 8 * cout)
    dcorner = jnp.dot(g8, w.astype(compute_dtype).T).astype(jnp.float32)
    # children -> parents via the inverse map (gather, not scatter)
    dpf = pad_rows(dcorner)[ds.parent_src]
    dpf = jnp.where(ds.parent_occ[..., None], dpf, 0.0)
    corner = _gather_child(parent_feats, ds).astype(compute_dtype)
    dw8 = jnp.dot(corner.reshape(b_cap * WINDOWS, cin).T, g8)
    dw = jnp.transpose(dw8.reshape(cin, 8, cout), (1, 0, 2))
    return dpf.astype(parent_feats.dtype), None, None, dw.astype(
        weights.dtype)


up_conv2.defvjp(_up_conv2_fwd, _up_conv2_bwd)
