"""Slice-compacted window conv — the v4 submanifold engine for L0/L1.

Why: the wide-lane brick engine (``bricks2d``) processes every x-slice
of every capacity row densely, but measured ScanNet-shaped scenes occupy
only ~43% of brick x-slices at level 0 (~57% of issued GEMM rows and
most assembly bytes touch all-zero slices). This engine compacts the
conv to *occupied slices only*:

  rows     (S, 16*C)   one row per occupied x-slice (cells y*4+z raster)
  tab      (S, 20*C)   per-row boundary cells facing the 8 (dy,dz) dirs
  window   (S, 108*C)  the full 3x6x6 halo window of the slice, built by
                       27 row gathers (one per source slice: 3 x-shifted
                       center slices + 24 in-plane piece runs)
  out      (S, 16*Co)  TWO y-split GEMMs: outputs y in {0,1} only read
                       window Y in -1..2 (72C lanes), y in {2,3} read
                       Y in 1..4 — 2.67x the exact-tap FLOPs instead of
                       the 4x a monolithic (108C -> 16Co) contraction
                       issues, with n = 8*Co >= 128 staying MXU-wide.

Correctness: per-source gathers are oracle-exact (no P-row shortcut —
see bricks2d._xplane_blocks for the halo bug class this avoids by
construction). Sources come straight from the 27-neighbor brick
rulebook, so a missing face neighbor never hides a diagonal brick.

Semantics: spconv v1.2 SubMConv3d (ref model/unet_block.py:26-29),
cell-exact vs the ``bricks.subm_conv3`` oracle (tests/test_slabs.py).

Conventions: tables are flattened across the batch; the null row id is
``S`` (and the null slice id ``B4``); gathers clamp + where, never pad.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .bricks import BRICK, CELLS

SLICE = BRICK * BRICK        # 16 cells per x-slice, (y, z) raster z-minor
WIN = 3 * (BRICK + 2) ** 2   # 108 window cells per output slice
_OFFS2 = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
          if (dy, dz) != (0, 0)]


def dir3(dx: int, dy: int, dz: int) -> int:
    return ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)


# ---------------------------------------------------------------------------
# static layout tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tab_layout():
    """Boundary-cell table layout: per (dy, dz) dir, (start, cells).

    Cell order inside each piece is chosen so every consumer reads one
    contiguous lane run:
      (-1, 0): the y=3 row, z ascending  -> cells 12..15 (contiguous)
      ( 1, 0): the y=0 row               -> cells 0..3
      (0, +-1): the z-edge column, y ascending (strided in the source
                slice; stored contiguously here)
      corners: single cells
    """
    lay = {}
    start = 0
    for dy, dz in _OFFS2:
        ys = [BRICK - 1] if dy == -1 else (list(range(BRICK)) if dy == 0
                                           else [0])
        zs = [BRICK - 1] if dz == -1 else (list(range(BRICK)) if dz == 0
                                           else [0])
        cells = [y * BRICK + z for y in ys for z in zs]
        lay[(dy, dz)] = (start, tuple(cells))
        start += len(cells)
    return lay, start            # start == 20


def _runs(cells):
    runs = []
    for c in cells:
        if runs and runs[-1][0] + runs[-1][1] == c:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((c, 1))
    return runs


@functools.lru_cache(maxsize=None)
def _window_layout():
    """Window lane layout: [Y=-1..4][j=-1..1][3 Z-parts] = 54 blocks.

    Y-major so the y-split GEMMs read contiguous lane ranges. Each block
    is (source_offset o27, kind, lane0_cells, len_cells) where kind is
    'act' (lanes into the source's activation row) or 'tab' (lanes into
    the source's boundary table row).

    Window cell wi = (Y+1)*18 + (j+1)*6 + (Z+1) holds the input at
    in-plane position (Y, Z) of the x-shifted (by j) plane.
    """
    lay, _ = _tab_layout()
    blocks = []
    for Y in range(-1, BRICK + 1):
        dy = -1 if Y == -1 else (1 if Y == BRICK else 0)
        for j in (-1, 0, 1):
            # Z = -1 cell: from the (dy, -1) source piece
            st, cells = lay[(dy, -1)]
            pos = 0 if len(cells) == 1 else Y
            blocks.append((dir3(j, dy, -1), 'tab', st + pos, 1))
            # Z = 0..3 run
            if dy == 0:
                blocks.append((dir3(j, 0, 0), 'act', Y * BRICK, BRICK))
            else:
                st, cells = lay[(dy, 0)]
                blocks.append((dir3(j, dy, 0), 'tab', st, BRICK))
            # Z = 4 cell
            st, cells = lay[(dy, 1)]
            pos = 0 if len(cells) == 1 else Y
            blocks.append((dir3(j, dy, 1), 'tab', st + pos, 1))
    return tuple(blocks)


@functools.lru_cache(maxsize=None)
def _window_np():
    """One-hot map (WIN, SLICE, 27) from window cells to stencil taps."""
    m = np.zeros((WIN, SLICE, 27), np.float32)
    for Y in range(-1, BRICK + 1):
        for j in (-1, 0, 1):
            for Z in range(-1, BRICK + 1):
                wi = (Y + 1) * 18 + (j + 1) * 6 + (Z + 1)
                for y in range(BRICK):
                    for z in range(BRICK):
                        if abs(Y - y) <= 1 and abs(Z - z) <= 1:
                            m[wi, y * BRICK + z,
                              dir3(j, Y - y, Z - z)] = 1.0
    return m


def window_weights(w: jax.Array) -> jax.Array:
    """(27, cin, cout) raster (dx, dy, dz) -> (WIN*cin, SLICE*cout)."""
    cin, cout = w.shape[1], w.shape[2]
    m = jnp.asarray(_window_np(), w.dtype)
    wf = jnp.einsum('wsk,kio->wiso', m, w)
    return wf.reshape(WIN * cin, SLICE * cout)


# ---------------------------------------------------------------------------
# plan: slice compaction maps (per scene; cheap — no sorts, gathers only)
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class SlabMaps(NamedTuple):
    """Per-level slice compaction (flat across the batch after
    ``flatten``; null row == S_total, null slice == B4_total).

    slice2row : (B4,) int32   brick-slice id b*4+xl -> compact row
    row2slice : (S,)  int32   inverse (invalid rows -> B4)
    srow      : (S, 27) int32 source row per window direction o27:
                the compact row of slice (nbr[b, dir3(J,dy,dz)], xl')
                where xl' = (xl+dx) % 4 and J carries the brick hop
    occ_cells : (S, SLICE) bool active cells of each row's slice
    """

    slice2row: jax.Array
    row2slice: jax.Array
    srow: jax.Array
    occ_cells: jax.Array


@functools.partial(jax.jit, static_argnums=(2,))
def build_slab_maps(occ: jax.Array, nbr: jax.Array, s_cap: int) -> SlabMaps:
    """occ (B, 64) bool, nbr (B, 27) int32 (null == B) -> SlabMaps.

    Occupied slices beyond ``s_cap`` overflow into the null row (their
    outputs AND contributions drop, like brick overflow) — capacity must
    clear the real count; see models.unet.default_slab_caps.
    """
    b_cap = occ.shape[0]
    b4 = b_cap * BRICK
    occ_s = occ.reshape(b4, SLICE)
    s_occ = occ_s.any(-1)
    rows = jnp.cumsum(s_occ.astype(jnp.int32)) - 1
    ok = s_occ & (rows < s_cap)
    slice2row = jnp.where(ok, rows, s_cap).astype(jnp.int32)

    row2slice = jnp.full((s_cap + 1,), b4, jnp.int32)
    row2slice = row2slice.at[slice2row].set(
        jnp.arange(b4, dtype=jnp.int32))
    row2slice = row2slice.at[s_cap].set(b4)
    row2slice = row2slice[:s_cap]

    sid = row2slice
    valid = sid < b4
    sid_c = jnp.minimum(sid, b4 - 1)
    b_id = sid_c // BRICK
    xl = sid_c % BRICK

    cols = []
    for dx in (-1, 0, 1):
        xl2 = xl + dx
        jhop = jnp.where(xl2 < 0, 0, jnp.where(xl2 >= BRICK, 2, 1))
        xl2 = xl2 % BRICK
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                # dir3(J, dy, dz) with J = jhop - 1, traced per row
                col = jhop * 9 + (dy + 1) * 3 + (dz + 1)
                src_b = nbr[b_id, col]
                src_slice = jnp.where(valid & (src_b < b_cap),
                                      src_b * BRICK + xl2, b4)
                srw = jnp.where(src_slice < b4,
                                slice2row[jnp.minimum(src_slice, b4 - 1)],
                                s_cap)
                cols.append(srw.astype(jnp.int32))
    srow = jnp.stack(cols, axis=1)

    occ_cells = occ_s[sid_c] & valid[:, None]
    return SlabMaps(slice2row=slice2row, row2slice=row2slice, srow=srow,
                    occ_cells=occ_cells)


def flatten_slab(maps: SlabMaps, s_cap: int, b_cap: int) -> SlabMaps:
    """Batched (vmapped) SlabMaps -> flat tables with global null ids."""
    bt = maps.row2slice.shape[0]
    b4 = b_cap * BRICK

    def flat(ids, cap):
        offs = jnp.arange(bt, dtype=jnp.int32) * cap
        offs = offs.reshape((bt,) + (1,) * (ids.ndim - 1))
        out = jnp.where(ids >= cap, bt * cap, ids + offs)
        return out.reshape((-1,) + ids.shape[2:])

    return SlabMaps(slice2row=flat(maps.slice2row, s_cap),
                    row2slice=flat(maps.row2slice, b4),
                    srow=flat(maps.srow, s_cap),
                    occ_cells=maps.occ_cells.reshape(-1, SLICE))


# ---------------------------------------------------------------------------
# the conv
# ---------------------------------------------------------------------------

def _null_gather(table, idx):
    n = table.shape[0]
    g = table[jnp.minimum(idx, n - 1)]
    return jnp.where((idx < n)[:, None], g, 0)


def _build_tab(act: jax.Array, cin: int) -> jax.Array:
    """(S, 16C) -> (S, 20C) boundary cells, piece-major lane concat."""
    lay, total = _tab_layout()
    parts = []
    for d in _OFFS2:
        _, cells = lay[d]
        for c0, ln in _runs(list(cells)):
            parts.append(act[:, c0 * cin:(c0 + ln) * cin])
    return jnp.concatenate(parts, axis=1)


def _build_window(act: jax.Array, slab: SlabMaps, cin: int) -> jax.Array:
    """Assemble (S, 108C) windows: 27 source gathers + 54-block concat."""
    tab = _build_tab(act, cin)
    lay, _ = _tab_layout()

    # one gather per window source (o27), of exactly the lanes consumed
    gathered = {}
    for o, kind, lane0, ln in _window_layout():
        key = (o, kind)
        if key in gathered:
            continue
        if kind == 'act':
            gathered[key] = _null_gather(act, slab.srow[:, o])
        else:
            dx, rem = divmod(o, 9)
            d = (rem // 3 - 1, rem % 3 - 1)
            st, cells = lay[d]
            src = tab[:, st * cin:(st + len(cells)) * cin]
            gathered[key] = _null_gather(src, slab.srow[:, o])

    parts = []
    for o, kind, lane0, ln in _window_layout():
        g = gathered[(o, kind)]
        if kind == 'act':
            parts.append(g[:, lane0 * cin:(lane0 + ln) * cin])
        else:
            dx, rem = divmod(o, 9)
            d = (rem // 3 - 1, rem % 3 - 1)
            st, _ = lay[d]
            local = lane0 - st
            parts.append(g[:, local * cin:(local + ln) * cin])
    win = jnp.concatenate(parts, axis=1)
    # barrier: keep XLA from re-fusing the assembly into both GEMMs'
    # operand reads (same hazard as bricks2d._assemble_p6)
    return jax.lax.optimization_barrier(win)


def _split_gemm(win: jax.Array, wf: jax.Array, cin: int, cout: int,
                compute_dtype) -> jax.Array:
    """Two y-split GEMMs over contiguous window lane ranges.

    Outputs y in {0,1} depend only on window Y in -1..2 (lanes
    [0 : 72*cin]); y in {2,3} on Y in 1..4 ([36*cin : 108*cin]) — the
    monolithic (108C, 16Co) one-hot weight is zero outside these
    blocks, so slicing it drops 1/3 of the issued FLOPs exactly.
    """
    k = 72 * cin
    half = (SLICE // 2) * cout
    wa = wf[:k, :half]
    wb = wf[36 * cin:, half:]
    out_a = jnp.dot(win[:, :k], wa)
    out_b = jnp.dot(win[:, 36 * cin:], wb)
    return jnp.concatenate([out_a, out_b], axis=1)


def _slab_raw(act: jax.Array, slab: SlabMaps, weights: jax.Array,
              compute_dtype) -> jax.Array:
    cin, cout = weights.shape[1], weights.shape[2]
    wf = window_weights(weights.astype(compute_dtype))
    win = _build_window(act.astype(compute_dtype), slab, cin)
    return _split_gemm(win, wf, cin, cout, compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def subm_conv3_slab(x2: jax.Array, slab: SlabMaps, weights: jax.Array,
                    compute_dtype=jnp.bfloat16) -> jax.Array:
    """Submanifold 3^3 conv on slice-compacted rows.

    x2      (B, 64*cin) wide-lane bricks — zero at inactive cells
    slab    SlabMaps (flat)
    weights (27, cin, cout) raster (dx, dy, dz)
    returns (B, 64*cout) in x2.dtype, masked to active cells

    Custom VJP: dx is the same windowed conv with the flipped-transposed
    stencil (srow is symmetric: srow[s, o] == s' <=> srow[s', 26-o] == s),
    dW contracts re-assembled windows against the cotangent — gathers
    and GEMMs only in both directions.

    dx is computed at compacted (occupied) slices only and is zero at
    cells of unoccupied slices; the dense transpose is nonzero there.
    This is exact in-model: x is always a masked producer's output
    (norm/conv re-mask to zero at inactive cells), so the chain rule
    zeroes those components anyway. dW is exact (active cells live only
    in compacted rows).
    """
    b4 = x2.shape[0] * BRICK
    cin, cout = weights.shape[1], weights.shape[2]
    x_rows = x2.reshape(b4, SLICE * cin)
    act = _null_gather(x_rows, slab.row2slice)
    out = _slab_raw(act, slab, weights, compute_dtype)
    out = jnp.where(jnp.repeat(slab.occ_cells, cout, axis=1), out, 0)
    full = _null_gather(out, slab.slice2row)          # (B4, 16*cout)
    return full.reshape(x2.shape[0], CELLS * cout).astype(x2.dtype)


def _flip_weights(w: jax.Array) -> jax.Array:
    return jnp.transpose(w[::-1], (0, 2, 1))


def _slab_fwd(x2, slab, weights, compute_dtype):
    return (subm_conv3_slab(x2, slab, weights, compute_dtype),
            (x2, slab, weights))


def _slab_bwd(compute_dtype, res, g):
    x2, slab, weights = res
    b4 = x2.shape[0] * BRICK
    cin, cout = weights.shape[1], weights.shape[2]
    g_rows = _null_gather(g.reshape(b4, SLICE * cout), slab.row2slice)
    g_rows = jnp.where(jnp.repeat(slab.occ_cells, cout, axis=1), g_rows, 0)
    # dx: transpose stencil through the same maps (gathers, no scatters)
    dx_rows = _slab_raw(g_rows, slab, _flip_weights(weights),
                        compute_dtype)
    dx = _null_gather(dx_rows, slab.slice2row).reshape(x2.shape)
    # dW: remat the window, contract against the split cotangent
    x_rows = x2.reshape(b4, SLICE * cin)
    act = _null_gather(x_rows, slab.row2slice).astype(compute_dtype)
    win = _build_window(act, slab, cin)
    gc = g_rows.astype(compute_dtype)
    k = 72 * cin
    half = (SLICE // 2) * cout
    dwa = jnp.einsum('sk,sn->kn', win[:, :k], gc[:, :half],
                     preferred_element_type=jnp.float32)
    dwb = jnp.einsum('sk,sn->kn', win[:, 36 * cin:], gc[:, half:],
                     preferred_element_type=jnp.float32)
    dwf = jnp.zeros((WIN * cin, SLICE * cout), jnp.float32)
    dwf = dwf.at[:k, :half].add(dwa)
    dwf = dwf.at[36 * cin:, half:].add(dwb)
    m = jnp.asarray(_window_np(), jnp.float32)
    d4 = dwf.reshape(WIN, cin, SLICE, cout)
    dw = jnp.einsum('wsk,wiso->kio', m, d4)
    return (dx.astype(x2.dtype), None, dw.astype(weights.dtype))


subm_conv3_slab.defvjp(_slab_fwd, _slab_bwd)
