"""Wide-lane (2D) brick engine — the v3 TPU hot path.

Why this module exists (all traced on v5e, batch-4 bench forward):
the v2 engine in ``bricks.py`` carries activations as (B, 4, 4, 4, C)
with C = 16..112 as the minor dim. TPU arrays are stored in (8, 128)
tiles, so a 16-wide minor dim pads every tile 8x — 8x the HBM bytes and
8x the bandwidth of every gather, concat, norm and mask pass. The traced
forward spent 98% of 2.9 s in exactly those passes (convs: 24 ms).

Here every persistent tensor is 2D ``(bricks, 64*C)`` — full 128-lane
tiles for C >= 2 — and every rearrangement is expressed as either
* a lane-slice concat (one fused output pass, gathers fuse in), or
* a row gather of contiguous >=128-byte rows.

The submanifold 3^3 conv becomes a *banded 1D conv* along brick x-slices:

  tab_yz (B, 80C)   boundary cells facing the 8 in-plane (dy,dz) dirs,
                    piece-major (lane-slice extraction from x)
  P      (B, 144C)  per x-slice, the full 6x6 (y,z) halo plane (36C):
                    one 72-block lane concat of center runs + gathered
                    neighbor piece slices
  P6     (B, 216C)  P plus the x-/x+ neighbor planes (two row gathers of
                    P itself, reshaped (B*4, 36C))
  out    (B, 64Co)  lax.conv NWC over (B, 6, 36C) with banded weights
                    (3, 36C, 16Co): 3 MXU GEMMs with k = 36C >= 576 and
                    n = 16Co >= 256 — the measured 54+ TF/s regime —
                    issuing only 4/3 of the exact-tap FLOPs

Semantics remain spconv v1.2 SubMConv3d / SparseConv3d(k2s2) /
SparseInverseConv3d (ref model/unet_block.py:14-85), cell-exact vs the
``bricks.py`` oracle (tests/test_bricks2d.py).

Conventions: tables are flattened across the batch (scene offsets folded
into ids); the null id is ``B`` and every gathered array is padded with
one zero row, so misses need no masking.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .bricks import BRICK, CELLS, _H, WINDOWS

_OFFS2 = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
          if (dy, dz) != (0, 0)]


def _src(d: int):
    """Cells along one axis a neighbor at offset d contributes."""
    return [BRICK - 1] if d == -1 else (list(range(BRICK)) if d == 0
                                        else [0])


def dir3_index(dx: int, dy: int, dz: int) -> int:
    """Column of the (B, 27) rulebook for offset (dx, dy, dz)."""
    return ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)


@functools.lru_cache(maxsize=None)
def _yz_piece_plan():
    """Per (dy,dz) dir: (start cell offset in tab_yz, [source cells]).

    Piece layout is (x, y, z) raster over its source cells, so the
    slice a consumer needs for halo row (x, y') is a contiguous lane
    run."""
    plan = {}
    start = 0
    for dy, dz in _OFFS2:
        cells = [x * BRICK * BRICK + y * BRICK + z
                 for x in range(BRICK) for y in _src(dy) for z in _src(dz)]
        plan[(dy, dz)] = (start, cells)
        start += len(cells)
    return plan, start          # start == 80


def _runs(cells):
    """Split a sorted cell list into (start, length) runs of consecutive
    ids — each run is one lane slice of the (B, 64C) tensor."""
    runs = []
    for c in cells:
        if runs and runs[-1][0] + runs[-1][1] == c:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((c, 1))
    return runs


# --- fused norm+ReLU prologue plumbing -------------------------------------
#
# ``pro = (scale, bias, occ)`` folds the pre-activation batch norm +
# relu + cell mask into the conv: the normalized activation
# where(occ, relu(x*scale + bias), 0) is never materialized. Values are
# assembled RAW (same slices/gathers as the unfused path) alongside a
# parallel cells-wide boolean mask assembly, and the affine+relu+mask
# applies ONCE per assembled row (_apply_pro) — elementwise-after-concat,
# one fusion per row. (The first cut applied the prologue per lane-slice
# read — ~10 HLO ops x ~75 reads per conv — which measurably inflated
# model compile times; many elementwise producers feeding one concat is
# a hostile pattern for the fusion passes.)
# Masking is load-bearing: bias > 0 would light inactive cells via relu.

def _apply_pro(val: jax.Array, mask: jax.Array, pro, cin: int,
               compute_dtype) -> jax.Array:
    """val (B, n_cells*cin), mask (B, n_cells) bool ->
    where(mask, relu(val*scale + bias), 0), channel-tiled."""
    scale, bias, _ = pro
    n_cells = mask.shape[1]
    st = jnp.tile(scale, n_cells).astype(compute_dtype)
    bt = jnp.tile(bias, n_cells).astype(compute_dtype)
    y = jnp.maximum(val * st + bt, 0)
    return jnp.where(jnp.repeat(mask, cin, axis=1), y, 0)


def pro_full(x2: jax.Array, pro, cin: int, compute_dtype) -> jax.Array:
    """Materialized where(occ, relu(x*s+b), 0) — for engines that take a
    normalized activation (same traffic as the unfused path)."""
    return _apply_pro(x2.astype(compute_dtype), pro[2], pro, cin,
                      compute_dtype)


def extract_tab_yz(x2: jax.Array, cin: int) -> jax.Array:
    """(B, 64C) -> (B, 80C) boundary cells facing the 8 (dy,dz) dirs.

    Lane layout contract: pieces appear in ``_OFFS2`` order, each piece
    an (x, y, z) raster over its source cells (see ``_yz_piece_plan``);
    consumers index via the plan's start offsets, never by position.
    Pure lane-slice concat (56 runs) — one fused pass."""
    plan, total = _yz_piece_plan()
    parts = []
    for dy, dz in _OFFS2:
        _, cells = plan[(dy, dz)]
        for c0, ln in _runs(cells):
            parts.append(x2[:, c0 * cin:(c0 + ln) * cin])
    return jnp.concatenate(parts, axis=1)


def _extract_tab_mask(occ: jax.Array) -> jax.Array:
    """The (B, 80) bool twin of extract_tab_yz (cells, not lanes)."""
    plan, _ = _yz_piece_plan()
    parts = []
    for dy, dz in _OFFS2:
        _, cells = plan[(dy, dz)]
        for c0, ln in _runs(cells):
            parts.append(occ[:, c0:c0 + ln])
    return jnp.concatenate(parts, axis=1)


@functools.lru_cache(maxsize=None)
def _plane_blocks(pm: bool = False):
    """Static P-assembly plan: per x-row, (source, lane range) blocks.

    source is 'center' or a (dy, dz) dir; lane ranges are in *cells*
    (multiply by C at trace time).

    ``pm=False``: 18 blocks in (y', z') raster order — the layout the
    banded weights expect natively. ``pm=True``: piece-major — 9
    contiguous chunks [1,B,1 | B,B^2,B | 1,B,1] cells, one whole run
    per source piece, with the matching plane-cell permutation baked
    into the banded weights (``_pm_perm``). The raster order interleaves
    up to 18 sub-tile (16/64-lane) writes per row, which the trace shows
    as ~10x the write floor in the concat-emission fusions; piece-major
    writes each source as one run."""
    plan, _ = _yz_piece_plan()
    rows = []
    for x in range(BRICK):
        blocks = []

        def piece_lane(d, cell, ln=1):
            # offsets are piece-LOCAL: the consumer slices the already-
            # extracted per-direction gather, not the whole table
            _, cells = plan[d]
            return ('piece', d, cells.index(cell), ln)

        b2 = BRICK * BRICK
        # y' = 0: dy=-1 sources (their y == BRICK-1)
        blocks.append(piece_lane((-1, -1), x * b2 + b2 - 1))
        blocks.append(piece_lane((-1, 0), x * b2 + b2 - BRICK, BRICK))
        blocks.append(piece_lane((-1, 1), x * b2 + b2 - BRICK))
        if pm:
            # whole z-edge runs and the whole center block, contiguous
            blocks.append(piece_lane((0, -1), x * b2 + BRICK - 1, BRICK))
            blocks.append(('center', None, x * b2, b2))
            blocks.append(piece_lane((0, 1), x * b2, BRICK))
        else:
            # y' = 1..BRICK: z- cell | center run | z+ cell
            for y in range(BRICK):
                blocks.append(piece_lane((0, -1),
                                         x * b2 + y * BRICK + BRICK - 1))
                blocks.append(('center', None, x * b2 + y * BRICK, BRICK))
                blocks.append(piece_lane((0, 1), x * b2 + y * BRICK))
        # y' = BRICK+1: dy=+1 sources (their y == 0)
        blocks.append(piece_lane((1, -1), x * b2 + BRICK - 1))
        blocks.append(piece_lane((1, 0), x * b2, BRICK))
        blocks.append(piece_lane((1, 1), x * b2))
        rows.append(tuple(blocks))
    return tuple(rows)


H = BRICK + 2
PLANE = H * H               # 36
OUTP = BRICK * BRICK        # 16


@functools.lru_cache(maxsize=None)
def _xplane_blocks(dx: int, pm: bool = False):
    """Static plan for the halo plane at x == dx (±1): 18 blocks in
    (y', z') raster order (9 whole-piece chunks with ``pm=True``, see
    _plane_blocks). Each block is ('x2', lane0, ln) — a run of
    the x-neighbor brick's boundary slice — or ('piece', (dy, dz),
    sub, ln) — the facing-x sub-run of a diagonal neighbor's tab piece.

    Why not gather the neighbor's assembled P row (the round-2 design):
    when the face x-neighbor brick is ABSENT but a diagonal (dx, dy, dz)
    brick is present, the plane still has active cells from the
    diagonals; a null P-row gather silently zeroed them (cell-level
    wrong vs spconv/the oracle on sparse scenes). Assembling from all 9
    (dx, *, *) sources is exact."""
    xs = BRICK - 1 if dx == -1 else 0
    plan, _ = _yz_piece_plan()

    def sub(d, y=None):
        # position of the x == xs run inside piece d (cells are x-major)
        _, cells = plan[d]
        if len(cells) == BRICK:          # corner piece: 1 cell per x
            return ('piece', d, xs, 1)
        # edge piece: 4 cells per x (x-major, then the free axis)
        if y is None:                    # whole 4-cell run
            return ('piece', d, xs * BRICK, BRICK)
        return ('piece', d, xs * BRICK + y, 1)

    blocks = []
    # y' = 0: sources at (dx, -1, dz)
    blocks.append(sub((-1, -1)))
    blocks.append(sub((-1, 0)))
    blocks.append(sub((-1, 1)))
    if pm:
        # whole corner-col runs and the whole x-neighbor boundary slice
        blocks.append(sub((0, -1)))
        blocks.append(('x2', xs * BRICK * BRICK, BRICK * BRICK))
        blocks.append(sub((0, 1)))
    else:
        # y' = 1..BRICK: (dx,0,-1) col | x-neighbor center run | (dx,0,1)
        for y in range(BRICK):
            blocks.append(sub((0, -1), y))
            blocks.append(('x2', xs * BRICK * BRICK + y * BRICK, BRICK))
            blocks.append(sub((0, 1), y))
    # y' = BRICK+1: sources at (dx, 1, dz)
    blocks.append(sub((1, -1)))
    blocks.append(sub((1, 0)))
    blocks.append(sub((1, 1)))
    return tuple(blocks)


@functools.lru_cache(maxsize=None)
def _pm_perm():
    """Plane-cell ids (Y'*H + Z') in piece-major lane order: the Y'=0
    raster row, the Z'=0 edge column, the BRICK^2 center block, the
    Z'=H-1 edge column, the Y'=H-1 raster row — matching the chunk
    order _plane_blocks/_xplane_blocks emit with pm=True. dot(row, W)
    is invariant under a shared contraction permutation, so the banded
    weights absorb it for free (banded_weights(pm=True))."""
    a = list(range(H))
    zlo = [y * H for y in range(1, BRICK + 1)]
    ctr = [y * H + z for y in range(1, BRICK + 1)
           for z in range(1, BRICK + 1)]
    zhi = [y * H + H - 1 for y in range(1, BRICK + 1)]
    b = [(H - 1) * H + z for z in range(H)]
    return tuple(a + zlo + ctr + zhi + b)


def _pm_active(rows: int) -> bool:
    """Piece-major routing: DODA_PM=<min_rows> enables the layout for
    convs with at least that many brick rows (assembly-bound shallow
    levels); 'force' enables it everywhere (tests); '0' disables. The
    y-split windows widen (PLANE-H)/(BRICK/2+2)H = 1.25x issued GEMM
    FLOPs, so deep MXU-bound levels keep the raster layout.

    Default 20000 (L0/L1 of the bench flagship): measured 4.505 vs
    4.434 scenes/sec (round 5) — the 9-chunk emission beats the 18
    interleaved sub-tile writes where assembly dominates; all-levels
    'force' measured slightly lower on the train step (1.425 vs
    1.462 scenes/sec trained)."""
    import os
    v = os.environ.get('DODA_PM', '20000')
    if v == 'force':
        return True
    if v in ('0', ''):
        return False
    return rows >= int(v)


@functools.lru_cache(maxsize=None)
def _band_np(cin: int, cout: int):
    """One-hot map (3, 36, 16, 27) for building banded weights."""
    m = np.zeros((3, PLANE, OUTP, 27), np.float32)
    for i in range(3):
        for y in range(BRICK):
            for z in range(BRICK):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        yh, zh = y + dy + 1, z + dz + 1
                        k = i * 9 + (dy + 1) * 3 + (dz + 1)
                        m[i, yh * H + zh, y * BRICK + z, k] = 1.0
    return m


def banded_weights(w: jax.Array, pm: bool = False) -> jax.Array:
    """(27, cin, cout) raster (dx,dy,dz) -> (3, 36*cin, 16*cout).

    ``pm``: permute the contraction (plane-cell) dim into piece-major
    lane order (``_pm_perm``) to match rows assembled with pm=True —
    dot(row, W) is invariant under a shared contraction permutation."""
    cin, cout = w.shape[1], w.shape[2]
    m = jnp.asarray(_band_np(cin, cout), w.dtype)
    wb = jnp.einsum('pqrk,kio->pqiro', m, w)
    if pm:
        wb = wb[:, jnp.asarray(_pm_perm())]
    return wb.reshape(3, PLANE * cin, OUTP * cout)


def _occ_rep(occ: jax.Array, cout: int) -> jax.Array:
    """(B, 64) bool -> (B, 64*cout) per-cell lane mask."""
    return jnp.repeat(occ, cout, axis=1)


def _assemble_p6(x2: jax.Array, nbr: jax.Array,
                 compute_dtype, pro=None, pm: bool = False) -> list:
    """Halo-plane assembly: (B, 64*cin) -> list of 6 (B, 36*cin) rows
    [x=-1 plane, 4 in-brick planes, x=+4 plane] for the shifted GEMMs.

    ``pro``: optional (scale, bias, occ) norm+ReLU prologue — values
    assemble raw alongside a parallel (B, 36) mask assembly, and
    _apply_pro runs once per row. ``pm``: piece-major lane order (9
    whole-source chunks per row instead of 18 raster-interleaved
    sub-tile writes; see _plane_blocks) — consumers must use
    banded_weights(pm=True) and the widened y-split slices."""
    b, lanes = x2.shape
    cin = lanes // CELLS
    x = x2.astype(compute_dtype)
    occ = pro[2] if pro is not None else None

    # null handling everywhere is clamp + where, NOT a padded copy:
    # jnp.pad of a (B, wC) table copies the whole table to add one zero
    # row (traced at ~20 ms of pad+reshape per level-0 conv)
    def null_gather(table, idx, zero=0):
        g = table[jnp.minimum(idx, b - 1)]
        return jnp.where((idx < b)[:, None], g, zero)

    tab = extract_tab_yz(x, cin)                # (B, 80*cin)
    tab_m = _extract_tab_mask(occ) if pro is not None else None
    plan, _ = _yz_piece_plan()
    gathered, gathered_m = {}, {}
    for d in _OFFS2:
        st, cells = plan[d]
        col = dir3_index(0, *d)
        gathered[d] = null_gather(
            tab[:, st * cin:(st + len(cells)) * cin], nbr[:, col])
        if pro is not None:
            gathered_m[d] = null_gather(
                tab_m[:, st:st + len(cells)], nbr[:, col], False)

    def finish(vparts, mparts):
        row = jnp.concatenate(vparts, axis=1)
        if pro is not None:
            row = _apply_pro(row, jnp.concatenate(mparts, axis=1), pro,
                             cin, compute_dtype)
        return row

    rows = []                                   # 4 center planes (B, 36C)
    for blocks in _plane_blocks(pm):
        vparts, mparts = [], []
        for kind, d, lane0, ln in blocks:
            if kind == 'center':
                vparts.append(x[:, lane0 * cin:(lane0 + ln) * cin])
                if pro is not None:
                    mparts.append(occ[:, lane0:lane0 + ln])
            else:
                vparts.append(
                    gathered[d][:, lane0 * cin:(lane0 + ln) * cin])
                if pro is not None:
                    mparts.append(gathered_m[d][:, lane0:lane0 + ln])
        rows.append(finish(vparts, mparts))

    # x-/x+ halo planes: exact 9-source assembly per plane (the face
    # x-neighbor's boundary slice + the 8 (dx, dy, dz) diagonals' piece
    # sub-runs). See _xplane_blocks for why a P-row gather is wrong.
    plane_sq, _ = _yz_piece_plan()

    def xplane(dx):
        xs = BRICK - 1 if dx == -1 else 0
        face = nbr[:, dir3_index(dx, 0, 0)]
        b2 = BRICK * BRICK
        gx2 = null_gather(x[:, xs * b2 * cin:(xs * b2 + b2) * cin], face)
        gx2_m = (null_gather(occ[:, xs * b2:xs * b2 + b2], face, False)
                 if pro is not None else None)
        gsub, gsub_m = {}, {}
        for d in _OFFS2:
            st, cells = plane_sq[d]
            n_sub = BRICK if len(cells) > BRICK else 1
            lo = st + xs * n_sub
            col = nbr[:, dir3_index(dx, *d)]
            gsub[d] = null_gather(tab[:, lo * cin:(lo + n_sub) * cin], col)
            if pro is not None:
                gsub_m[d] = null_gather(tab_m[:, lo:lo + n_sub], col,
                                        False)
        vparts, mparts = [], []
        for blk in _xplane_blocks(dx, pm):
            if blk[0] == 'x2':
                _, lane0, ln = blk
                lane0 -= xs * BRICK * BRICK
                vparts.append(gx2[:, lane0 * cin:(lane0 + ln) * cin])
                if pro is not None:
                    mparts.append(gx2_m[:, lane0:lane0 + ln])
            else:
                _, d, pos, ln = blk
                st, cells = plane_sq[d]
                n_sub = BRICK if len(cells) > BRICK else 1
                local = pos - xs * n_sub if n_sub == BRICK else 0
                vparts.append(gsub[d][:, local * cin:(local + ln) * cin])
                if pro is not None:
                    mparts.append(gsub_m[d][:, local:local + ln])
        return finish(vparts, mparts)

    row_m = xplane(-1)
    row_p = xplane(1)
    # barrier each row: stop XLA re-fusing the assembly into the GEMM
    # operand reads (same hazard as bricks.subm_conv3_v2; each row feeds
    # up to 3 of the shifted GEMMs below)
    return [jax.lax.optimization_barrier(r)
            for r in [row_m, *rows, row_p]]


def _flip_weights(w: jax.Array) -> jax.Array:
    """w'[k] = w[26-k]^T — the transpose stencil (offsets negate)."""
    return jnp.transpose(w[::-1], (0, 2, 1))


# ---------------------------------------------------------------------------
# source-major conv path: GEMMs run directly on the gathered operands
# (x2 / in-plane pieces / x-halo planes) — the 4 center halo-plane rows
# are never materialized in HBM. Operand lane blocks are padded to
# 128-lane multiples so the fused Pallas kernel (pallas_sm.py) can slice
# them without Mosaic relayouts.
# ---------------------------------------------------------------------------

# in-plane halo positions in gyz x-run lane order: the four 4-cell edge
# runs (z-1, z+1, y-1, y+1 — each contiguous in its source piece) then
# the four corners; runs are padded 20 -> 24 cells (zero weights) so
# per-x offsets 24*cin stay 128-aligned for cin % 16 == 0.
_H_LIST = ([(y, -1) for y in range(BRICK)] + [(y, BRICK) for y in range(BRICK)]
           + [(-1, z) for z in range(BRICK)] + [(BRICK, z) for z in range(BRICK)]
           + [(-1, -1), (-1, BRICK), (BRICK, -1), (BRICK, BRICK)])
RUN = len(_H_LIST) + 4          # 24 cells per padded x-run
XPAD = PLANE + 4                # x-plane rows padded 36 -> 40 cells


def sm_weights(w: jax.Array, compute_dtype):
    """(27, cin, cout) -> (wc (3,16C,16Co), wh (3,24C,16Co), wx (2,40C,16Co)).

    Derived from the banded weights by static plane-row selection, so the
    source-major GEMMs are bit-identical to the rows6 form."""
    cin, cout = w.shape[1], w.shape[2]
    wb = banded_weights(w.astype(compute_dtype))          # (3, 36C, 16Co)
    n = wb.shape[2]
    wb4 = wb.reshape(3, PLANE, cin, n)
    idx_c = [(cy + 1) * H + (cz + 1)
             for cy in range(BRICK) for cz in range(BRICK)]
    wc = wb4[:, jnp.asarray(idx_c)].reshape(3, OUTP * cin, n)
    idx_h = [(hy + 1) * H + (hz + 1) for hy, hz in _H_LIST]
    wh = wb4[:, jnp.asarray(idx_h)].reshape(3, len(_H_LIST) * cin, n)
    wh = jnp.concatenate(
        [wh, jnp.zeros((3, 4 * cin, n), wh.dtype)], axis=1)
    wx = jnp.stack([wb[0], wb[2]])
    wx = jnp.concatenate(
        [wx, jnp.zeros((2, 4 * cin, n), wx.dtype)], axis=1)
    return wc, wh, wx


def _assemble_sm(x2: jax.Array, nbr: jax.Array, compute_dtype):
    """Gathered operands for the source-major GEMMs.

    Returns (x, gyz (B,96C), gxm (B,40C), gxp (B,40C)): gyz interleaves
    the 8 in-plane neighbor pieces x-major (each x-run = [z-1 4 cells |
    z+1 | y-1 | y+1 | 4 corners | 4 zero cells]); gxm/gxp are the exact
    9-source x-halo planes (as _assemble_p6) padded to 40 cells. The
    gathers fuse into the concat emissions — every byte written once."""
    b, lanes = x2.shape
    cin = lanes // CELLS
    x = x2.astype(compute_dtype)

    def null_gather(table, idx):
        g = table[jnp.minimum(idx, b - 1)]
        return jnp.where((idx < b)[:, None], g, 0)

    tab = extract_tab_yz(x, cin)
    plan, _ = _yz_piece_plan()
    gathered = {}
    for d in _OFFS2:
        st, cells = plan[d]
        col = dir3_index(0, *d)
        gathered[d] = null_gather(
            tab[:, st * cin:(st + len(cells)) * cin], nbr[:, col])

    zpad = jnp.zeros((b, 4 * cin), compute_dtype)
    parts = []
    for xr in range(BRICK):
        # edge runs: piece cells are x-major so run xr is contiguous
        for d in ((0, -1), (0, 1), (-1, 0), (1, 0)):
            parts.append(gathered[d][:, xr * BRICK * cin:
                                     (xr + 1) * BRICK * cin])
        for d in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            parts.append(gathered[d][:, xr * cin:(xr + 1) * cin])
        parts.append(zpad)
    gyz = jnp.concatenate(parts, axis=1)

    def xplane(dx):
        xs = BRICK - 1 if dx == -1 else 0
        gx2 = null_gather(x[:, xs * 16 * cin:(xs * 16 + 16) * cin],
                          nbr[:, dir3_index(dx, 0, 0)])
        gsub = {}
        for d in _OFFS2:
            st, cells = plan[d]
            n_sub = BRICK if len(cells) > BRICK else 1
            lo = st + xs * n_sub
            gsub[d] = null_gather(tab[:, lo * cin:(lo + n_sub) * cin],
                                  nbr[:, dir3_index(dx, *d)])
        parts = []
        for blk in _xplane_blocks(dx):
            if blk[0] == 'x2':
                _, lane0, ln = blk
                lane0 -= xs * BRICK * BRICK
                parts.append(gx2[:, lane0 * cin:(lane0 + ln) * cin])
            else:
                _, d, pos, ln = blk
                st, cells = plan[d]
                n_sub = BRICK if len(cells) > BRICK else 1
                local = pos - xs * n_sub if n_sub == BRICK else 0
                parts.append(gsub[d][:, local * cin:(local + ln) * cin])
        parts.append(zpad)
        return jnp.concatenate(parts, axis=1)

    ops = [x, gyz, xplane(-1), xplane(1)]
    return [jax.lax.optimization_barrier(o) for o in ops]


def _sm_xla(x, gyz, gxm, gxp, wc, wh, wx, cin: int, cout: int):
    """Source-major banded GEMMs (the XLA form of the fused kernel)."""
    outs = []
    for xr in range(BRICK):
        acc = None
        for i in range(3):
            cx = xr + i - 1
            if cx == -1:
                t = jnp.dot(gxm, wx[0])
            elif cx == BRICK:
                t = jnp.dot(gxp, wx[1])
            else:
                t = (jnp.dot(x[:, cx * OUTP * cin:(cx + 1) * OUTP * cin],
                             wc[i])
                     + jnp.dot(gyz[:, cx * RUN * cin:(cx + 1) * RUN * cin],
                               wh[i]))
            acc = t if acc is None else acc + t
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def subm_conv3_2d(x2: jax.Array, occ: jax.Array, nbr: jax.Array,
                  weights: jax.Array,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Submanifold 3^3 conv on wide-lane bricks.

    x2      (B, 64*cin) — zero at inactive cells (engine invariant)
    occ     (B, 64) bool
    nbr     (B, 27) int32 — flattened ids, null == B
    weights (27, cin, cout) raster (dx, dy, dz)
    returns (B, 64*cout) in x2.dtype, masked to active cells

    Custom VJP: autodiff would turn every assembly gather into a
    ~90 ns/row scatter-add in the backward. Instead dx is the same conv
    with the flipped-transposed stencil (the submanifold rulebook is
    symmetric: nbr[i, o] == j <=> nbr[j, 26-o] == i), and dW contracts
    the re-assembled windows against the cotangent — gathers and GEMMs
    only, both directions.
    """
    out = _subm_raw(x2, nbr, weights, compute_dtype)
    return jnp.where(_occ_rep(occ, weights.shape[2]), out, 0)


def _subm_raw(x2, nbr, weights, compute_dtype, pro=None):
    """Assembly + banded conv, unmasked (dx in the VJP must keep the
    inactive-cell gradient — upstream masked producers zero it).
    ``pro``: optional fused norm+ReLU prologue (see _apply_pro).

    The conv runs as 12 shifted GEMMs over the 6 halo-plane rows
    (out_x = sum_j rows[x+j] @ wb[j]) instead of materializing the
    (B, 6, 36C) window for lax.conv — the window buffer cost a full
    HBM write + read per conv (~1.4 GB at the L0 bench shape; the DUS
    build + conv read were the two largest trace buckets). When the
    banded weights fit in VMEM, a fused Mosaic kernel
    (pallas_banded.banded_conv) runs the 12 contractions with each
    plane row read from HBM exactly once instead of up to 3 times."""
    import os
    from . import pallas_banded
    cin, cout = weights.shape[1], weights.shape[2]
    # DODA_SM: source-major path — GEMMs run straight on the gathered
    # operands (no center plane-row materialization; saves one full
    # write+read of 144C per brick per conv). 'xla' = shifted GEMMs on
    # operand slices; '1' = fused Mosaic kernel where it fits (every
    # operand tile read from HBM exactly once), falling back to 'xla'.
    # Needs 128-aligned lane blocks: cin % 16, cout % 8 (the input conv
    # with cin=3 and any odd shapes keep the rows6 path).
    # Opt-in: measured end-to-end at 3.24 (kernel) / 3.78 (xla form) vs
    # 4.59 scenes/sec for the default rows6 y-split path — the sm GEMM
    # form issues 1.5x the y-split FLOPs, which loses at the MXU-bound
    # deep levels where the operand-read savings don't matter.
    # 'shallow': kernel only where the conv is bandwidth-bound — the
    # wide shallow levels (cin <= DODA_SM_MAXC lanes, default 32, i.e.
    # L0/L1 of the mid-16 flagship) whose brick count dwarfs the MXU
    # cost; deep levels keep the FLOP-lean y-split GEMMs.
    sel_sm = os.environ.get('DODA_SM', '0')
    if os.environ.get('DODA_PALLAS', '0') != '0':
        sel_sm = '0'            # explicit first-gen kernel A/B wins
    if sel_sm == 'shallow':
        maxc = int(os.environ.get('DODA_SM_MAXC', '32'))
        sel_sm = '1' if cin <= maxc else '0'
    if pro is not None and sel_sm in ('1', 'xla'):
        # the source-major engines take a materialized activation: apply
        # the prologue once up front (same traffic as the unfused path)
        x2 = pro_full(x2, pro, cin, compute_dtype)
        pro = None
    if sel_sm in ('1', 'xla') and cin % 16 == 0 and cout % 8 == 0:
        from . import pallas_sm
        kernel_ok = (
            sel_sm == '1'
            and pallas_sm.fits_sm(x2.shape[0], cin, cout,
                                  jnp.dtype(compute_dtype).itemsize)
            and (jax.default_backend() == 'tpu'
                 or os.environ.get('DODA_SM_INTERPRET') == '1'))
        # '1' falls back to the rows6 y-split GEMMs (below) where the
        # kernel doesn't fit: measured DODA_SM=xla end-to-end at 3.78 vs
        # 4.59 scenes/sec — the sm GEMM form issues 1.5x the y-split
        # FLOPs, which loses at the MXU-bound deep levels where the
        # operand-read savings don't matter.
        if kernel_ok or sel_sm == 'xla':
            x, gyz, gxm, gxp = _assemble_sm(x2, nbr, compute_dtype)
            wc, wh, wx = sm_weights(weights, compute_dtype)
            if kernel_ok:
                return pallas_sm.banded_conv_sm(
                    x, gyz, gxm, gxp, wc, wh, wx, x2.dtype)
            return _sm_xla(x, gyz, gxm, gxp, wc, wh, wx,
                           cin, cout).astype(x2.dtype)
    # DODA_PALLAS: '1' enables the gen-1 fused kernel on TPU (full
    # contraction); 'force' enables it off-TPU (interpret mode, for
    # tests). Default OFF: standalone gen-1 matches the XLA GEMMs
    # (10.2 vs 10.5 ms at the L0 bench shape), but in-model it measured
    # 3.05 vs 4.37 scenes/sec — the pallas_call serializes against
    # surrounding assembly fusions that XLA otherwise overlaps. A gen-2
    # FLOP-parity variant ('2') hung the chip and was deleted in round 5
    # (see pallas_banded.py docstring).
    sel = os.environ.get('DODA_PALLAS', '0')
    on_tpu = jax.default_backend() == 'tpu'
    itemsize = jnp.dtype(compute_dtype).itemsize
    use_pallas = (sel == 'force' or (sel == '1' and on_tpu))
    pm = _pm_active(x2.shape[0]) and not use_pallas
    wb = banded_weights(weights.astype(compute_dtype), pm=pm)
    rows6 = _assemble_p6(x2, nbr, compute_dtype, pro, pm=pm)
    if use_pallas and pallas_banded.fits_pallas(
            x2.shape[0], cin, cout, itemsize):
        return pallas_banded.banded_conv(rows6, wb, x2.dtype)
    # y-split: the banded weight is zero where |Y' - y| > 1, so the low
    # output half y in [0, BRICK/2) only reads plane lanes
    # Y' in [0, BRICK/2 + 2) and the high half y in [BRICK/2, BRICK)
    # only [BRICK/2, H) — plane rows are Y'-major, so both are
    # contiguous slices (24C / 12C at BRICK=4). Issues 2/3 the FLOPs of
    # the full contraction; measured 8.5 vs 10.2 ms per L0 conv on v5e.
    # Piece-major rows aren't Y'-sorted, so the pm windows widen to the
    # contiguous over-approximations [everything but the Y'=H-1 raster
    # row] / [everything but the Y'=0 row] — (PLANE-H)/((BRICK/2+2)*H)
    # = 1.25x issued FLOPs, the price of the single-chunk assembly.
    if pm:
        kh, ko = (PLANE - H) * cin, H * cin
    else:
        kh, ko = (BRICK // 2 + 2) * H * cin, (BRICK // 2) * H * cin
    nh = (OUTP // 2) * cout
    outs = []
    for x in range(BRICK):
        acc_a = jnp.dot(rows6[x][:, :kh], wb[0][:kh, :nh])
        acc_b = jnp.dot(rows6[x][:, ko:], wb[0][ko:, nh:])
        for j in (1, 2):
            acc_a = acc_a + jnp.dot(rows6[x + j][:, :kh], wb[j][:kh, :nh])
            acc_b = acc_b + jnp.dot(rows6[x + j][:, ko:], wb[j][ko:, nh:])
        outs.append(acc_a)
        outs.append(acc_b)
    return jnp.concatenate(outs, axis=1).astype(x2.dtype)


def _subm2d_fwd(x2, occ, nbr, weights, compute_dtype):
    return (subm_conv3_2d(x2, occ, nbr, weights, compute_dtype),
            (x2, occ, nbr, weights))


def _dwb_to_dw(dwb: jax.Array, cin: int, cout: int, pm: bool) -> jax.Array:
    """Banded dW (3, 36*cin, 16*cout) -> raster (27, cin, cout). With
    ``pm`` the banded rows are in piece-major lane order; un-permute
    before the band contraction."""
    d5 = dwb.reshape(3, PLANE, cin, OUTP, cout)
    if pm:
        iperm = np.argsort(np.asarray(_pm_perm()))
        d5 = d5[:, jnp.asarray(iperm)]
    m = jnp.asarray(_band_np(cin, cout), jnp.float32)
    return jnp.einsum('pqrk,pqiro->kio', m, d5)


def _subm2d_bwd(compute_dtype, res, g):
    x2, occ, nbr, weights = res
    b = x2.shape[0]
    cin = weights.shape[1]
    cout = weights.shape[2]
    g = jnp.where(_occ_rep(occ, cout), g, 0)
    # dx: conv of the cotangent with the transpose stencil (unmasked —
    # matches the dense transpose exactly; upstream masks handle it)
    dx = _subm_raw(g, nbr, _flip_weights(weights), compute_dtype)
    # dW: contract re-assembled windows against g (remat the assembly —
    # storing the halo rows across the whole network would blow HBM)
    pm = _pm_active(b)
    rows6 = _assemble_p6(x2, nbr, compute_dtype, pm=pm)
    g4 = g.reshape(b, BRICK, OUTP * cout).astype(compute_dtype)
    dwb = jnp.stack([
        sum(jnp.einsum('bk,bn->kn', rows6[i + x], g4[:, x],
                       preferred_element_type=jnp.float32)
            for x in range(BRICK))
        for i in range(3)])
    dw = _dwb_to_dw(dwb, cin, cout, pm)
    return dx.astype(x2.dtype), None, None, dw.astype(weights.dtype)


subm_conv3_2d.defvjp(_subm2d_fwd, _subm2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def subm_conv3_norm_2d(x2: jax.Array, occ: jax.Array, nbr: jax.Array,
                       weights: jax.Array, scale: jax.Array,
                       bias: jax.Array,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """SubM conv with a fused norm+ReLU prologue.

    Semantically ``subm_conv3_2d(where(occ, relu(x*scale + bias), 0))``
    with per-channel (C,) scale/bias (a folded pre-activation batch norm,
    ref model/unet_block.py:16-24), but the normalized activation is
    never materialized: the affine+relu+mask is computed inline on every
    lane-slice read during halo assembly, fusing into the concat/gather
    emissions (saves one full (rows, 64C) write + read per conv).

    Custom VJP: dh is the transpose-stencil conv of the cotangent; the
    prologue backward (dx = dh * scale * relu' * occ and the per-channel
    dscale/dbias reductions) is one fused elementwise+reduce pass; dW
    contracts re-assembled prologue windows against the cotangent —
    gathers and GEMMs only, as in subm_conv3_2d.
    """
    pro = (scale, bias, occ)
    out = _subm_raw(x2, nbr, weights, compute_dtype, pro)
    return jnp.where(_occ_rep(occ, weights.shape[2]), out, 0)


def _subm_norm_fwd(x2, occ, nbr, weights, scale, bias, compute_dtype):
    return (subm_conv3_norm_2d(x2, occ, nbr, weights, scale, bias,
                               compute_dtype),
            (x2, occ, nbr, weights, scale, bias))


def _subm_norm_bwd(compute_dtype, res, g):
    x2, occ, nbr, weights, scale, bias = res
    b = x2.shape[0]
    cin, cout = weights.shape[1], weights.shape[2]
    g = jnp.where(_occ_rep(occ, cout), g, 0)
    # cotangent w.r.t. the (implicit) normalized activation h
    dh = _subm_raw(g, nbr, _flip_weights(weights), compute_dtype)
    # prologue backward in one fused pass
    st = jnp.tile(scale, CELLS).astype(compute_dtype)
    bt = jnp.tile(bias, CELLS).astype(compute_dtype)
    xc = x2.astype(compute_dtype)
    live = ((xc * st + bt > 0) & _occ_rep(occ, cin))
    dh_live = jnp.where(live, dh.astype(jnp.float32), 0.0)
    dx = (dh_live * st.astype(jnp.float32)).astype(x2.dtype)
    dscale = (dh_live * xc.astype(jnp.float32)).reshape(
        b, CELLS, cin).sum((0, 1))
    dbias = dh_live.reshape(b, CELLS, cin).sum((0, 1))
    # dW: re-assemble the prologue windows, contract against g
    pm = _pm_active(b)
    rows6 = _assemble_p6(x2, nbr, compute_dtype, (scale, bias, occ), pm=pm)
    g4 = g.reshape(b, BRICK, OUTP * cout).astype(compute_dtype)
    dwb = jnp.stack([
        sum(jnp.einsum('bk,bn->kn', rows6[i + x], g4[:, x],
                       preferred_element_type=jnp.float32)
            for x in range(BRICK))
        for i in range(3)])
    dw = _dwb_to_dw(dwb, cin, cout, pm)
    return (dx, None, None, dw.astype(weights.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


subm_conv3_norm_2d.defvjp(_subm_norm_fwd, _subm_norm_bwd)


# ---------------------------------------------------------------------------
# stride-2 down / up sampling (k=2, s=2), octant-major lane permutes
# ---------------------------------------------------------------------------

def _cell(x: int, y: int, z: int) -> int:
    return x * BRICK * BRICK + y * BRICK + z


@functools.lru_cache(maxsize=None)
def _wo_cells():
    """Cell ids in (window, offset) order: w=(xh,yh,zh), o=(xl,yl,zl)."""
    out = []
    for xh in range(_H):
        for yh in range(_H):
            for zh in range(_H):
                for xl in range(2):
                    for yl in range(2):
                        for zl in range(2):
                            out.append(_cell(xh * 2 + xl, yh * 2 + yl,
                                             zh * 2 + zl))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _ow_cells():
    """Cell ids in (octant, window) order — parent-side raster."""
    out = []
    for rx in range(2):
        for ry in range(2):
            for rz in range(2):
                for xh in range(_H):
                    for yh in range(_H):
                        for zh in range(_H):
                            out.append(_cell(rx * _H + xh, ry * _H + yh,
                                             rz * _H + zh))
    return tuple(out)


def _lane_permute(x2: jax.Array, cells, cin: int,
                  pro=None, compute_dtype=None) -> jax.Array:
    """Reorder the 64 cell blocks of (B, 64C) lanes — slice concat.
    With ``pro``, the norm+ReLU prologue applies once on the permuted
    result (values permute raw alongside a cells-wide mask permute)."""
    runs = _runs_keep(cells)
    parts = [x2[:, c0 * cin:(c0 + ln) * cin] for c0, ln in runs]
    out = jnp.concatenate(parts, axis=1)
    if pro is None:
        return out
    occ = pro[2]
    mask = jnp.concatenate([occ[:, c0:c0 + ln] for c0, ln in runs], axis=1)
    return _apply_pro(out, mask, pro, cin, compute_dtype)


def _runs_keep(cells):
    """Like _runs but preserves the given order (no sorting assumed)."""
    runs = []
    for c in cells:
        if runs and runs[-1][0] + runs[-1][1] == c:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((c, 1))
    return runs


@functools.lru_cache(maxsize=None)
def _inv(cells):
    """Inverse permutation of a 64-cell order."""
    inv = [0] * CELLS
    for pos, c in enumerate(cells):
        inv[c] = pos
    return tuple(inv)


def _children_gather(vals: jax.Array, parent_children: jax.Array,
                     b: int) -> jax.Array:
    """(B, wC) child rows -> (P, 8*wC) octant-major parent assembly."""
    parts = []
    for o in range(8):
        idx = parent_children[:, o]
        g = vals[jnp.minimum(idx, b - 1)]
        parts.append(jnp.where((idx < b)[:, None], g, 0))
    return jnp.concatenate(parts, axis=1)


def _octant_gather(par_ow: jax.Array, child_parent: jax.Array,
                   parity: jax.Array, width: int) -> jax.Array:
    """(P, 64C) octant-major parent rows -> (B, 8C) per-child octant."""
    p = par_ow.shape[0]
    par_rows = par_ow.reshape(p * 8, width)
    idx = jnp.minimum(child_parent * 8 + parity, p * 8 - 1)
    return jnp.where((child_parent < p)[:, None], par_rows[idx], 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def down_conv2_2d(x2: jax.Array, occ_p: jax.Array, down,
                  weights: jax.Array,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """SparseConv3d(k=2, s=2): (B, 64*cin) children -> (P, 64*cout).

    ``down`` carries the flat maps (child_parent (B,), parity (B,),
    parent_children (P, 8)); nulls are the respective row counts.
    weights (8, cin, cout), offset-major (xl*4 + yl*2 + zl).
    Custom VJP keeps both directions gathers (autodiff would emit
    scatter-adds for the parent assembly in backward).
    """
    b, lanes = x2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    x = _lane_permute(x2.astype(compute_dtype), _wo_cells(), cin)
    rows = x.reshape(b * WINDOWS, 8 * cin)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    child_out = jnp.dot(rows, w).reshape(b, WINDOWS * cout)
    pow_ = _children_gather(child_out, down.parent_children, b)
    p_raster = _lane_permute(pow_, _inv(_ow_cells()), cout)
    p_raster = p_raster.astype(x2.dtype)
    return jnp.where(_occ_rep(occ_p, cout), p_raster, 0)


def _down2d_fwd(x2, occ_p, down, weights, compute_dtype):
    return (down_conv2_2d(x2, occ_p, down, weights, compute_dtype),
            (x2, occ_p, down, weights))


def _down2d_bwd(compute_dtype, res, g):
    x2, occ_p, down, weights = res
    b, lanes = x2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    g = jnp.where(_occ_rep(occ_p, cout), g, 0).astype(compute_dtype)
    g_ow = _lane_permute(g, _ow_cells(), cout)
    g_child = _octant_gather(g_ow, down.child_parent, down.parity,
                             WINDOWS * cout)       # (B, 8w*cout)
    gc_rows = g_child.reshape(b * WINDOWS, cout)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    dx_rows = jnp.dot(gc_rows, w.T)                # (B*8, 8cin)
    dx_wo = dx_rows.reshape(b, CELLS * cin)
    dx = _lane_permute(dx_wo, _inv(_wo_cells()), cin).astype(x2.dtype)
    x = _lane_permute(x2.astype(compute_dtype), _wo_cells(), cin)
    rows = x.reshape(b * WINDOWS, 8 * cin)
    dw = jnp.einsum('bk,bn->kn', rows, gc_rows,
                    preferred_element_type=jnp.float32)
    return dx, None, None, dw.reshape(8, cin, cout).astype(weights.dtype)


down_conv2_2d.defvjp(_down2d_fwd, _down2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def down_conv2_norm_2d(x2: jax.Array, occ_c: jax.Array, occ_p: jax.Array,
                       down, weights: jax.Array, scale: jax.Array,
                       bias: jax.Array,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """down_conv2_2d with the fused norm+ReLU prologue on the child
    input (see subm_conv3_norm_2d): the affine+relu+occ_c mask applies
    once, fused into the window permute's output pass. occ_c is the
    child cell mask, occ_p the parent output mask."""
    b, lanes = x2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    x = _lane_permute(x2.astype(compute_dtype), _wo_cells(), cin,
                      (scale, bias, occ_c), compute_dtype)
    rows = x.reshape(b * WINDOWS, 8 * cin)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    child_out = jnp.dot(rows, w).reshape(b, WINDOWS * cout)
    pow_ = _children_gather(child_out, down.parent_children, b)
    p_raster = _lane_permute(pow_, _inv(_ow_cells()), cout)
    return jnp.where(_occ_rep(occ_p, cout), p_raster.astype(x2.dtype), 0)


def _downn_fwd(x2, occ_c, occ_p, down, weights, scale, bias,
               compute_dtype):
    return (down_conv2_norm_2d(x2, occ_c, occ_p, down, weights, scale,
                               bias, compute_dtype),
            (x2, occ_c, occ_p, down, weights, scale, bias))


def _downn_bwd(compute_dtype, res, g):
    x2, occ_c, occ_p, down, weights, scale, bias = res
    b, lanes = x2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    g = jnp.where(_occ_rep(occ_p, cout), g, 0).astype(compute_dtype)
    g_ow = _lane_permute(g, _ow_cells(), cout)
    g_child = _octant_gather(g_ow, down.child_parent, down.parity,
                             WINDOWS * cout)
    gc_rows = g_child.reshape(b * WINDOWS, cout)
    w = weights.reshape(8 * cin, cout).astype(compute_dtype)
    dh_rows = jnp.dot(gc_rows, w.T)                # (B*8, 8cin)
    dh_wo = dh_rows.reshape(b, CELLS * cin)
    dh = _lane_permute(dh_wo, _inv(_wo_cells()), cin)
    # prologue backward (one fused pass)
    st = jnp.tile(scale, CELLS).astype(compute_dtype)
    bt = jnp.tile(bias, CELLS).astype(compute_dtype)
    xc = x2.astype(compute_dtype)
    live = ((xc * st + bt > 0) & _occ_rep(occ_c, cin))
    dh_live = jnp.where(live, dh.astype(jnp.float32), 0.0)
    dx = (dh_live * st.astype(jnp.float32)).astype(x2.dtype)
    dscale = (dh_live * xc.astype(jnp.float32)).reshape(
        b, CELLS, cin).sum((0, 1))
    dbias = dh_live.reshape(b, CELLS, cin).sum((0, 1))
    x = _lane_permute(x2.astype(compute_dtype), _wo_cells(), cin,
                      (scale, bias, occ_c), compute_dtype)
    rows = x.reshape(b * WINDOWS, 8 * cin)
    dw = jnp.einsum('bk,bn->kn', rows, gc_rows,
                    preferred_element_type=jnp.float32)
    return (dx, None, None, None,
            dw.reshape(8, cin, cout).astype(weights.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


down_conv2_norm_2d.defvjp(_downn_fwd, _downn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def up_conv2_2d(p2: jax.Array, occ_c: jax.Array, down,
                weights: jax.Array,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """SparseInverseConv3d(k=2): (P, 64*cin) parents -> (B, 64*cout).

    ``down`` as in ``down_conv2_2d``. Each child reads the 8 parent
    cells of its octant through W[offset]. Gathers both ways (the VJP
    assembles parent gradients via parent_children)."""
    p, lanes = p2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    b = down.child_parent.shape[0]
    par_ow = _lane_permute(p2.astype(compute_dtype), _ow_cells(), cin)
    corner = _octant_gather(par_ow, down.child_parent, down.parity,
                            WINDOWS * cin)
    rows = corner.reshape(b * WINDOWS, cin)
    # W[o, c, :] -> (cin, 8*cout) so out lanes come back (o, cout)
    w = jnp.transpose(weights, (1, 0, 2)).reshape(
        cin, 8 * cout).astype(compute_dtype)
    out8 = jnp.dot(rows, w).reshape(b, WINDOWS * 8 * cout)  # (w, o, c)
    out = _lane_permute(out8, _inv(_wo_cells()), cout).astype(p2.dtype)
    return jnp.where(_occ_rep(occ_c, cout), out, 0)


def _up2d_fwd(p2, occ_c, down, weights, compute_dtype):
    return (up_conv2_2d(p2, occ_c, down, weights, compute_dtype),
            (p2, occ_c, down, weights))


def _up2d_bwd(compute_dtype, res, g):
    p2, occ_c, down, weights = res
    p, lanes = p2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    b = down.child_parent.shape[0]
    g = jnp.where(_occ_rep(occ_c, cout), g, 0).astype(compute_dtype)
    g_wo = _lane_permute(g, _wo_cells(), cout)     # (B, 8w*8o*cout)
    g_rows = g_wo.reshape(b * WINDOWS, 8 * cout)
    w = jnp.transpose(weights, (1, 0, 2)).reshape(
        cin, 8 * cout).astype(compute_dtype)
    dcorner = jnp.dot(g_rows, w.T)                 # (B*8w, cin)
    dcorner = dcorner.reshape(b, WINDOWS * cin)
    dp_ow = _children_gather(dcorner, down.parent_children, b)
    dp = _lane_permute(dp_ow, _inv(_ow_cells()), cin).astype(p2.dtype)
    par_ow = _lane_permute(p2.astype(compute_dtype), _ow_cells(), cin)
    corner = _octant_gather(par_ow, down.child_parent, down.parity,
                            WINDOWS * cin)
    dw8 = jnp.einsum('bk,bn->kn', corner.reshape(b * WINDOWS, cin),
                     g_rows, preferred_element_type=jnp.float32)
    dw = jnp.transpose(dw8.reshape(cin, 8, cout), (1, 0, 2))
    return dp, None, None, dw.astype(weights.dtype)


up_conv2_2d.defvjp(_up2d_fwd, _up2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def up_conv2_norm_2d(p2: jax.Array, occ_p: jax.Array, occ_c: jax.Array,
                     down, weights: jax.Array, scale: jax.Array,
                     bias: jax.Array,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """up_conv2_2d with the fused norm+ReLU prologue on the parent
    input. occ_p is the parent cell mask, occ_c the child output mask."""
    p, lanes = p2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    b = down.child_parent.shape[0]
    par_ow = _lane_permute(p2.astype(compute_dtype), _ow_cells(), cin,
                           (scale, bias, occ_p), compute_dtype)
    corner = _octant_gather(par_ow, down.child_parent, down.parity,
                            WINDOWS * cin)
    rows = corner.reshape(b * WINDOWS, cin)
    w = jnp.transpose(weights, (1, 0, 2)).reshape(
        cin, 8 * cout).astype(compute_dtype)
    out8 = jnp.dot(rows, w).reshape(b, WINDOWS * 8 * cout)
    out = _lane_permute(out8, _inv(_wo_cells()), cout).astype(p2.dtype)
    return jnp.where(_occ_rep(occ_c, cout), out, 0)


def _upn_fwd(p2, occ_p, occ_c, down, weights, scale, bias, compute_dtype):
    return (up_conv2_norm_2d(p2, occ_p, occ_c, down, weights, scale,
                             bias, compute_dtype),
            (p2, occ_p, occ_c, down, weights, scale, bias))


def _upn_bwd(compute_dtype, res, g):
    p2, occ_p, occ_c, down, weights, scale, bias = res
    p, lanes = p2.shape
    cin = lanes // CELLS
    cout = weights.shape[-1]
    b = down.child_parent.shape[0]
    g = jnp.where(_occ_rep(occ_c, cout), g, 0).astype(compute_dtype)
    g_wo = _lane_permute(g, _wo_cells(), cout)
    g_rows = g_wo.reshape(b * WINDOWS, 8 * cout)
    w = jnp.transpose(weights, (1, 0, 2)).reshape(
        cin, 8 * cout).astype(compute_dtype)
    dcorner = jnp.dot(g_rows, w.T)
    dcorner = dcorner.reshape(b, WINDOWS * cin)
    dp_ow = _children_gather(dcorner, down.parent_children, b)
    dh = _lane_permute(dp_ow, _inv(_ow_cells()), cin)
    # prologue backward
    st = jnp.tile(scale, CELLS).astype(compute_dtype)
    bt = jnp.tile(bias, CELLS).astype(compute_dtype)
    pc = p2.astype(compute_dtype)
    live = ((pc * st + bt > 0) & _occ_rep(occ_p, cin))
    dh_live = jnp.where(live, dh.astype(jnp.float32), 0.0)
    dp = (dh_live * st.astype(jnp.float32)).astype(p2.dtype)
    dscale = (dh_live * pc.astype(jnp.float32)).reshape(
        p, CELLS, cin).sum((0, 1))
    dbias = dh_live.reshape(p, CELLS, cin).sum((0, 1))
    par_ow = _lane_permute(p2.astype(compute_dtype), _ow_cells(), cin,
                           (scale, bias, occ_p), compute_dtype)
    corner = _octant_gather(par_ow, down.child_parent, down.parity,
                            WINDOWS * cin)
    dw8 = jnp.einsum('bk,bn->kn', corner.reshape(b * WINDOWS, cin),
                     g_rows, preferred_element_type=jnp.float32)
    dw = jnp.transpose(dw8.reshape(cin, 8, cout), (1, 0, 2))
    return (dp, None, None, None, dw.astype(weights.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


up_conv2_norm_2d.defvjp(_upn_fwd, _upn_bwd)


def conv1x1_2d(x2: jax.Array, occ: jax.Array, weights: jax.Array,
               compute_dtype=jnp.bfloat16) -> jax.Array:
    """Per-cell channel mix (the residual shortcut's 1x1).

    Implemented as block-diagonal GEMMs so the activation never leaves
    the wide-lane layout (a C-minor (rows, C) form pays 8x tile
    padding). The 64 cells split into the smallest cell groups that
    keep k and n >= 128 lanes, and each group is a LANE SLICE fed to
    the same (bc*cin, bc*cout) block-diagonal weight — issuing bc x the
    useful FLOPs instead of 64x (e.g. 8x at cin = 16) without ever
    reshaping rows. The earlier (B, 64C) -> (B*64/bc, bc*cin) row
    reshape is NOT free on TPU: it re-tiles the whole activation
    ((8, 128) tiles move from side-by-side to stacked), costing a
    relayout copy of input and output that measured as an end-to-end
    regression (PERF.md: 4.59 -> 4.29 with the round-3 1x1/shared-sort
    pair); lane slices at bc*cin % 128 == 0 offsets are free."""
    cin, cout = weights.shape
    bc = CELLS
    for cand in (2, 4, 8, 16, 32):
        if cand * min(cin, cout) >= 128:
            bc = cand
            break
    eye = jnp.eye(bc, dtype=compute_dtype)
    wb = (eye[:, None, :, None]
          * weights.astype(compute_dtype)[None, :, None, :])
    wb = wb.reshape(bc * cin, bc * cout)
    xc = x2.astype(compute_dtype)
    parts = [jnp.dot(xc[:, g * bc * cin:(g + 1) * bc * cin], wb)
             for g in range(CELLS // bc)]
    out = jnp.concatenate(parts, axis=1).astype(x2.dtype)
    return jnp.where(_occ_rep(occ, cout), out, 0)
