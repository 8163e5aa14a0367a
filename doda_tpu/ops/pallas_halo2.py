"""Fused halo-assembly + submanifold-conv kernel, generation 2.

Replaces ``pallas_halo.py`` as the TPU hot path. What changed and why
(all numbers measured on v5e at the bench's level-0 shape, B=98304
bricks, cin=cout=16):

* Piece tables are extracted in *piece-major* layout once per conv
  (``bricks.extract_pieces`` — pure slices). The old path built 26
  lane-strided column tables per conv, which cost ~18 ms of VPU
  relayouts; the row gathers themselves run at ~1 ns/row marginal.
* The kernel assembles the (BLK, 6, 36*cin) halo in VMEM with ~65
  static stores — x is the sublane dim, (y, z, channel) share lanes.
* The conv is THREE banded GEMMs (one per dx): rows = the four x-slices
  of the halo window, contraction = the whole (y, z) plane * cin
  (k = 36*cin), output = all 16 (y, z) cells * cout (n = 16*cout).
  Banding pads the contraction (6*6)/(3*3) = 4x, but buys MXU-shaped
  GEMMs (k >= 576, n >= 256 at chunk size 32) that run ~15x faster than
  the k=96/n=64 z-banded shapes of the old kernel.
* Channels are chunked to <= 32 in and <= 32 out per kernel call, so the
  banded weight matrix stays <= 3.5 MB of VMEM at every U-Net level
  (chunking splits the contraction/output dims; total MACs unchanged).

Semantics = spconv SubMConv3d on 4^3 bricks (ref model/unet_block.py:
26-29), cell-exact vs ``bricks.subm_conv3`` (tests/test_pallas_halo.py).

Backward is custom, same structure as the old kernel: dx reuses the
forward kernel with spatially flipped, transposed weights (the neighbor
table is symmetric, so the gather's transpose is a gather by reversed
directions); dW accumulates banded window^T @ g across the grid and is
un-banded by a tiny einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bricks import BRICK, CELLS, _piece_plan, extract_pieces

H = BRICK + 2            # halo side (6)
PLANE = H * H            # (y, z) halo plane (36)
OUTP = BRICK * BRICK     # (y, z) output plane (16)
C_CHUNK = 32             # max channels per kernel call (VMEM budget)


@functools.lru_cache(maxsize=None)
def _band_map() -> np.ndarray:
    """One-hot M (3, 36, 16, 27): M[i, yh*6+zh, y*4+z, k] = 1 iff tap
    k = (i, yh-y-1, zh-z-1) is inside the 3^3 stencil."""
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


def _banded_weights(w: jax.Array) -> jax.Array:
    """(27, cin, cout) -> (3, 36*cin, 16*cout) banded matrices."""
    cin, cout = w.shape[1], w.shape[2]
    m = jnp.asarray(_band_map(), w.dtype)
    wb = jnp.einsum('pqrk,kio->pqiro', m, w)
    return wb.reshape(3, PLANE * cin, OUTP * cout)


def _unband_dw(dwb: jax.Array, cin: int, cout: int) -> jax.Array:
    """Transpose of _banded_weights: sum the band copies back to
    (27, cin, cout)."""
    m = jnp.asarray(_band_map(), dwb.dtype)
    d5 = dwb.reshape(3, PLANE, cin, OUTP, cout)
    return jnp.einsum('pqrk,pqiro->kio', m, d5)


@functools.lru_cache(maxsize=None)
def _store_plan(cin: int):
    """Static store list assembling the (BLK, 6, 36*cin) halo.

    Each entry: (piece_index or -1 for center, x target slice,
    lane target slice, x source slice, lane source slice).
    Lane layout: (y, z, c) -> lane (y*6 + z)*cin + c for halo;
    pieces arrive as (BLK, lx, ly*lz*cin) with (y, z) raster lanes.
    """
    plan, _ = _piece_plan()
    stores = []
    # center: bfeats x-row y-block -> halo row x+1, lanes ((y+1)*6+1)*cin
    for y in range(BRICK):
        stores.append((-1, slice(1, 5), _lane(y + 1, 1, 5, cin),
                       slice(0, 4), slice(y * 4 * cin, (y + 1) * 4 * cin)))
    for p_idx, (o, (sx, sy, sz), (tx, ty, tz), st, n) in enumerate(plan):
        ly = sy.stop - sy.start
        lz = sz.stop - sz.start
        for jy in range(ly):
            yt = ty.start + jy
            stores.append((p_idx, tx, _lane(yt, tz.start, tz.stop, cin),
                           slice(0, sx.stop - sx.start),
                           slice(jy * lz * cin, (jy + 1) * lz * cin)))
    return tuple(stores)


def _lane(y: int, z0: int, z1: int, cin: int) -> slice:
    return slice((y * H + z0) * cin, (y * H + z1) * cin)


def _pick_blk(cin: int, cout: int, b_cap: int) -> int:
    """Bricks per grid step under a ~10MB VMEM budget (double-buffered
    inputs + halo scratch + f32 accumulator)."""
    per_brick = (H * PLANE * cin * 2            # halo scratch
                 + 2 * 2 * (CELLS + 152) * cin * 2   # x3 + pieces, dbuf
                 + BRICK * OUTP * cout * 4      # accumulator
                 + 2 * 2 * BRICK * OUTP * cout * 2)  # out, dbuf
    blk = 512
    while blk > 8 and blk * per_brick > 8 * 1024 * 1024:
        blk //= 2
    while b_cap % blk:
        blk //= 2
    return max(blk, 1)


def _fwd_kernel(cin, cout, n_pieces, blk):
    stores = _store_plan(cin)

    def kernel(x_ref, *rest):
        piece_refs = rest[:n_pieces]
        wb_ref, out_ref, halo, acc = rest[n_pieces:]
        halo[...] = jnp.zeros_like(halo)
        for p_idx, tx, tl, sx, sl in stores:
            src = x_ref if p_idx < 0 else piece_refs[p_idx]
            halo[:, tx, tl] = src[:, sx, sl]
        acc[...] = jnp.zeros_like(acc)
        for i in range(3):
            rows = halo[:, i:i + BRICK, :].reshape(blk * BRICK, PLANE * cin)
            acc[...] += jnp.dot(rows, wb_ref[i],
                                preferred_element_type=jnp.float32)
        out_ref[...] = acc[...].reshape(blk, BRICK, OUTP * cout)
    return kernel


def _piece_inputs(bfeats, nbr, dtype):
    """XLA side: piece-major boundary table + 26 cheap row gathers.

    Returns pieces shaped (b_cap, lx, ly*lz*cin) per direction."""
    b_cap, _, cin = bfeats.shape
    x4 = bfeats.astype(dtype).reshape(b_cap, BRICK, BRICK, BRICK, cin)
    plan, n_piece = _piece_plan()
    tab = extract_pieces(x4).reshape(b_cap, n_piece * cin)
    tab = jnp.pad(tab, ((0, 1), (0, 0)))    # null row for missing nbrs
    out = []
    for o, (sx, sy, sz), _, st, n in plan:
        lx = sx.stop - sx.start
        piece = tab[:, st * cin:(st + n) * cin][nbr[:, o]]
        out.append(piece.reshape(b_cap, lx, (n // lx) * cin))
    return out


def _specs(pieces, cin, cout, blk):
    def blk3(shape):
        return pl.BlockSpec((blk,) + shape[1:],
                            lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)
    in_specs = [blk3((0, BRICK, OUTP * cin))]
    in_specs += [blk3(p.shape) for p in pieces]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]   # banded weights
    return blk3, in_specs


def _halo2_raw_chunk(bfeats, nbr, weights, dtype):
    """One (cin<=32, cout<=32) chunk: unmasked conv via the fused kernel."""
    b_cap, _, cin = bfeats.shape
    cout = weights.shape[-1]
    blk = _pick_blk(cin, cout, b_cap)
    x3 = bfeats.astype(dtype).reshape(b_cap, BRICK, OUTP * cin)
    pieces = _piece_inputs(bfeats, nbr, dtype)
    wb = _banded_weights(weights.astype(dtype))

    blk3, in_specs = _specs(pieces, cin, cout, blk)
    out = pl.pallas_call(
        _fwd_kernel(cin, cout, len(pieces), blk),
        grid=(b_cap // blk,),
        in_specs=in_specs,
        out_specs=blk3((0, BRICK, OUTP * cout)),
        out_shape=jax.ShapeDtypeStruct((b_cap, BRICK, OUTP * cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, H, PLANE * cin), dtype),
            pltpu.VMEM((blk * BRICK, OUTP * cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, *pieces, wb)
    return out.reshape(b_cap, CELLS, cout)


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _halo2_raw(bfeats, nbr, weights, compute_dtype=jnp.bfloat16):
    """Unmasked conv, chunking channels to fit the kernel's VMEM budget."""
    cin = weights.shape[1]
    cout = weights.shape[2]
    outs = []
    for co in range(0, cout, C_CHUNK):
        w_co = weights[:, :, co:co + C_CHUNK]
        acc = None
        for ci in range(0, cin, C_CHUNK):
            part = _halo2_raw_chunk(bfeats[..., ci:ci + C_CHUNK], nbr,
                                    w_co[:, ci:ci + C_CHUNK], compute_dtype)
            acc = part if acc is None else acc + part
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _dw_kernel(cin, cout, n_pieces, blk):
    stores = _store_plan(cin)

    def kernel(x_ref, *rest):
        piece_refs = rest[:n_pieces]
        g_ref, dwb_ref, halo = rest[n_pieces:]
        halo[...] = jnp.zeros_like(halo)
        for p_idx, tx, tl, sx, sl in stores:
            src = x_ref if p_idx < 0 else piece_refs[p_idx]
            halo[:, tx, tl] = src[:, sx, sl]
        g = g_ref[...].reshape(blk * BRICK, OUTP * cout)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dwb_ref[...] = jnp.zeros_like(dwb_ref)

        for i in range(3):
            rows = halo[:, i:i + BRICK, :].reshape(blk * BRICK, PLANE * cin)
            dwb_ref[i] += jax.lax.dot_general(
                rows, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return kernel


def _halo2_dw_chunk(bfeats, nbr, g, dtype):
    b_cap, _, cin = bfeats.shape
    cout = g.shape[-1]
    blk = _pick_blk(cin, cout, b_cap)
    x3 = bfeats.astype(dtype).reshape(b_cap, BRICK, OUTP * cin)
    pieces = _piece_inputs(bfeats, nbr, dtype)
    g3 = g.astype(dtype).reshape(b_cap, BRICK, OUTP * cout)

    blk3, in_specs = _specs(pieces, cin, cout, blk)
    in_specs[-1] = blk3((0, BRICK, OUTP * cout))   # g replaces weights slot
    dwb = pl.pallas_call(
        _dw_kernel(cin, cout, len(pieces), blk),
        grid=(b_cap // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, PLANE * cin, OUTP * cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, H, PLANE * cin), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, *pieces, g3)
    return _unband_dw(dwb, cin, cout)


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _halo2_dw(bfeats, nbr, g, compute_dtype=jnp.bfloat16):
    cin = bfeats.shape[-1]
    cout = g.shape[-1]
    rows = []
    for ci in range(0, cin, C_CHUNK):
        cols = []
        for co in range(0, cout, C_CHUNK):
            cols.append(_halo2_dw_chunk(bfeats[..., ci:ci + C_CHUNK], nbr,
                                        g[..., co:co + C_CHUNK],
                                        compute_dtype))
        rows.append(cols[0] if len(cols) == 1
                    else jnp.concatenate(cols, axis=-1))
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=1)


def _flip_weights(w):
    """w'[k] = w[26-k]^T — the conv-transpose stencil."""
    return jnp.transpose(w[::-1], (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def halo_conv2(bfeats, occ, nbr, weights, compute_dtype=jnp.bfloat16):
    """Fused submanifold 3^3 brick conv, masked to active cells.

    Drop-in for ``bricks.subm_conv3`` / ``pallas_halo.halo_conv``."""
    out = _halo2_raw(bfeats, nbr, weights, compute_dtype=compute_dtype)
    return jnp.where(occ[..., None], out, 0.0)


def _halo_conv2_fwd(bfeats, occ, nbr, weights, compute_dtype):
    out = halo_conv2(bfeats, occ, nbr, weights, compute_dtype)
    return out, (bfeats, occ, nbr, weights)


def _halo_conv2_bwd(compute_dtype, res, g):
    bfeats, occ, nbr, weights = res
    g = jnp.where(occ[..., None], g, 0.0)
    dx = _halo2_raw(g, nbr, _flip_weights(weights),
                    compute_dtype=compute_dtype)
    dw = _halo2_dw(bfeats, nbr, g, compute_dtype=compute_dtype)
    return dx.astype(bfeats.dtype), None, None, dw.astype(weights.dtype)


halo_conv2.defvjp(_halo_conv2_fwd, _halo_conv2_bwd)
