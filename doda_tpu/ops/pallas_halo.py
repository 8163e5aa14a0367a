"""Pallas fused halo-assembly + submanifold-conv kernel (the hot op).

Profiling the XLA-composed brick conv showed the arithmetic is ~5% of
runtime — the rest is halo/column assembly materialized through HBM
(fusions + layout copies + reshapes). This kernel keeps the whole
pipeline in VMEM:

  XLA:    26 cheap row-gathers fetch each brick's neighbor shells
          (face/edge/corner cells only — exact, ~1x brick data),
          pre-shaped 4D so the kernel needs no lane-splitting reshapes
          (Mosaic restriction),
  Pallas: per block of bricks, scatter the shells into a
          (BLK, 10, 10, 10*C) halo scratch — z and channels share the
          lane dimension — then run the conv as NINE banded MXU dots:
          for each (dx, dy) the full z-stencil is one (rows, 10*Cin) @
          (10*Cin, 8*Cout) product against a block-banded weight matrix.

Semantics = ``bricks.subm_conv3`` (submanifold 3^3 conv, spconv
SubMConv3d; ref model/unet_block.py:26-29) — verified cell-exact against
it in tests/test_pallas_halo.py.

Backward is custom: dx reuses the forward kernel with spatially flipped,
transposed weights (conv transpose == conv with flipped stencil); dW is
a second kernel accumulating the banded window^T @ g products across the
sequential grid, un-banded by a tiny XLA post-reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bricks import BRICK, CELLS, _OFFS3, _axis_range, _shell_layout
from .coords import pad_rows

H = BRICK + 2   # halo side


def _blk(cin: int, cout: int) -> int:
    """Bricks per grid step, sized to the ~16MB VMEM budget.

    Scratch + double-buffered blocks scale with BLK * channels; pick the
    largest power of two keeping the estimate under ~10MB."""
    per_brick = (H ** 3 * cin * 2          # halo scratch (bf16)
                 + BRICK ** 3 * cout * 4   # f32 accumulator
                 + 2 * 2 * CELLS * cin * 2  # center block, double-buffered
                 + 2 * 2 * 488 * cin * 2    # shell pieces, double-buffered
                 + 2 * 2 * CELLS * cout * 2)  # out/g block
    blk = 2048 // CELLS    # aim for ~2-4k cells per MXU dot
    # Mosaic keeps several window copies + dot intermediates live; the
    # static estimate above undercounts ~3x, hence the tight budget.
    while blk > 1 and blk * per_brick > 3 * 1024 * 1024:
        blk //= 2
    return blk
_XY = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _piece_dims():
    """Per neighbor direction: (o, (lx, ly, lz), halo x/y target slices,
    halo z-lane slice builder input)."""
    out = []
    for o, (dx, dy, dz) in enumerate(_OFFS3):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        rx, ry, rz = _axis_range(dx), _axis_range(dy), _axis_range(dz)

        def tgt(d):
            if d == -1:
                return slice(0, 1)
            if d == 0:
                return slice(1, BRICK + 1)
            return slice(BRICK + 1, BRICK + 2)
        out.append((o, (len(rx), len(ry), len(rz)),
                    (tgt(dx), tgt(dy), tgt(dz))))
    return out


_PIECES = _piece_dims()


def _zlanes(tz: slice, cin: int) -> slice:
    return slice(tz.start * cin, tz.stop * cin)


def _store_halo(halo, x_ref, piece_refs, cin):
    """Assemble (BLK, H, H, H*cin) halo; all stores static, inputs 4D."""
    halo[...] = jnp.zeros_like(halo)
    ctr = slice(1, BRICK + 1)
    halo[:, ctr, ctr, _zlanes(ctr, cin)] = x_ref[...]
    for i, (o, dims, (tx, ty, tz)) in enumerate(_PIECES):
        halo[:, tx, ty, _zlanes(tz, cin)] = piece_refs[i][...]


def _banded_weights(w, cin, cout):
    """(27, Cin, Cout) -> (9, H*Cin, BRICK*Cout) block-banded matrices.

    Wbig[dxdy][(z_h, ci), (z, co)] = w[(dx, dy, z_h - z - 1)][ci, co]
    for z_h - z in {0, 1, 2}, else 0 — the whole z stencil as one GEMM.
    """
    wb = jnp.zeros((9, H * cin, BRICK * cout), w.dtype)
    for i, (dx, dy) in enumerate(_XY):
        for dz in (-1, 0, 1):
            k = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
            for z in range(BRICK):
                zh = z + dz + 1
                wb = wb.at[i, zh * cin:(zh + 1) * cin,
                           z * cout:(z + 1) * cout].set(w[k])
    return wb


def _unband_dw(dwb, cin, cout):
    """Inverse of _banded_weights for gradients: sum the band copies."""
    dw = jnp.zeros((27, cin, cout), dwb.dtype)
    for i, (dx, dy) in enumerate(_XY):
        for dz in (-1, 0, 1):
            k = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
            acc = sum(dwb[i, (z + dz + 1) * cin:(z + dz + 2) * cin,
                          z * cout:(z + 1) * cout] for z in range(BRICK))
            dw = dw.at[k].set(acc)
    return dw


def _fwd_kernel(cin, cout, n_pieces, blk):
    def kernel(x_ref, *rest):
        piece_refs = rest[:n_pieces]
        wb_ref, out_ref, halo, acc = rest[n_pieces:]
        _store_halo(halo, x_ref, piece_refs, cin)
        acc[...] = jnp.zeros_like(acc)
        for i, (dx, dy) in enumerate(_XY):
            win = halo[:, dx + 1:dx + 1 + BRICK, dy + 1:dy + 1 + BRICK, :]
            rows = win.reshape(blk * BRICK * BRICK, H * cin)
            acc[...] += jnp.dot(rows, wb_ref[i],
                                preferred_element_type=jnp.float32)
        out_ref[...] = acc[...].reshape(blk, BRICK, BRICK, BRICK * cout)
    return kernel


def _piece_arrays(x2, nbr, cin, dtype):
    """XLA side: gather neighbor shells, pre-shaped (b_cap, lx, ly, lz*C)."""
    piece_cols, _ = _shell_layout(cin)
    dims = {o: d for o, d, _ in _PIECES}
    out = []
    for o, cols in piece_cols:
        piece = pad_rows(x2[:, jnp.asarray(cols)])
        lx, ly, lz = dims[o]
        out.append(piece[nbr[:, o]].astype(dtype).reshape(
            x2.shape[0], lx, ly, lz * cin))
    return out


def _specs(pieces, cin, blk):
    def blk4(shape):
        return pl.BlockSpec((blk,) + shape[1:],
                            lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)
    in_specs = [blk4((0, BRICK, BRICK, BRICK * cin))]
    in_specs += [blk4(p.shape) for p in pieces]
    return blk4, in_specs


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _halo_conv_raw(bfeats, nbr, weights, compute_dtype=jnp.bfloat16):
    """Unmasked submanifold conv (B_cap, CELLS, Cin) -> (B_cap, CELLS, Cout)."""
    b_cap = bfeats.shape[0]
    cin = bfeats.shape[-1]
    cout = weights.shape[-1]
    blk = _blk(cin, cout)
    while b_cap % blk:
        blk //= 2
    x2 = bfeats.reshape(b_cap, CELLS * cin).astype(compute_dtype)
    x4 = x2.reshape(b_cap, BRICK, BRICK, BRICK * cin)
    pieces = _piece_arrays(x2, nbr, cin, compute_dtype)
    wb = _banded_weights(weights.astype(compute_dtype), cin, cout)

    blk4, in_specs = _specs(pieces, cin, blk)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]  # banded weights
    out = pl.pallas_call(
        _fwd_kernel(cin, cout, len(pieces), blk),
        grid=(b_cap // blk,),
        in_specs=in_specs,
        out_specs=blk4((0, BRICK, BRICK, BRICK * cout)),
        out_shape=jax.ShapeDtypeStruct(
            (b_cap, BRICK, BRICK, BRICK * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, H, H, H * cin), compute_dtype),
            pltpu.VMEM((blk * BRICK * BRICK, BRICK * cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x4, *pieces, wb)
    return out.reshape(b_cap, CELLS, cout)


def _dw_kernel(cin, cout, n_pieces, blk):
    def kernel(x_ref, *rest):
        piece_refs = rest[:n_pieces]
        g_ref, dwb_ref, halo = rest[n_pieces:]
        _store_halo(halo, x_ref, piece_refs, cin)
        g = g_ref[...].reshape(blk * BRICK * BRICK, BRICK * cout)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dwb_ref[...] = jnp.zeros_like(dwb_ref)

        for i, (dx, dy) in enumerate(_XY):
            win = halo[:, dx + 1:dx + 1 + BRICK, dy + 1:dy + 1 + BRICK, :]
            rows = win.reshape(blk * BRICK * BRICK, H * cin)
            dwb_ref[i] += jax.lax.dot_general(
                rows, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _halo_conv_dw(bfeats, nbr, g, compute_dtype=jnp.bfloat16):
    """dW (27, Cin, Cout) via banded accumulation across the grid."""
    b_cap = bfeats.shape[0]
    cin = bfeats.shape[-1]
    cout = g.shape[-1]
    x2 = bfeats.reshape(b_cap, CELLS * cin).astype(compute_dtype)
    x4 = x2.reshape(b_cap, BRICK, BRICK, BRICK * cin)
    pieces = _piece_arrays(x2, nbr, cin, compute_dtype)
    g4 = g.astype(compute_dtype).reshape(b_cap, BRICK, BRICK, BRICK * cout)
    blk = _blk(cin, cout)
    while b_cap % blk:
        blk //= 2

    blk4, in_specs = _specs(pieces, cin, blk)
    in_specs += [blk4((0, BRICK, BRICK, BRICK * cout))]
    dwb = pl.pallas_call(
        _dw_kernel(cin, cout, len(pieces), blk),
        grid=(b_cap // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, H * cin, BRICK * cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, H, H, H * cin), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x4, *pieces, g4)
    return _unband_dw(dwb, cin, cout)


def _flip_weights(w):
    """w'[k] = w[26-k]^T — the conv-transpose stencil."""
    return jnp.transpose(w[::-1], (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def halo_conv(bfeats, occ, nbr, weights, compute_dtype=jnp.bfloat16):
    """Fused submanifold 3^3 brick conv, masked to active cells.

    Drop-in for ``bricks.subm_conv3`` (same arguments/layout)."""
    out = _halo_conv_raw(bfeats, nbr, weights, compute_dtype=compute_dtype)
    return jnp.where(occ[..., None], out, 0.0)


def _halo_conv_fwd(bfeats, occ, nbr, weights, compute_dtype):
    out = halo_conv(bfeats, occ, nbr, weights, compute_dtype)
    return out, (bfeats, occ, nbr, weights)


def _halo_conv_bwd(compute_dtype, res, g):
    bfeats, occ, nbr, weights = res
    g = jnp.where(occ[..., None], g, 0.0)
    dx = _halo_conv_raw(g, nbr, _flip_weights(weights),
                        compute_dtype=compute_dtype)
    dw = _halo_conv_dw(bfeats, nbr, g, compute_dtype=compute_dtype)
    return dx.astype(bfeats.dtype), None, None, dw.astype(weights.dtype)


halo_conv.defvjp(_halo_conv_fwd, _halo_conv_bwd)
