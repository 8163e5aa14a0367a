"""Fused banded-conv Mosaic kernel for the wide-lane brick engine.

Replaces the 12 shifted XLA GEMMs of ``bricks2d._subm_raw`` (out_x =
sum_j rows[x+j] @ wb[j]) with ONE pallas_call that tiles the brick rows:
each grid step loads a (T, 36C) tile of all six halo-plane rows into
VMEM once and issues the 12 MXU contractions against the resident
banded weights. XLA's GEMM form reads every plane row from HBM up to 3
times (once per consuming tap); the kernel reads each exactly once —
measured on the L0 bench shape that is ~0.9 GB less HBM traffic per
conv.

The output stays unmasked (callers apply the occupancy mask, which XLA
fuses into the adjacent elementwise pass) and the kernel is numerically
identical to the GEMM form: bf16 operands, f32 accumulation.

Used when the banded weights fit comfortably in VMEM (see
``fits_pallas``); callers fall back to the XLA GEMMs otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bricks import BRICK, CELLS

_OUTP = BRICK * BRICK      # 16 cells per x-slice


def _kernel(rm, r0, r1, r2, r3, rp, wb, out):
    rows = (rm, r0, r1, r2, r3, rp)
    n = out.shape[1] // BRICK
    for x in range(BRICK):
        acc = jnp.dot(rows[x][:], wb[0], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(rows[x + 1][:], wb[1],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(rows[x + 2][:], wb[2],
                            preferred_element_type=jnp.float32)
        out[:, x * n:(x + 1) * n] = acc.astype(out.dtype)


def _tile_rows(b: int, kc: int, nc: int, dtype_bytes: int = 2) -> int:
    """Largest row tile T (divisor of b, multiple of 8) whose VMEM
    footprint (6 double-buffered row tiles + weights + f32 acc) stays
    under ~12 MB."""
    budget = 12 * 1024 * 1024 - 3 * kc * nc * dtype_bytes
    for t in (512, 256, 128, 64, 32, 16, 8):
        need = 6 * 2 * t * kc * dtype_bytes + t * BRICK * nc * 4
        if b % t == 0 and need <= budget:
            return t
    return 0


def fits_pallas(b: int, cin: int, cout: int, dtype_bytes: int = 2) -> bool:
    kc, nc = 36 * cin, _OUTP * cout
    if 3 * kc * nc * dtype_bytes > 8 * 1024 * 1024:  # weights stay in VMEM
        return False
    return _tile_rows(b, kc, nc, dtype_bytes) >= 8


def _kernel2(rm, r0, r1, r2, r3, rp, wlo, whi, out):
    """y-split variant over duplicated-halves 48C rows: per out x-slice,
    two (24C, 8Co) contractions per shift — 2/3 the FLOPs of _kernel,
    every row tile still read from HBM exactly once. Lane offsets are
    all multiples of 24C (128-aligned for cin % 16 == 0)."""
    rows = (rm, r0, r1, r2, r3, rp)
    kh = rows[0].shape[1] // 2          # 24*cin
    nh = wlo.shape[2]                   # 8*cout
    f32 = jnp.float32
    for x in range(BRICK):
        lo = jnp.dot(rows[x][:, :kh], wlo[0], preferred_element_type=f32)
        hi = jnp.dot(rows[x][:, kh:], whi[0], preferred_element_type=f32)
        for j in (1, 2):
            lo = lo + jnp.dot(rows[x + j][:, :kh], wlo[j],
                              preferred_element_type=f32)
            hi = hi + jnp.dot(rows[x + j][:, kh:], whi[j],
                              preferred_element_type=f32)
        out[:, x * 2 * nh:(2 * x + 1) * nh] = lo.astype(out.dtype)
        out[:, (2 * x + 1) * nh:(2 * x + 2) * nh] = hi.astype(out.dtype)


def _tile_rows2(b: int, kc48: int, nc: int, dtype_bytes: int = 2) -> int:
    budget = 12 * 1024 * 1024 - 3 * kc48 * (nc // 2) * dtype_bytes * 2
    for t in (512, 256, 128, 64, 32, 16, 8):
        need = 6 * 2 * t * kc48 * dtype_bytes + t * BRICK * nc * 4
        if b % t == 0 and need <= budget:
            return t
    return 0


def fits_pallas2(b: int, cin: int, cout: int, dtype_bytes: int = 2) -> bool:
    kc48, nc = 48 * cin, _OUTP * cout
    if 3 * kc48 * nc * dtype_bytes > 8 * 1024 * 1024:
        return False
    return _tile_rows2(b, kc48, nc, dtype_bytes) >= 8


def banded_conv2(rows48, wb: jax.Array, out_dtype) -> jax.Array:
    """rows48: list of 6 (B, 48*cin) duplicated-halves rows
    (bricks2d._dup48); wb: the plain (3, 36*cin, 16*cout) banded
    weights — the y-split slices are taken here. Returns (B, 64*cout)
    unmasked, numerically identical to the XLA y-split GEMMs."""
    b, kc48 = rows48[0].shape
    cin = kc48 // 48
    nc = wb.shape[2]
    nh = nc // 2
    kh = 24 * cin
    wlo = wb[:, :kh, :nh]
    whi = wb[:, 12 * cin:, nh:]
    t = _tile_rows2(b, kc48, nc, rows48[0].dtype.itemsize)
    assert t >= 8, 'caller must check fits_pallas2'
    row_spec = pl.BlockSpec((t, kc48), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, kh, nh), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    flops = 2 * b * 3 * 2 * kh * nh
    return pl.pallas_call(
        _kernel2,
        grid=(b // t,),
        in_specs=[row_spec] * 6 + [wspec, wspec],
        out_specs=pl.BlockSpec((t, BRICK * nc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, BRICK * nc), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=6 * b * kc48 * 2 + 2 * 3 * kh * nh * 2
            + b * BRICK * nc * 2,
            transcendentals=0),
        interpret=jax.default_backend() != 'tpu',
    )(*rows48, wlo, whi)


def banded_conv(rows6, wb: jax.Array, out_dtype) -> jax.Array:
    """rows6: list of 6 (B, 36*cin) arrays; wb: (3, 36*cin, 16*cout).

    Returns (B, 64*cout) in ``out_dtype`` (unmasked).
    """
    b, kc = rows6[0].shape
    nc = wb.shape[2]
    t = _tile_rows(b, kc, nc, rows6[0].dtype.itemsize)
    assert t >= 8, 'caller must check fits_pallas'
    row_spec = pl.BlockSpec((t, kc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * b * 3 * kc * nc
    return pl.pallas_call(
        _kernel,
        grid=(b // t,),
        in_specs=[row_spec] * 6 + [
            pl.BlockSpec((3, kc, nc), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, CELLS * nc // _OUTP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, BRICK * nc), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=6 * b * kc * 2 + 3 * kc * nc * 2
            + b * BRICK * nc * 2,
            transcendentals=0),
        interpret=jax.default_backend() != 'tpu',
    )(*rows6, wb)
