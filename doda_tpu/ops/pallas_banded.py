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

A gen-2 y-split variant (duplicated-halves 48C rows, FLOP parity with
the XLA y-split GEMMs, env ``DODA_PALLAS=2``) existed through round 4;
it hung the chip during bench kernel_check (>30 min futex sleep over the
axon tunnel, never root-caused) and was DELETED in round 5 — a shipped
env flag must fail loudly or work. Verdict history in PERF.md.
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
