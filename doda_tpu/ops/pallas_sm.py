"""Source-major fused banded-conv Mosaic kernel.

The second-generation fused kernel for the wide-lane brick engine
(first gen: pallas_banded.py, which consumed the six HBM-materialized
halo-plane rows). Here the *gathered operands* are the kernel inputs —
x2 (B, 64C), the x-major interleaved in-plane pieces gyz (B, 96C) and
the two exact 9-source x-halo planes gxm/gxp (B, 40C) — and every
window row is formed implicitly by static lane slicing inside the MXU
contractions:

  out_x = sum_i  x2[:, cx*16C] @ wc[i] + gyz[:, cx*24C] @ wh[i]
          (+ gxm @ wx[0] at x=0 / gxp @ wx[1] at x=3),  cx = x+i-1

vs the XLA GEMM form (bricks2d._sm_xla), each operand tile is read from
HBM exactly once per conv instead of up to 3 times (one per consuming
tap), and the 4 center plane rows are never materialized at all. All
lane offsets are 128-multiples by construction (RUN/XPAD padding in
bricks2d), so Mosaic needs no relayouts; stores are 4 full-sublane
(T, 16*cout) chunks.

Numerics are identical to the GEMM form: bf16 operands, f32
accumulation. Callers mask the output (occupancy) downstream.

Replaces the reference's spconv v1.2 SubMConv3d rulebook GEMMs
(ref model/unet_block.py:26-29) on the TPU hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bricks import BRICK, CELLS

OUTP = BRICK * BRICK


def _kernel(x, gyz, gxm, gxp, wc, wh, wx, out):
    cin16 = wc.shape[1]            # 16*cin lanes per x-slice of x2
    run = wh.shape[1]              # 24*cin lanes per x-run of gyz
    n = out.shape[1] // BRICK      # 16*cout lanes per output x-slice
    f32 = jnp.float32
    for xr in range(BRICK):
        acc = None
        for i in range(3):
            cx = xr + i - 1
            if cx == -1:
                t = jnp.dot(gxm[:], wx[0], preferred_element_type=f32)
            elif cx == BRICK:
                t = jnp.dot(gxp[:], wx[1], preferred_element_type=f32)
            else:
                t = jnp.dot(x[:, cx * cin16:(cx + 1) * cin16], wc[i],
                            preferred_element_type=f32)
                t = t + jnp.dot(gyz[:, cx * run:(cx + 1) * run], wh[i],
                                preferred_element_type=f32)
            acc = t if acc is None else acc + t
        out[:, xr * n:(xr + 1) * n] = acc.astype(out.dtype)


def _tile_rows(b: int, cin: int, cout: int, dtype_bytes: int) -> int:
    """Largest row tile (divisor of b, multiple of 8) fitting VMEM:
    4 double-buffered operand tiles + resident weights + f32 acc."""
    n = OUTP * cout
    w_bytes = (3 * OUTP * cin + 3 * 24 * cin + 2 * 40 * cin) * n \
        * dtype_bytes
    budget = 13 * 1024 * 1024 - w_bytes
    row_lanes = (CELLS + 4 * 24 + 2 * 40) * cin + CELLS * cout
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        need = 2 * t * row_lanes * dtype_bytes + t * n * 4
        if b % t == 0 and need <= budget:
            return t
    return 0


def fits_sm(b: int, cin: int, cout: int, dtype_bytes: int = 2) -> bool:
    if cin % 16 or cout % 8:
        return False
    return _tile_rows(b, cin, cout, dtype_bytes) >= 8


def banded_conv_sm(x, gyz, gxm, gxp, wc, wh, wx, out_dtype) -> jax.Array:
    """x (B,64C), gyz (B,96C), gxm/gxp (B,40C); weights from
    bricks2d.sm_weights. Returns (B, 64*cout) unmasked."""
    b = x.shape[0]
    cin = x.shape[1] // CELLS
    n = wc.shape[2]
    cout = n // OUTP
    t = _tile_rows(b, cin, cout, x.dtype.itemsize)
    assert t >= 8, 'caller must check fits_sm'

    def rspec(width):
        return pl.BlockSpec((t, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops = 2 * b * (3 * OUTP * cin + 3 * 24 * cin + 2 * 40 * cin) * n
    bytes_in = (b * (x.shape[1] + gyz.shape[1] + gxm.shape[1]
                     + gxp.shape[1]) * x.dtype.itemsize)
    return pl.pallas_call(
        _kernel,
        grid=(b // t,),
        in_specs=[rspec(x.shape[1]), rspec(gyz.shape[1]),
                  rspec(gxm.shape[1]), rspec(gxp.shape[1]),
                  wspec(wc.shape), wspec(wh.shape), wspec(wx.shape)],
        out_specs=pl.BlockSpec((t, CELLS * cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, CELLS * cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_in + b * CELLS * cout * 2,
            transcendentals=0),
        interpret=jax.default_backend() != 'tpu',
    )(x, gyz, gxm, gxp, wc, wh, wx)
