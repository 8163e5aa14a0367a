"""Submanifold sparse 3D convolution engine (rulebook + gather-GEMM).

TPU-native re-design of the spconv v1.2 layer set used by the reference
U-Net: ``SubMConv3d`` (3x3x3 and 1x1x1), strided ``SparseConv3d`` (k=2,s=2)
and ``SparseInverseConv3d`` (k=2) (ref usage: model/unet.py:35-45,
model/unet_block.py:14-85). Instead of spconv's GPU hash-table rulebook and
per-offset scatter GEMMs, we:

* keep each scene's active voxels in a lexicographically sorted
  ``CoordTable`` (static capacity, null-slot padding),
* build rulebooks by *binary-searching* neighbor coordinates against that
  table (``coords.lookup``) — one (V, K) int32 array per level,
* run the convolution as a single im2col gather + one large MXU GEMM of
  shape (V, K*Cin) @ (K*Cin, Cout) — contraction dims of 27*C are
  MXU-friendly even for the U-Net's small channel counts,
* express stride-2 down/up sampling through an explicit parent/child map
  so ``SparseInverseConv3d`` reuses the exact indices of its paired
  downsample, matching spconv's ``indice_key`` semantics
  (ref: model/unet_block.py:70-78 sharing ``spconv{i}``).

Everything is per-scene; vmap over the batch. All ops are differentiable
through JAX's gather/scatter VJPs, so no hand-written backward kernels are
needed (ref needed them: lib/pointgroup_ops/src/voxelize/voxelize.cu:34-53).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import (CoordTable, lookup, lookup_packed, pad_rows,
                     unique_coords)


def kernel_offsets(kernel_size: int = 3) -> np.ndarray:
    """Raster-order (dx, dy, dz) offsets, centered for odd kernels.

    Offset index o = ((dx+r)*k + (dy+r))*k + (dz+r) with r = (k-1)//2.
    This fixes the weight layout: weights are (k**3, Cin, Cout) indexed by o.
    """
    r = (kernel_size - 1) // 2
    rng = np.arange(kernel_size) - r
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing='ij'), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def build_subm_rulebook(table: CoordTable, kernel_size: int = 3,
                        packed: bool = False) -> jax.Array:
    """Neighbor ids (V_cap, k^3) for a submanifold conv on ``table``.

    Missing neighbors and invalid voxels map to the null slot (== cap).
    Computed once per level and shared by every SubMConv at that level,
    which is what spconv's ``indice_key='subm{i}'`` reuse amounts to
    (ref: model/unet_block.py:26-29,62). ``packed`` selects the
    single-key sort-join for tables built by ``unique_coords_packed``
    (brick tables; ~1/3 faster).
    """
    offs = jnp.asarray(kernel_offsets(kernel_size))  # (K, 3)
    k = offs.shape[0]
    assert k % 2 == 1, 'mirror trick needs an odd (centered) stencil'
    half = k // 2
    cap = table.cap
    valid = table.valid
    # search only the first half of the stencil: offset o and k-1-o are
    # negatives of each other, so nbr[i, o] == j  <=>  nbr[j, k-1-o] == i
    # — the mirrored half is one small int scatter instead of doubling
    # the sort-join (the rulebook sort-joins dominate plan-build time)
    queries = table.coords[:, None, :] + offs[None, :half, :]
    qvalid = jnp.broadcast_to(valid[:, None], queries.shape[:2])
    lk = lookup_packed if packed else lookup
    nbr_half = lk(table, queries, qvalid)  # (V, half)
    self_idx = jnp.where(valid, jnp.arange(cap, dtype=jnp.int32), cap)

    mirror = jnp.full((cap + 1, half), cap, jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(half, dtype=jnp.int32)[None, :],
                            nbr_half.shape)
    rows = jnp.minimum(nbr_half, cap)           # nulls -> dump row
    mirror = mirror.at[rows, cols].set(
        jnp.broadcast_to(self_idx[:, None], nbr_half.shape))
    return jnp.concatenate(
        [nbr_half, self_idx[:, None], mirror[:cap, ::-1]], axis=1)


def subm_conv(feats: jax.Array, rulebook: jax.Array, weights: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """Submanifold conv: im2col gather + one GEMM.

    feats:    (V_cap, Cin)
    rulebook: (V_cap, K) int32 ids into feats (null = V_cap -> zeros)
    weights:  (K, Cin, Cout)
    returns   (V_cap, Cout) float32
    """
    k, cin, cout = weights.shape
    gathered = pad_rows(feats)[rulebook]            # (V, K, Cin)
    gathered = gathered.reshape(feats.shape[0], k * cin)
    w = weights.reshape(k * cin, cout)
    return jnp.dot(gathered.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def linear_conv(feats: jax.Array, weights: jax.Array,
                compute_dtype=jnp.float32) -> jax.Array:
    """1x1x1 submanifold conv == plain per-voxel linear map
    (ref: the ResidualBlock identity branch, model/unet_block.py:20)."""
    return jnp.dot(feats.astype(compute_dtype),
                   weights.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


class DownsampleMap(NamedTuple):
    """Index structure tying a level to its stride-2 downsampled level.

    parent:          CoordTable of output (coarse) voxels, capacity P_cap.
    child_parent:    (V_cap,) int32 — child voxel -> parent id (null = P_cap).
    child_offset:    (V_cap,) int32 in [0, 8) — child's position in the
                     2x2x2 window: (x&1)*4 + (y&1)*2 + (z&1).
    parent_children: (P_cap, 8) int32 — inverse map (null = V_cap).
    """

    parent: CoordTable
    child_parent: jax.Array
    child_offset: jax.Array
    parent_children: jax.Array


@functools.partial(jax.jit, static_argnums=(1,))
def build_downsample(table: CoordTable, out_cap: int) -> DownsampleMap:
    """Stride-2, kernel-2 output coords = unique(floor(in/2)).

    Matches spconv SparseConv3d(kernel=2, stride=2) output-coordinate rule
    for non-negative coords (ref usage: model/unet_block.py:70).
    """
    v_cap = table.cap
    valid = table.valid
    parent_coords = table.coords // 2
    parent = unique_coords(parent_coords, valid, out_cap)
    child_parent = parent.p2v  # (V_cap,)
    bits = table.coords & 1
    child_offset = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    child_offset = jnp.where(valid, child_offset, 0).astype(jnp.int32)

    # invert: (P_cap + 1, 8) table of child ids; row out_cap is the null row
    pc = jnp.full((out_cap + 1, 8), v_cap, dtype=jnp.int32)
    pc = pc.at[child_parent, child_offset].set(
        jnp.where(valid, jnp.arange(v_cap, dtype=jnp.int32), v_cap))
    parent_children = pc[:out_cap]
    # parent table stores its own p2v (= child_parent); drop to avoid dupes
    parent = parent._replace(p2v=child_parent)
    return DownsampleMap(parent=parent, child_parent=child_parent,
                         child_offset=child_offset,
                         parent_children=parent_children)


def downsample_conv(feats: jax.Array, ds: DownsampleMap, weights: jax.Array,
                    compute_dtype=jnp.float32) -> jax.Array:
    """SparseConv3d(k=2, s=2): each parent reduces its <=8 children.

    feats (V_cap, Cin), weights (8, Cin, Cout) -> (P_cap, Cout).
    One im2col GEMM of (P, 8*Cin) @ (8*Cin, Cout).
    """
    _, cin, cout = weights.shape
    gathered = pad_rows(feats)[ds.parent_children]   # (P, 8, Cin)
    gathered = gathered.reshape(gathered.shape[0], 8 * cin)
    w = weights.reshape(8 * cin, cout)
    return jnp.dot(gathered.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def inverse_conv(parent_feats: jax.Array, ds: DownsampleMap,
                 weights: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """SparseInverseConv3d(k=2): exact inverse of ``downsample_conv``.

    Each child receives its parent's features through the weight slice of
    its own 2x2x2 offset. Computed as one GEMM producing all 8 offset
    variants per parent, then a single gather: (P, Cin) @ (Cin, 8*Cout)
    -> (P*8, Cout)[parent*8 + offset].
    Output coords are exactly the pre-downsample voxel set — spconv's
    ``indice_key`` reuse (ref: model/unet_block.py:78).
    """
    _, cin, cout = weights.shape
    p_cap = parent_feats.shape[0]
    w = jnp.transpose(weights, (1, 0, 2)).reshape(cin, 8 * cout)
    all_out = jnp.dot(parent_feats.astype(compute_dtype),
                      w.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    all_out = all_out.reshape(p_cap * 8, cout)
    flat_idx = ds.child_parent * 8 + ds.child_offset  # null parent -> >= P*8
    out = pad_rows(all_out)[jnp.minimum(flat_idx, p_cap * 8)]
    return out
