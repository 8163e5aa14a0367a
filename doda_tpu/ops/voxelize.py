"""On-device voxelization: point->voxel maps and feature reduction.

TPU-native replacement for the reference's two-stage voxelizer:
* the host hash pass ``voxelize_idx`` (ref: lib/pointgroup_ops/src/voxelize/
  voxelize.cpp:10-31,61-155) producing voxel coords, a point->voxel map and
  an M x (1+maxActive) rulebook, and
* the GPU scatter kernels ``voxelize_fp/bp`` (ref: voxelize.cu:10-53) that
  reduce point features into voxels via that rulebook.

Here both collapse into one jit-compatible function pair built on
``unique_coords`` + ``jax.ops.segment_sum``; the explicit rulebook is
unnecessary because segment reductions and gathers by ``p2v`` cover both
directions (``point_recover_fp/bp``, ref: voxelize.cpp:183-205, is just the
gather). Everything is statically shaped: points padded to N_cap, voxels to
V_cap, with the null-slot convention from ``coords.py``.

Modes follow ref voxelize.cpp:54: 1=last, 2=first, 3=sum, 4=mean
(configs use mode 4 exclusively; ref cfgs/dataset_cfgs/*/..._cfg.yaml).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .coords import CoordTable, pad_rows, unique_coords


class VoxelGrid(NamedTuple):
    """Per-scene voxelization result (vmap over a leading batch dim).

    table : CoordTable over voxel coords (capacity V_cap).
    p2v   : (N_cap,) int32 point -> voxel id; padded points -> V_cap.
    """

    table: CoordTable

    @property
    def coords(self):
        return self.table.coords

    @property
    def p2v(self):
        return self.table.p2v

    @property
    def num_voxels(self):
        return self.table.n

    @property
    def valid(self):
        return self.table.valid


@functools.partial(jax.jit, static_argnums=(2,))
def voxelize_coords(coords: jax.Array, valid: jax.Array, v_cap: int) -> VoxelGrid:
    """Build the voxel grid for one scene.

    coords: (N_cap, 3) int — non-negative voxelized point coords.
    valid:  (N_cap,) bool — padding mask.
    """
    return VoxelGrid(table=unique_coords(coords, valid, v_cap))


def voxelize_feats(feats: jax.Array, grid: VoxelGrid, mode: int = 4) -> jax.Array:
    """Reduce per-point features into per-voxel features.

    feats: (N_cap, C) -> (V_cap, C). Padded points land in the null slot
    and are sliced off. Differentiable (the VJP of segment_sum is the
    gather that ref implements by hand in voxelize_bp, voxelize.cu:34-53).
    """
    v_cap = grid.table.cap
    p2v = grid.p2v
    if mode in (3, 4):  # sum / mean
        total = jax.ops.segment_sum(feats, p2v, num_segments=v_cap + 1)[:v_cap]
        if mode == 3:
            return total
        count = jax.ops.segment_sum(
            jnp.ones((feats.shape[0],), feats.dtype), p2v,
            num_segments=v_cap + 1)[:v_cap]
        return total / jnp.maximum(count, 1.0)[:, None]
    if mode in (1, 2):  # last / first point wins
        n_pts = feats.shape[0]
        pt_idx = jnp.arange(n_pts, dtype=jnp.int32)
        if mode == 1:
            sel = jax.ops.segment_max(pt_idx, p2v, num_segments=v_cap + 1)
        else:
            sel = jax.ops.segment_min(pt_idx, p2v, num_segments=v_cap + 1)
        sel = jnp.clip(sel[:v_cap], 0, n_pts - 1)
        out = feats[sel]
        return jnp.where(grid.valid[:, None], out, 0)
    raise NotImplementedError(f'voxel mode {mode}')


def devoxelize_feats(voxel_feats: jax.Array, grid: VoxelGrid) -> jax.Array:
    """Broadcast voxel features back to points (the ``input_map`` gather,
    ref: model/unet.py:62). (V_cap, C) -> (N_cap, C); padded points get 0."""
    return pad_rows(voxel_feats)[grid.p2v]
