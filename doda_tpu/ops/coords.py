"""Integer-coordinate utilities: packing, dedup, and table lookup.

This module replaces the reference's CPU hash-map voxel dedup
(ref: lib/pointgroup_ops/src/voxelize/voxelize.cpp:61-155, which builds a
``google::dense_hash_map`` per batch on the host) with fully on-device,
statically-shaped XLA ops:

* coordinates are packed into two int32 keys (TPU has no native int64),
* dedup is a lexicographic sort + adjacent-difference scan,
* lookup into a sorted table is a vectorized two-word binary search.

All functions operate on ONE scene (no batch column); batch them with
``jax.vmap``. Padding convention: invalid entries are keyed with
``INT32_MAX`` so they sort to the end, and every index that "misses"
(missing neighbor, overflowed capacity, padded point) is mapped to the
*null slot* ``cap`` — callers allocate value arrays with ``cap + 1`` rows
where row ``cap`` is zero, so gathers need no masking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Coordinates must satisfy 0 <= c < 2**15 per axis after voxelization.
# Indoor scenes at voxel_scale 50 span ~1k voxels per axis; the reference's
# crop stage (ref: dataset/augmentor/augmentor_utils.py:449-472) bounds the
# extent long before this limit.
MAX_COORD = 2 ** 15 - 1
_SENTINEL = jnp.iinfo(jnp.int32).max


def pack_coords(coords: jax.Array, valid: jax.Array):
    """Pack int (N, 3) xyz coords into two int32 sort keys.

    k1 = x, k2 = y * 2^16 + z. Lexicographic order on (k1, k2) equals
    lexicographic order on (x, y, z). Invalid rows get sentinel keys that
    sort after every real key.
    """
    x = coords[..., 0].astype(jnp.int32)
    y = coords[..., 1].astype(jnp.int32)
    z = coords[..., 2].astype(jnp.int32)
    k1 = jnp.where(valid, x, _SENTINEL)
    k2 = jnp.where(valid, y * (2 ** 16) + z, _SENTINEL)
    return k1, k2


class CoordTable(NamedTuple):
    """A deduplicated, lexicographically sorted coordinate table.

    coords : (cap, 3) int32 — unique coords, rows >= n are sentinel.
    k1, k2 : (cap,) int32 — packed sort keys of ``coords``.
    n      : () int32 — number of valid unique coords (<= cap).
    p2v    : (N, ) int32 — original row -> table id; misses/padding -> cap.
    """

    coords: jax.Array
    k1: jax.Array
    k2: jax.Array
    n: jax.Array
    p2v: jax.Array

    @property
    def cap(self) -> int:
        return self.coords.shape[0]

    @property
    def valid(self) -> jax.Array:
        return jnp.arange(self.cap, dtype=jnp.int32) < self.n


@functools.partial(jax.jit, static_argnums=(2,))
def unique_coords(coords: jax.Array, valid: jax.Array, cap: int) -> CoordTable:
    """Deduplicate integer coords into a sorted table of capacity ``cap``.

    Replaces the insert-order hash dedup of the reference voxelizer
    (ref: voxelize.cpp:88-108) — table ids here are lexicographic rather
    than first-appearance order, which is an internal detail (the point->
    voxel map keeps the pairing consistent).

    Coords beyond ``cap`` unique entries overflow into the null slot and
    are dropped; callers can detect this via ``n`` (clamped to cap).
    """
    n_pts = coords.shape[0]
    k1, k2 = pack_coords(coords, valid)
    # One sort carries the original position; everything else about the
    # sorted rows is derived from the keys themselves (validity = not
    # sentinel; coords decode from the packing), so the former
    # k1/k2/valid/coords gathers-by-order (~1M scalar gathers per scene
    # at plan scale) disappear entirely.
    pos = jnp.arange(n_pts, dtype=jnp.int32)
    k1s, k2s, order = jax.lax.sort((k1, k2, pos), num_keys=2,
                                   is_stable=True)
    valid_s = k1s != _SENTINEL

    first = jnp.zeros((n_pts,), dtype=bool).at[0].set(True)
    new = (first | (k1s != jnp.roll(k1s, 1)) | (k2s != jnp.roll(k2s, 1))) & valid_s
    vid_s = jnp.cumsum(new.astype(jnp.int32)) - 1  # id within sorted order
    n = jnp.minimum(vid_s[-1] + 1, cap).astype(jnp.int32)
    # invalid or overflowed -> null slot
    vid_s = jnp.where(valid_s & (vid_s < cap), vid_s, cap)

    # Scatter sorted unique coords (decoded from the packed keys) into
    # the table. Non-new rows all write the null slot (cap); its content
    # is reset to sentinel afterwards.
    coords_s = jnp.stack([k1s, k2s // (2 ** 16), k2s % (2 ** 16)], axis=-1)
    slot = jnp.where(new & (vid_s < cap), vid_s, cap)
    table = jnp.full((cap + 1, 3), MAX_COORD, dtype=jnp.int32)
    table = table.at[slot].set(coords_s)
    table = table.at[cap].set(MAX_COORD)
    table = table[:cap]

    # point -> voxel id in original order: un-permute by sorting on the
    # carried position (cheaper than a 1M-scalar scatter)
    _, p2v = jax.lax.sort((order, vid_s.astype(jnp.int32)), num_keys=1)

    tk1, tk2 = pack_coords(table, jnp.arange(cap) < n)
    return CoordTable(coords=table, k1=tk1, k2=tk2, n=n, p2v=p2v)


def lookup(table: CoordTable, query_coords: jax.Array,
           query_valid: jax.Array | None = None) -> jax.Array:
    """Find each query coord in the sorted table via a sort-join.

    Table rows and queries are sorted together by packed key (one stable
    multi-key ``lax.sort``); a running-max scan then hands every query the
    nearest preceding table row, which is its match iff the keys are equal.
    Returns int32 ids in ``[0, cap]`` where ``cap`` means "not present"
    (the null slot).

    Why not binary search: TPU gathers inside a dependent fori_loop cannot
    pipeline — measured ~950 ms for 7M queries x 18 rounds on v5e, vs
    ~40 ms for a 7M-element sort. One stable sort + a scan + two verify
    gathers is ~20x faster at rulebook scale.

    This replaces the reference's per-offset hash probes when building
    sparse-conv rulebooks (spconv does this on GPU with a hash table;
    ref usage model/unet_block.py:26-29).
    """
    cap = table.cap
    if query_valid is None:
        query_valid = jnp.ones(query_coords.shape[:-1], dtype=bool)
    qk1, qk2 = pack_coords(query_coords, query_valid)
    q_shape = qk1.shape
    qk1 = qk1.reshape(-1)
    qk2 = qk2.reshape(-1)
    n_q = qk1.shape[0]

    all_k1 = jnp.concatenate([table.k1, qk1])
    all_k2 = jnp.concatenate([table.k2, qk2])
    pos = jnp.arange(cap + n_q, dtype=jnp.int32)
    # Stable sort keeps table rows (positions < cap) ahead of equal-keyed
    # queries, so the cummax below points each query at its table row.
    sk1, sk2, spos = jax.lax.sort((all_k1, all_k2, pos), num_keys=2,
                                  is_stable=True)
    src = jnp.where(spos < cap, spos, -1)
    cand = jax.lax.cummax(src)
    safe = jnp.maximum(cand, 0)
    # one 8-byte row gather for the key verify (two scalar gathers of the
    # same indices cost ~2x; scalar int gathers run ~8.6 ns/elem)
    pair = jnp.stack([table.k1, table.k2], axis=-1)
    got = pair[safe]
    hit = (cand >= 0) & (got[..., 0] == sk1) & (got[..., 1] == sk2) \
        & (sk1 != _SENTINEL)
    res_sorted = jnp.where(hit, safe, cap).astype(jnp.int32)
    # un-permute by a key+payload sort — a scalar scatter of the same
    # size measured ~2x slower on v5e
    _, res = jax.lax.sort((spos, res_sorted), num_keys=1)
    return res[cap:].reshape(q_shape)


def pad_rows(values: jax.Array) -> jax.Array:
    """Append one zero row so null-slot gathers (id == cap) return zeros."""
    pad_width = [(0, 1)] + [(0, 0)] * (values.ndim - 1)
    return jnp.pad(values, pad_width)


# ---------------------------------------------------------------------------
# packed single-key variants for BRICK-level tables
#
# Brick coords are bounded by the crop pipeline: the reference's
# full_scale caps voxel extents at 512/axis (cfgs/dataset_cfgs/*, ref
# dataset/augmentor/augmentor_utils.py:449-472), i.e. <= 128 bricks —
# far under the 1024/axis this packing supports (4096 voxels/axis).
# One int32 sort key instead of two cuts the dominant plan-build sort
# cost by ~1/3. Coords outside [0, 1024) are treated as invalid and
# dropped (same convention as capacity overflow).
# ---------------------------------------------------------------------------

PACK_BITS = 10
_PACK_LIM = 1 << PACK_BITS


def pack_coords1(coords: jax.Array, valid: jax.Array) -> jax.Array:
    """(N, 3) int coords -> one int32 sort key; invalid -> sentinel."""
    x = coords[..., 0].astype(jnp.int32)
    y = coords[..., 1].astype(jnp.int32)
    z = coords[..., 2].astype(jnp.int32)
    in_range = ((x >= 0) & (x < _PACK_LIM) & (y >= 0) & (y < _PACK_LIM)
                & (z >= 0) & (z < _PACK_LIM))
    k = (x << (2 * PACK_BITS)) | (y << PACK_BITS) | z
    return jnp.where(valid & in_range, k, _SENTINEL)


@functools.partial(jax.jit, static_argnums=(2,))
def unique_coords_packed(coords: jax.Array, valid: jax.Array,
                         cap: int) -> CoordTable:
    """``unique_coords`` with a single packed key (brick tables only).

    The returned table's ``k1`` holds the packed key and ``k2`` zeros;
    pair it with ``lookup_packed``.
    """
    n_pts = coords.shape[0]
    k = pack_coords1(coords, valid)
    pos = jnp.arange(n_pts, dtype=jnp.int32)
    ks, order = jax.lax.sort((k, pos), num_keys=1, is_stable=True)
    valid_s = ks != _SENTINEL

    first = jnp.zeros((n_pts,), dtype=bool).at[0].set(True)
    new = (first | (ks != jnp.roll(ks, 1))) & valid_s
    vid_s = jnp.cumsum(new.astype(jnp.int32)) - 1
    n = jnp.minimum(vid_s[-1] + 1, cap).astype(jnp.int32)
    vid_s = jnp.where(valid_s & (vid_s < cap), vid_s, cap)

    coords_s = jnp.stack([ks >> (2 * PACK_BITS),
                          (ks >> PACK_BITS) & (_PACK_LIM - 1),
                          ks & (_PACK_LIM - 1)], axis=-1)
    slot = jnp.where(new & (vid_s < cap), vid_s, cap)
    table = jnp.full((cap + 1, 3), MAX_COORD, dtype=jnp.int32)
    table = table.at[slot].set(coords_s)
    table = table.at[cap].set(MAX_COORD)
    table = table[:cap]

    _, p2v = jax.lax.sort((order, vid_s.astype(jnp.int32)), num_keys=1)

    tk = pack_coords1(table, jnp.arange(cap) < n)
    return CoordTable(coords=table, k1=tk, k2=jnp.zeros_like(tk), n=n,
                      p2v=p2v)


def lookup_packed(table: CoordTable, query_coords: jax.Array,
                  query_valid: jax.Array | None = None) -> jax.Array:
    """``lookup`` against a packed table (one sort key, one verify
    gather of 4-byte rows)."""
    cap = table.cap
    if query_valid is None:
        query_valid = jnp.ones(query_coords.shape[:-1], dtype=bool)
    qk = pack_coords1(query_coords, query_valid)
    q_shape = qk.shape
    qk = qk.reshape(-1)
    n_q = qk.shape[0]

    all_k = jnp.concatenate([table.k1, qk])
    pos = jnp.arange(cap + n_q, dtype=jnp.int32)
    sk, spos = jax.lax.sort((all_k, pos), num_keys=1, is_stable=True)
    is_tab = spos < cap
    src = jnp.where(is_tab, spos, -1)
    cand = jax.lax.cummax(src)
    # the candidate's KEY via a second cummax instead of a verify gather:
    # keys ascend in the sorted stream, so the running max of table-row
    # keys IS the nearest preceding table key (the 2.75M-row scalar
    # gather this replaces ran at ~10.7 ns/row — ~30 ms per L0 plan)
    imin = jnp.iinfo(jnp.int32).min
    cand_key = jax.lax.cummax(jnp.where(is_tab, sk, imin))
    hit = (cand >= 0) & (cand_key == sk) & (sk != _SENTINEL)
    safe = jnp.maximum(cand, 0)
    res_sorted = jnp.where(hit, safe, cap).astype(jnp.int32)
    _, res = jax.lax.sort((spos, res_sorted), num_keys=1)
    return res[cap:].reshape(q_shape)
