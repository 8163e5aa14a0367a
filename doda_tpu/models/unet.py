"""Submanifold sparse 3D U-Net on the wide-lane brick engine.

Architecture mirrors the reference exactly (7-level U-Net with residual
blocks, ref: model/unet.py:15-69 and model/unet_block.py:10-100):

  input SubMConv3 (no norm) ->
  UBlock([m, 2m, ..., 7m]) with per level:
    block_reps x ResidualBlock (pre-activation: BN -> ReLU -> SubMConv3 x2
                                + identity/1x1 shortcut)
    stride-2 SparseConv3d down, recurse, SparseInverseConv3d up,
    skip-concat, block_reps x tail ResidualBlock (first one 2p -> p)
  -> BN + ReLU -> voxel->point gather -> Linear head (bias).

TPU-first design decisions:
* index structures (rulebooks, down/up maps) are *data*, precomputed once
  per batch by ``build_level_plan`` and threaded through the module —
  exactly spconv's ``indice_key`` sharing, made explicit
  (ref: model/unet_block.py:26-29,62,70-78),
* activations are wide-lane 2D ``(batch*brick_cap, 64*C)`` tensors with
  scenes flattened into the row dim (global null row per table); every
  rearrangement is a lane-slice concat or a wide row gather
  (ops/bricks2d.py — C-minor layouts pay 8x TPU tile padding),
* convs run in bfloat16 on the MXU with f32 accumulation; norms in f32.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import bricks2d, slabs
from ..ops.bricks import (CELLS, BrickGrid, brick_feats_2d, brickify,
                          build_brick_downsample, build_brick_rulebook,
                          row_gather_128, subm_conv3)

Dtype = Any

# Levels whose SubM convs run on the slice-compacted slab engine.
# Measured occupied-slice fractions on ScanNet-shaped scenes: L0 43%,
# L1 57%, L2+ ~95% — compaction pays at the two shallow (dominant-cost)
# levels only.
SLAB_LEVELS = 2


class LevelPlan(NamedTuple):
    """Per-batch index structures, one entry per U-Net level (vmapped).

    grid0  : BrickGrid at level 0 (holds point<->cell maps)
    occs   : tuple of (Batch, B_cap_l, 64) bool
    nbrs   : tuple of (Batch, B_cap_l, 27) int32
    downs  : tuple of BrickDown between level l and l+1 (len = levels - 1)
    slabs  : tuple of slabs.SlabMaps for levels < SLAB_LEVELS (padded
             with None to len(occs))
    """

    grid0: BrickGrid
    occs: tuple
    nbrs: tuple
    downs: tuple
    slabs: tuple = ()


def default_brick_caps(b_cap0: int, num_levels: int,
                       floor: int = 64) -> tuple:
    """Capacity schedule matched to surface geometry.

    Measured on ScanNet-shaped scenes: brick counts shrink ~4x per
    stride-2 level (a surface through an N^3 region covers ~N^2 bricks).
    The old halving schedule left deep levels at 0.5-6% utilization —
    the deep-level conv GEMMs were >90% empty cap rows. Measured shrink
    factors per scene on ScanNet-shaped surfaces (round 5, exact counts
    at 150k pts: 40,356 -> 14,573 -> 2,046 -> 275 -> 48): 2.77x at
    level 1, then ~7x at levels 2-3 (surfaces turn volume-like relative
    to the growing brick extent), settling back toward 4x at the tiny
    tail. Level 1 gets 0.4*b0 (covers a worst-case 2.5x surface shrink
    even when b0 is exactly full), levels 2-3 divide by 5 (1.6-2.8x
    margin vs the measured 7x) and the tail divides by 4, rounded up to
    128 rows. Every per-row engine cost (gathers, DUS, GEMM issue)
    scales with cap, so margin above the audit's comfort is pure waste:
    the old /4 tail schedule padded L2 2.4x and L3 4.7x. Overflowing
    bricks fall into the null slot (dropped) — CLIs warn via
    data.dataset.check_brick_capacity."""
    def r128(v):
        return max((v + 127) // 128 * 128, floor)

    caps = [max(b_cap0, floor)]
    c = b_cap0 * 2 // 5
    for lvl in range(1, num_levels):
        caps.append(r128(c))
        c //= 5 if lvl <= 2 else 4
    return tuple(caps)


def default_slab_caps(b_caps, floor: int = 64) -> tuple:
    """Occupied-slice capacity per slab level.

    Measured slices/brick on ScanNet-shaped scenes: 1.71 at L0, 2.27 at
    L1 (of 4 dense). 2.25x / 3x the brick cap gives >=1.3x margin on top
    of the brick caps' own headroom; overflow drops rows (audited like
    brick overflow)."""
    ratios = (9, 12)   # quarters of a brick: 2.25x, 3x
    caps = []
    for lvl in range(min(SLAB_LEVELS, len(b_caps))):
        cap = b_caps[lvl] * ratios[min(lvl, len(ratios) - 1)] // 4
        caps.append(max((cap + 127) // 128 * 128, floor))
    return tuple(caps)


@functools.partial(jax.jit, static_argnums=(2,))
def _scene_plan(coords, valid, b_caps):
    grid0 = brickify(coords, valid, b_caps[0])
    occs = [grid0.occ]
    nbrs = [build_brick_rulebook(grid0.table)]
    downs = []
    table, occ = grid0.table, grid0.occ
    for lvl in range(1, len(b_caps)):
        ds = build_brick_downsample(table, occ, b_caps[lvl])
        downs.append(ds)
        table, occ = ds.parent, ds.parent_occ
        occs.append(occ)
        nbrs.append(build_brick_rulebook(table))
    s_caps = default_slab_caps(b_caps)
    slab = tuple(slabs.build_slab_maps(occs[lvl], nbrs[lvl], s_caps[lvl])
                 for lvl in range(len(s_caps)))
    return LevelPlan(grid0=grid0, occs=tuple(occs), nbrs=tuple(nbrs),
                     downs=tuple(downs), slabs=slab)


def build_level_plan(coords: jax.Array, valid: jax.Array,
                     b_caps: Sequence[int]) -> LevelPlan:
    """Batched plan: coords (Batch, N_cap, 3) voxel coords, valid mask."""
    return jax.vmap(lambda c, v: _scene_plan(c, v, tuple(b_caps)))(
        coords, valid)


# ---------------------------------------------------------------------------
# scene flattening: (Batch, cap, ...) index tables -> flat rows with a
# single global null id per table (bricks2d convention: null == n_rows)
# ---------------------------------------------------------------------------

class FlatLevel(NamedTuple):
    occ: jax.Array        # (Batch*cap, 64) bool
    nbr: jax.Array        # (Batch*cap, 27) int32, null == Batch*cap
    slab: Any = None      # slabs.SlabMaps (flat) for slab levels


class FlatDown(NamedTuple):
    child_parent: jax.Array     # (Batch*cap_l,), null == Batch*cap_{l+1}
    parity: jax.Array           # (Batch*cap_l,)
    parent_children: jax.Array  # (Batch*cap_{l+1}, 8), null == Batch*cap_l


def _flat_ids(ids: jax.Array, cap: int) -> jax.Array:
    """(Batch, n, ...) per-scene ids (null == cap) -> flat global ids."""
    bt = ids.shape[0]
    offs = jnp.arange(bt, dtype=jnp.int32) * cap
    offs = offs.reshape((bt,) + (1,) * (ids.ndim - 1))
    flat = jnp.where(ids >= cap, bt * cap, ids + offs)
    return flat.reshape((-1,) + ids.shape[2:])


def flatten_plan(plan: LevelPlan):
    """Batched LevelPlan -> per-level flat tables for the 2D engine."""
    levels, downs = [], []
    for lvl, (occ, nbr) in enumerate(zip(plan.occs, plan.nbrs)):
        cap = occ.shape[1]
        slab = None
        if lvl < len(plan.slabs) and plan.slabs[lvl] is not None:
            sm = plan.slabs[lvl]
            slab = slabs.flatten_slab(sm, sm.row2slice.shape[1], cap)
        levels.append(FlatLevel(occ=occ.reshape(-1, CELLS),
                                nbr=_flat_ids(nbr, cap), slab=slab))
    for lvl, ds in enumerate(plan.downs):
        cap_c = plan.occs[lvl].shape[1]
        cap_p = plan.occs[lvl + 1].shape[1]
        downs.append(FlatDown(
            child_parent=_flat_ids(ds.child_parent, cap_p),
            parity=ds.parity.reshape(-1),
            parent_children=_flat_ids(ds.parent_children, cap_c)))
    return levels, downs


# ---------------------------------------------------------------------------
# conv wrappers (flat 2D activations; env-selectable engine for A/B)
# ---------------------------------------------------------------------------

def _subm_impl() -> str:
    """Select the submanifold-conv engine (env override for A/B runs).

    Default: the wide-lane banded-1D engine (``bricks2d.subm_conv3_2d``).
    ``DODA_CONV=slab`` selects the slice-compacted window engine
    (``slabs.subm_conv3_slab``) at levels that carry slab maps —
    measured SLOWER end-to-end in its v1 form (2.98 vs 4.34 scenes/sec:
    27 narrow per-source gathers, 12 of them 1C-wide corner rows, lose
    more than the 2.3x GEMM-row compaction wins; see PERF.md), kept
    opt-in while the windowing is reworked. ``DODA_CONV=xla`` routes
    through the 3D concat-assembly engine (``bricks.subm_conv3_v2``),
    ``DODA_CONV=oracle`` through the shell-gather oracle — both via
    reshape shims, for A/B and debugging."""
    import os
    sel = os.environ.get('DODA_CONV', '')
    return sel if sel in ('oracle', 'xla', 'slab') else '2d'


def _fuse_norm_ok(fl: FlatLevel) -> bool:
    """Whether the norm+ReLU prologue can fuse into the subm conv
    (DODA_FUSE_NORM=1 enables; only the wide-lane 2D engine implements
    the fused path). Default OFF: measured end-to-end at 3.24 vs 4.29
    scenes/sec on the bench — the parallel mask assembly plus the
    per-row affine apply costs more HBM traffic than the one saved
    (rows, 64C) activation write+read."""
    import os
    if os.environ.get('DODA_FUSE_NORM', '0') != '1':
        return False
    impl = _subm_impl()
    return impl == '2d' or (impl == 'slab' and fl.slab is None)


def _deep_xla_rows() -> int:
    """Max flat-row count routed through the 3D concat-assembly engine.

    The deep U-Net levels (<= a few thousand bricks) are op-DISPATCH
    bound, not bandwidth bound: the r4 trace shows L2..L6 contribute
    ~190 of 927 ms forward almost entirely as per-op fixed overhead
    (~4-10 us x thousands of tiny assembly ops), while all conv GEMMs
    together are ~60 ms. The wide-lane 2d engine lowers to ~2x the
    stablehlo ops of ``bricks.subm_conv3_v2`` (864 vs 425 per conv), so
    routing tiny levels through v2 trades (irrelevant) tile padding for
    half the dispatches. 0 disables; DODA_DEEP_XLA=<rows> overrides."""
    import os
    return int(os.environ.get('DODA_DEEP_XLA', '0'))


def _fsubm(x2, fl: FlatLevel, w, dtype):
    impl = _subm_impl()
    if impl == 'slab' and fl.slab is not None:
        return slabs.subm_conv3_slab(x2, fl.slab, w, dtype)
    if impl in ('2d', 'slab'):
        if x2.shape[0] <= _deep_xla_rows():
            impl = 'xla'     # deep level: dispatch-bound, use v2
        else:
            return bricks2d.subm_conv3_2d(x2, fl.occ, fl.nbr, w, dtype)
    b = x2.shape[0]
    cin = x2.shape[1] // CELLS
    x3 = x2.reshape(b, CELLS, cin)
    if impl == 'xla':
        from ..ops.bricks import subm_conv3_v2
        out = subm_conv3_v2(x3, fl.occ, fl.nbr, w, dtype)
    else:
        out = subm_conv3(x3, fl.occ, fl.nbr, w, dtype)
    return out.reshape(b, -1).astype(x2.dtype)


def _conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform over fan_in = K * Cin (torch/spconv default)."""
    fan_in = shape[0] * shape[1] if len(shape) == 3 else shape[0]
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


from .norm import MaskedBatchNorm  # noqa: E402


class ResidualBlock(nn.Module):
    """Pre-activation residual block (ref: model/unet_block.py:10-38)."""

    cin: int
    cout: int
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, occ, nbr, train, domain):
        fl = FlatLevel(occ=occ, nbr=nbr)
        if self.cin == self.cout:
            identity = x
        else:
            wi = self.param('i_kernel', _conv_init, (self.cin, self.cout))
            identity = bricks2d.conv1x1_2d(x, occ, wi, self.dtype)
        fused = _fuse_norm_ok(fl)
        norm1 = MaskedBatchNorm(self.cin, dsnorm=self.dsnorm)
        w1 = self.param('kernel1', _conv_init, (27, self.cin, self.cout))
        if fused:
            s1, b1 = norm1(x, occ, train, domain, fold=True)
            h = bricks2d.subm_conv3_norm_2d(x, occ, nbr, w1, s1, b1,
                                            self.dtype)
        else:
            h = nn.relu(norm1(x, occ, train, domain))
            h = _fsubm(h, fl, w1, self.dtype)
        norm2 = MaskedBatchNorm(self.cout, dsnorm=self.dsnorm)
        w2 = self.param('kernel2', _conv_init, (27, self.cout, self.cout))
        if fused:
            s2, b2 = norm2(h, occ, train, domain, fold=True)
            h = bricks2d.subm_conv3_norm_2d(h, occ, nbr, w2, s2, b2,
                                            self.dtype)
        else:
            h = nn.relu(norm2(h, occ, train, domain))
            h = _fsubm(h, fl, w2, self.dtype)
        return h + identity


class VGGBlock(nn.Module):
    """BN -> ReLU -> SubMConv3 (ref: model/unet_block.py:41-52)."""

    cin: int
    cout: int
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, occ, nbr, train, domain):
        fl = FlatLevel(occ=occ, nbr=nbr)
        norm = MaskedBatchNorm(self.cin, dsnorm=self.dsnorm)
        w = self.param('kernel', _conv_init, (27, self.cin, self.cout))
        if _fuse_norm_ok(fl):
            s, b = norm(x, occ, train, domain, fold=True)
            return bricks2d.subm_conv3_norm_2d(x, occ, nbr, w, s, b,
                                               self.dtype)
        h = nn.relu(norm(x, occ, train, domain))
        return _fsubm(h, fl, w, self.dtype)


def _remat_policy(level: int = 0):
    """Checkpoint policy for the U-Net blocks (see UBlock.__call__).

    ``dots`` (default): save conv GEMM outputs, recompute assembly —
    measured +9% train throughput over blanket (PERF.md round 4).
    ``all``: blanket remat, save nothing — smallest HBM footprint.
    ``mixN`` (e.g. mix2): blanket at levels < N (whose saved dot outputs
    are the multi-GB rows at L0/L1), dots deeper (small, keeps most of
    the backward speedup) — a batch-4 memory configuration.
    ``off``: no remat at all — save every residual (biggest HBM
    footprint; measured batch-2 A/B in PERF.md round 5)."""
    import os
    v = os.environ.get('DODA_REMAT', 'dots')
    if v == 'all':
        return None                      # blanket remat: save nothing
    if v.startswith('mix') and level < int(v[3:] or 2):
        return None
    return jax.checkpoint_policies.dots_with_no_batch_dims_saveable


class UBlock(nn.Module):
    """Recursive U-stage (ref: model/unet_block.py:55-100)."""

    planes: tuple
    block_reps: int = 2
    residual: bool = True
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, levels, downs, level: int, train, domain):
        p = self.planes[0]
        # remat: recompute block internals (halo gathers, conv inputs) in
        # the backward pass instead of storing them — without this every
        # conv's halo stays live through backward and HBM blows up.
        # Policy: save conv GEMM outputs (dots_with_no_batch_dims), drop
        # everything else. The conv VJPs re-assemble their windows anyway
        # (custom_vjp), so replaying the forward GEMMs+assembly in the
        # backward is pure waste — with dot outputs saved the fwd replay
        # DCEs away and backward does 2 assemblies per conv (dx, dW)
        # instead of 3. DODA_REMAT=all restores the blanket policy
        # (smallest HBM footprint) for A/B and memory-bound configs.
        block_cls = ResidualBlock if self.residual else VGGBlock
        if os.environ.get('DODA_REMAT') == 'off':
            block = block_cls            # save every residual, no replay
        else:
            block = nn.remat(block_cls, static_argnums=(4,),
                             policy=_remat_policy(level))
        kw = dict(dsnorm=self.dsnorm, dtype=self.dtype)
        occ, nbr = levels[level].occ, levels[level].nbr

        for i in range(self.block_reps):
            x = block(p, p, name=f'block{i}', **kw)(x, occ, nbr, train,
                                                    domain)
        if len(self.planes) == 1:
            return x
        identity = x

        fd = downs[level]
        fused = _fuse_norm_ok(levels[level])
        occ_p = levels[level + 1].occ
        conv_norm = MaskedBatchNorm(p, dsnorm=self.dsnorm,
                                    name='conv_norm')
        wd = self.param('down_kernel', _conv_init, (8, p, self.planes[1]))
        if fused:
            s, b = conv_norm(x, occ, train, domain, fold=True)
            h = bricks2d.down_conv2_norm_2d(x, occ, occ_p, fd, wd, s, b,
                                            self.dtype)
        else:
            h = nn.relu(conv_norm(x, occ, train, domain))
            h = bricks2d.down_conv2_2d(h, occ_p, fd, wd, self.dtype)

        h = UBlock(self.planes[1:], self.block_reps, self.residual,
                   self.dsnorm, self.dtype, name='u')(
            h, levels, downs, level + 1, train, domain)

        deconv_norm = MaskedBatchNorm(self.planes[1], dsnorm=self.dsnorm,
                                      name='deconv_norm')
        wu = self.param('up_kernel', _conv_init, (8, self.planes[1], p))
        if fused:
            s, b = deconv_norm(h, occ_p, train, domain, fold=True)
            h = bricks2d.up_conv2_norm_2d(h, occ_p, occ, fd, wu, s, b,
                                          self.dtype)
        else:
            h = nn.relu(deconv_norm(h, occ_p, train, domain))
            h = bricks2d.up_conv2_2d(h, occ, fd, wu, self.dtype)

        x = _concat_channels(identity, h, p, p)   # skip-concat (2p)
        for i in range(self.block_reps):
            cin = 2 * p if i == 0 else p
            x = block(cin, p, name=f'tail{i}', **kw)(x, occ, nbr, train,
                                                     domain)
        return x


def _concat_channels(a: jax.Array, b: jax.Array, ca: int,
                     cb: int) -> jax.Array:
    """Per-cell channel concat of two (rows, 64*C) tensors — one
    128-input lane concat (the wide-lane skip connection)."""
    parts = []
    for cell in range(CELLS):
        parts.append(a[:, cell * ca:(cell + 1) * ca])
        parts.append(b[:, cell * cb:(cell + 1) * cb])
    return jnp.concatenate(parts, axis=1)


class SparseConvNet(nn.Module):
    """The full backbone + linear head (ref: model/unet.py:15-69)."""

    in_channel: int = 3
    mid_channel: int = 16
    n_classes: int = 20
    block_reps: int = 2
    block_residual: bool = True
    num_levels: int = 7
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, point_feats, plan: LevelPlan, train: bool = False,
                 domain=0, return_mid_feat: bool = False):
        """point_feats (Batch, N_cap, Cin) -> logits (Batch, N_cap, classes).

        Voxel (mean) reduction happens here, matching the fused
        pointgroup_ops.voxelization call at ref model/unet.py:91."""
        m = self.mid_channel
        grid0 = plan.grid0
        bt, cap0 = grid0.occ.shape[0], grid0.occ.shape[1]
        levels, downs = flatten_plan(plan)

        x3 = jax.vmap(lambda f, g: brick_feats_2d(f, g, 4))(point_feats,
                                                            grid0)
        x = x3.reshape(bt * cap0, CELLS * self.in_channel)

        w_in = self.param('input_kernel', _conv_init, (27, self.in_channel, m))
        x = _fsubm(x.astype(self.dtype), levels[0], w_in, self.dtype)

        planes = tuple(m * (i + 1) for i in range(self.num_levels))
        x = UBlock(planes, self.block_reps, self.block_residual, self.dsnorm,
                   self.dtype, name='unet')(x, levels, downs, 0, train,
                                            domain)

        # output norm folded past the voxel -> point gather: the affine +
        # relu run on (Batch*N_cap, m) points instead of the 16x larger
        # cell table (the per-cell pass also forced a 12.6M-row layout
        # copy before the gather in the traced forward). Stats still
        # come from the masked cells (norm.py fold path).
        o_scale, o_bias = MaskedBatchNorm(m, dsnorm=self.dsnorm,
                                          name='output_norm')(
            x, levels[0].occ, train, domain, fold=True)

        # voxel -> point gather (ref model/unet.py:62): flat global cell
        # ids; misses handled by clamp + where (padding would copy the
        # whole 6M-row cell table to add one zero row).
        #
        # Gather at 128-LANE GROUP granularity: a (cells, m) table with
        # m = 16 lanes per row is sub-tile, so XLA relayouts it
        # column-major and the row gather goes element-strided (traced
        # at ~24 ms for 786k points). Gathering g = 128/m cells per row
        # keeps full-tile rows (~1 ns/row) and the sub-block select is
        # a fused one-hot multiply-reduce.
        gidx = jax.vmap(lambda g: g.flat_index())(grid0)  # (Batch, N_cap)
        offs = (jnp.arange(bt, dtype=jnp.int32) * (cap0 * CELLS))[:, None]
        miss = gidx >= cap0 * CELLS
        gidx = jnp.minimum(gidx + offs, bt * cap0 * CELLS - 1)
        cells = x.reshape(bt * cap0 * CELLS, m)
        gathered = row_gather_128(cells, gidx.reshape(-1)).reshape(
            bt, -1, m).astype(jnp.float32)
        out_feats = jnp.where(miss[..., None], 0,
                              nn.relu(gathered * o_scale + o_bias))

        logits = nn.Dense(self.n_classes, name='linear',
                          kernel_init=nn.initializers.lecun_uniform())(
            out_feats.astype(jnp.float32))
        if return_mid_feat:
            return out_feats, logits
        return logits
