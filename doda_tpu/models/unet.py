"""Submanifold sparse 3D U-Net on the brick engine.

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
* all tensors are padded, statically shaped, batched per scene
  (Batch, B_cap_level, 64, C) with vmapped index ops and flat GEMMs,
* convs run in bfloat16 on the MXU with f32 accumulation; norms in f32.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bricks import (BrickGrid, brick_feats, brickify,
                          build_brick_downsample, build_brick_rulebook,
                          down_conv2, subm_conv3, unbrick_feats, up_conv2)

Dtype = Any


class LevelPlan(NamedTuple):
    """Per-batch index structures, one entry per U-Net level (vmapped).

    grid0  : BrickGrid at level 0 (holds point<->cell maps)
    occs   : tuple of (Batch, B_cap_l, 64) bool
    nbrs   : tuple of (Batch, B_cap_l, 27) int32
    downs  : tuple of BrickDown between level l and l+1 (len = levels - 1)
    """

    grid0: BrickGrid
    occs: tuple
    nbrs: tuple
    downs: tuple


def default_brick_caps(b_cap0: int, num_levels: int,
                       floor: int = 64) -> tuple:
    """Capacity schedule: brick counts shrink ~4x per level; we budget 2x
    for safety. Overflowing bricks fall into the null slot (dropped)."""
    caps = []
    c = b_cap0
    for _ in range(num_levels):
        caps.append(max(c, floor))
        c //= 2
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
    return LevelPlan(grid0=grid0, occs=tuple(occs), nbrs=tuple(nbrs),
                     downs=tuple(downs))


def build_level_plan(coords: jax.Array, valid: jax.Array,
                     b_caps: Sequence[int]) -> LevelPlan:
    """Batched plan: coords (Batch, N_cap, 3) voxel coords, valid mask."""
    return jax.vmap(lambda c, v: _scene_plan(c, v, tuple(b_caps)))(
        coords, valid)


# ---------------------------------------------------------------------------
# batched op wrappers (leading scene dim on both data and indices)
# ---------------------------------------------------------------------------

def _subm_impl():
    """Select the submanifold-conv engine (env override for A/B runs).

    Default everywhere: the concat-assembly XLA path (``subm_conv3_v2``)
    — measured 3x faster than both round-1 engines on v5e (15.3 ms vs
    46/53 ms per level-0 conv) because assembly is a single fused
    gather+concat pass and the conv is exact-tap MXU work. The Pallas
    kernels remain for A/B: ``DODA_CONV=pallas2`` (banded GEMM, fast
    GEMM core but store-bound assembly), ``DODA_CONV=pallas1`` (round-1
    kernel), ``DODA_CONV=oracle`` (shell-gather reference engine)."""
    import os
    sel = os.environ.get('DODA_CONV', '')
    if sel in ('oracle', 'pallas1', 'pallas2'):
        return sel
    return 'xla'


def _bsubm(x, occ, nbr, w, dtype):
    impl = _subm_impl()
    if impl in ('pallas1', 'pallas2', 'xla'):
        # Flatten scenes into the brick dim (vmap of pallas_call would
        # fold the batch into the VMEM block and overflow it): per-scene
        # neighbor ids get a scene offset; every scene's null slot (cap)
        # maps to the single global null row at batch*cap.
        if impl == 'pallas1':
            from ..ops.pallas_halo import halo_conv as conv
        elif impl == 'pallas2':
            from ..ops.pallas_halo2 import halo_conv2 as conv
        else:
            from ..ops.bricks import subm_conv3_v2 as conv
        bt, cap = nbr.shape[0], nbr.shape[1]
        offs = (jnp.arange(bt, dtype=jnp.int32) * cap)[:, None, None]
        nbr_flat = jnp.where(nbr >= cap, bt * cap, nbr + offs)
        out = conv(x.reshape(bt * cap, *x.shape[2:]),
                   occ.reshape(bt * cap, -1),
                   nbr_flat.reshape(bt * cap, 27), w, dtype)
        return out.reshape(bt, cap, out.shape[-2], out.shape[-1])
    return jax.vmap(lambda f, o, n: subm_conv3(f, o, n, w, dtype))(x, occ, nbr)


def _bdown(x, ds, w, dtype):
    return jax.vmap(lambda f, d: down_conv2(f, d, w, dtype))(x, ds)


def _bup(p, occ, ds, w, dtype):
    return jax.vmap(lambda f, o, d: up_conv2(f, o, d, w, dtype))(p, occ, ds)


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
        if self.cin == self.cout:
            identity = x
        else:
            wi = self.param('i_kernel', _conv_init, (self.cin, self.cout))
            identity = jnp.einsum('...i,io->...o', x, wi)
        h = MaskedBatchNorm(self.cin, dsnorm=self.dsnorm)(x, occ, train,
                                                          domain)
        h = nn.relu(h)
        w1 = self.param('kernel1', _conv_init, (27, self.cin, self.cout))
        h = _bsubm(h, occ, nbr, w1, self.dtype)
        h = MaskedBatchNorm(self.cout, dsnorm=self.dsnorm)(h, occ, train,
                                                           domain)
        h = nn.relu(h)
        w2 = self.param('kernel2', _conv_init, (27, self.cout, self.cout))
        h = _bsubm(h, occ, nbr, w2, self.dtype)
        return h + identity


class VGGBlock(nn.Module):
    """BN -> ReLU -> SubMConv3 (ref: model/unet_block.py:41-52)."""

    cin: int
    cout: int
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, occ, nbr, train, domain):
        h = MaskedBatchNorm(self.cin, dsnorm=self.dsnorm)(x, occ, train,
                                                          domain)
        h = nn.relu(h)
        w = self.param('kernel', _conv_init, (27, self.cin, self.cout))
        return _bsubm(h, occ, nbr, w, self.dtype)


class UBlock(nn.Module):
    """Recursive U-stage (ref: model/unet_block.py:55-100)."""

    planes: tuple
    block_reps: int = 2
    residual: bool = True
    dsnorm: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, plan: LevelPlan, level: int, train, domain):
        p = self.planes[0]
        # remat: recompute block internals (halo gathers, conv inputs) in
        # the backward pass instead of storing them — without this every
        # conv's halo stays live through backward and HBM blows up.
        block = nn.remat(ResidualBlock if self.residual else VGGBlock,
                         static_argnums=(4,))
        kw = dict(dsnorm=self.dsnorm, dtype=self.dtype)
        occ, nbr = plan.occs[level], plan.nbrs[level]

        for i in range(self.block_reps):
            x = block(p, p, name=f'block{i}', **kw)(x, occ, nbr, train,
                                                    domain)
        if len(self.planes) == 1:
            return x
        identity = x

        ds = jax.tree.map(lambda a: a, plan.downs[level])  # BrickDown pytree
        h = MaskedBatchNorm(p, dsnorm=self.dsnorm, name='conv_norm')(
            x, occ, train, domain)
        h = nn.relu(h)
        wd = self.param('down_kernel', _conv_init, (8, p, self.planes[1]))
        h = _bdown(h, ds, wd, self.dtype)

        h = UBlock(self.planes[1:], self.block_reps, self.residual,
                   self.dsnorm, self.dtype, name='u')(
            h, plan, level + 1, train, domain)

        h = MaskedBatchNorm(self.planes[1], dsnorm=self.dsnorm,
                            name='deconv_norm')(h, plan.occs[level + 1],
                                                train, domain)
        h = nn.relu(h)
        wu = self.param('up_kernel', _conv_init, (8, self.planes[1], p))
        h = _bup(h, occ, ds, wu, self.dtype)

        x = jnp.concatenate([identity, h], axis=-1)  # skip-concat (2p)
        for i in range(self.block_reps):
            cin = 2 * p if i == 0 else p
            x = block(cin, p, name=f'tail{i}', **kw)(x, occ, nbr, train,
                                                     domain)
        return x


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
        x = jax.vmap(lambda f, g: brick_feats(f, g, 4))(point_feats, grid0)

        w_in = self.param('input_kernel', _conv_init, (27, self.in_channel, m))
        x = _bsubm(x, plan.occs[0], plan.nbrs[0], w_in, self.dtype)

        planes = tuple(m * (i + 1) for i in range(self.num_levels))
        x = UBlock(planes, self.block_reps, self.block_residual, self.dsnorm,
                   self.dtype, name='unet')(x, plan, 0, train, domain)

        x = MaskedBatchNorm(m, dsnorm=self.dsnorm, name='output_norm')(
            x, plan.occs[0], train, domain)
        x = nn.relu(x)

        out_feats = jax.vmap(unbrick_feats)(x, grid0)  # voxel -> point
        logits = nn.Dense(self.n_classes, name='linear',
                          kernel_init=nn.initializers.lecun_uniform())(
            out_feats.astype(jnp.float32))
        if return_mid_feat:
            return out_feats, logits
        return logits
