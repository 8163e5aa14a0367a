"""Device-side train augmentation: scene_aug + elastic inside jit.

The reference runs every augmentation in CPU dataloader workers
(ref: dataset/augmentor/data_augmentor.py:171-193). Host profiling at
bench scale shows elastic alone is ~60% of __getitem__ (150k-point
trilinear noise lookups), and the north-star design (BASELINE.json)
moves the dense per-point transforms onto the chip. With
``DATA_AUG.device: true``:

* host workers keep the stages that change the point SET or need
  irregular state — VSS, TACM, crop, shuffle — and emit un-rotated,
  un-distorted padded batches (the augmentor drops scene_aug and
  forces the elastic stage into its pass-through scale+shift form),
* the jitted train step applies ``device_augment`` to the padded
  (B, N_cap) batch: per-scene random rotation/flip/jitter matrix
  (ref aug math: aug_ops.scene_aug), then elastic distortion with
  blurred normal noise grids (aug_ops.elastic) on STATIC-size grids,
  then re-voxelizes (masked min-shift + floor).

Semantics vs the host path: identical math per stage; two deliberate
deviations, both distribution-preserving and documented in PARITY.md —
(a) crop windows are chosen on pre-aug coordinates (the host must crop
before it knows the device transform), (b) elastic noise grids have a
static extent bound instead of per-scene sizing (the field is
stationary, so interior statistics are identical; points beyond the
bound — none at reference crop sizes — get zero offset, the same
fill rule scipy's interpolator used).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.model_fn import PointBatch

# voxel-unit extent bound for the static elastic grids: reference crops
# bound scenes to full_scale (<= 512 voxels), and xyz here is
# mean-centered, so |xyz| stays well under this.
GRID_BOUND = 768


def _rotation_matrix(cfg_sa, key):
    """Random jitter/flip/rotation matrix (ref aug_ops.scene_aug,
    augmentor_utils.py:85-104) from a per-scene key."""
    kj, kf, kfp, kr, krp = jax.random.split(key, 5)
    m = jnp.eye(3)
    jit_cfg = cfg_sa.get('jitter')
    if _enabled(jit_cfg):
        m = m + jax.random.normal(kj, (3, 3)) * 0.1
    flip_cfg = cfg_sa.get('flip')
    if _enabled(flip_cfg):
        p = _prob(flip_cfg)
        do = jax.random.uniform(kfp) < p
        m = m.at[0, 0].multiply(jnp.where(do, -1.0, 1.0))
    rot = cfg_sa.get('rotation')
    if _enabled(rot):
        p = _prob(rot)
        do = jax.random.uniform(krp) < p
        vals = jnp.asarray(rot['value'], jnp.float32)
        ang = jnp.where(do, (jax.random.uniform(kr, (3,)) * 2 - 1)
                        * jnp.pi * vals, 0.0)
        rx, ry, rz = ang[0], ang[1], ang[2]
        cx, sx = jnp.cos(rx), jnp.sin(rx)
        cy, sy = jnp.cos(ry), jnp.sin(ry)
        cz, sz = jnp.cos(rz), jnp.sin(rz)
        mx = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
        mx = mx.at[1, 1].set(cx).at[1, 2].set(-sx)
        mx = mx.at[2, 1].set(sx).at[2, 2].set(cx)
        my = jnp.eye(3).at[0, 0].set(cy).at[0, 2].set(sy)
        my = my.at[2, 0].set(-sy).at[2, 2].set(cy)
        mz = jnp.eye(3).at[0, 0].set(cz).at[0, 1].set(sz)
        mz = mz.at[1, 0].set(-sz).at[1, 1].set(cz)
        m = m @ (mx @ my @ mz)
    return m


def _enabled(c):
    if c is None or c is False:
        return False
    if isinstance(c, dict):
        return c.get('enabled', True)
    return True


def _prob(c):
    return float(c.get('p', 1.0)) if isinstance(c, dict) else 1.0


def _blur3(n):
    """Two rounds of 3-tap box filters along each axis, zeros outside
    (== scipy.ndimage.uniform_filter1d(size=3, mode='constant'))."""
    def box(x, axis):
        z = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
        lo = jnp.concatenate(
            [z, jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
            axis=axis)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), z],
            axis=axis)
        return (lo + x + hi) / 3.0
    for _ in range(2):
        for axis in range(1, 4):     # n is (3, D, D, D)
            n = box(n, axis)
    return n


def elastic_offsets(noise, gran, xyz):
    """Trilinear lookup of 3 blurred noise fields at scaled coords
    (same grid convention as aug_ops._trilinear_regular: axes span
    +-(D-1)*gran with D points)."""
    d = noise.shape[1]
    u = (xyz + (d - 1) * gran) / (2.0 * gran)
    oob = ((u < 0) | (u > d - 1)).any(axis=-1)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, d - 2)
    frac = u - i0
    flat = noise.reshape(3, -1)
    base = (i0[:, 0] * d + i0[:, 1]) * d + i0[:, 2]
    w1 = frac.T
    w0 = 1.0 - w1
    acc = jnp.zeros((3, xyz.shape[0]), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((w1[0] if dx else w0[0])
                     * (w1[1] if dy else w0[1])
                     * (w1[2] if dz else w0[2]))
                idx = base + (dx * d + dy) * d + dz
                acc = acc + w[None, :] * flat[:, idx]
    return jnp.where(oob[None, :], 0.0, acc).T


def _elastic_scene(cfg_el, voxel_scale, xyz_scaled, key):
    """(ref aug_ops.elastic + augmentor.elastic loop over value pairs)"""
    x = xyz_scaled
    for i, (gran_fac, mag_fac) in enumerate(cfg_el['value']):
        gran = max(int(gran_fac * voxel_scale // 50), 1)
        mag = mag_fac * voxel_scale / 50.0
        d = int(GRID_BOUND // gran + 3)
        k = jax.random.fold_in(key, i)
        noise = jax.random.normal(k, (3, d, d, d), jnp.float32)
        noise = _blur3(noise)
        x = x + elastic_offsets(noise, gran, x) * mag
    return x


def aug_fn_for(data_cfg, aug_list=None):
    """Factory: a ``f(batch, key) -> batch`` device-aug closure for one
    data config, or None when ``DATA_AUG.device`` is off or no device
    stage (scene_aug/elastic) is in the effective aug_list.

    ``aug_list`` overrides the config's list — the ST mix dataset runs
    only the post-mix pipeline (elastic/crop/shuffle) on the target
    stream (mix_dataset.py:27-29), so its device closure must match.
    """
    ac = data_cfg.get('DATA_AUG', None)
    if not ac or not ac.get('enabled', True) or not ac.get('device', False):
        return None
    lst = list(aug_list if aug_list is not None else ac.get('aug_list', []))
    if not any(s in lst and _enabled(ac.get(s))
               for s in ('scene_aug', 'elastic')):
        return None
    return functools.partial(device_augment, ac,
                             data_cfg.DATA_PROCESSOR.voxel_scale,
                             aug_list=lst)


def device_augment(aug_cfg, voxel_scale, batch: PointBatch,
                   key, aug_list=None) -> PointBatch:
    """Apply scene_aug + elastic to a padded train batch inside jit.

    Respects the cfg aug_list membership and per-stage enable/p gates.
    Returns a PointBatch with new coords (+ feats when the stages
    touch xyz_middle); invalid rows keep coords 0 / feats 0.
    """
    if aug_list is None:
        aug_list = aug_cfg.get('aug_list', [])
    do_scene = 'scene_aug' in aug_list and _enabled(aug_cfg.get('scene_aug'))
    do_elast = 'elastic' in aug_list and _enabled(aug_cfg.get('elastic'))
    if not (do_scene or do_elast):
        return batch

    bt = batch.coords.shape[0]
    keys = jax.random.split(key, bt)

    def one(xyz_mid, valid, k):
        ks, ke, kp = jax.random.split(k, 3)
        xyz_mid = jnp.where(valid[:, None], xyz_mid, 0.0)
        if do_scene:
            m = _rotation_matrix(aug_cfg.scene_aug, ks)
            xyz_mid = xyz_mid @ m
        x = xyz_mid * voxel_scale
        if do_elast:
            p = _prob(aug_cfg.elastic)
            xe = _elastic_scene(aug_cfg.elastic, voxel_scale, x, ke)
            gate = jax.random.uniform(kp) < p
            x = jnp.where(gate, xe, x)
            if aug_cfg.elastic.get('apply_to_feat', False):
                xyz_mid = jnp.where(gate, xe / voxel_scale, xyz_mid)
        # re-voxelize: masked min-shift + floor (augmentor.elastic tail)
        big = jnp.asarray(3.4e38, jnp.float32)
        mn = jnp.min(jnp.where(valid[:, None], x, big), axis=0)
        mn = jnp.where(jnp.isfinite(mn) & (mn < big / 2), mn, 0.0)
        v = jnp.where(valid[:, None], x - mn, 0.0)
        coords = jnp.floor(v).astype(jnp.int32)
        return coords, jnp.where(valid[:, None], xyz_mid, 0.0)

    coords, xyz_mid = jax.vmap(one)(batch.feats[..., :3], batch.valid,
                                    keys)
    feats = batch.feats.at[..., :3].set(xyz_mid.astype(batch.feats.dtype))
    return batch._replace(coords=coords, feats=feats)
