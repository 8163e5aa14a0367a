"""Offset-convention wrappers over the pointops core (component #22g).

The reference ships three wrapper variants of the same CUDA op set:

* ``lib/pointops2/functions/pointops2.py`` — offsets carry a leading 0
  (length b+1, ``offset[1:]`` handed to the kernels, pointops2.py:58,66);
* ``lib/pointops2/functions/pointops.py`` — legacy: cumulative segment
  ends only (length b, pointops.py:60-69);
* ``lib/pointops2/functions/pointops_ablation.py`` — legacy offsets plus
  a ``relative`` flag on queryandgroup (pointops_ablation.py:79-101).

The TPU core (``doda_tpu.ops.pointops``) replaces the offset threading
with validity masks + static shapes; these wrappers restore the flat
"concatenated scenes + offsets" surface for users porting reference
code. They are HOST-LEVEL entry points: offsets must be concrete
(numpy / python ints, like the reference wrappers whose kernel launches
read ``offset[i].item()``), each segment is dispatched through the
jitted core ops, and returned indices are GLOBAL into the flat arrays —
exactly the reference convention.

Convention detection: a leading-zero form always starts with 0, a
cumulative-ends form never does (an empty first scene is not
representable in either). Pass ``leading_zero=`` to override.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import pointops as core

__all__ = ['furthestsampling', 'knnquery', 'grouping', 'queryandgroup',
           'subtraction', 'aggregation', 'interpolation', 'interpolation2']


def _spans(offset, leading_zero=None):
    """Offsets (either convention) -> [(start, end), ...] host ints."""
    off = np.asarray(offset).astype(np.int64).tolist()
    if leading_zero is None:
        leading_zero = bool(off and off[0] == 0)
    ends = off[1:] if leading_zero else off
    starts = [0] + ends[:-1]
    return list(zip(starts, ends))


def furthestsampling(xyz, offset, new_offset, leading_zero=None):
    """FPS per segment -> (m_total,) int32 GLOBAL indices
    (ref pointops.py:56-73 / pointops2.py:34-50)."""
    spans = _spans(offset, leading_zero)
    new_spans = _spans(new_offset, leading_zero)
    out = []
    for (s, e), (ns, ne) in zip(spans, new_spans):
        sel = core.furthest_point_sampling(jnp.asarray(xyz)[s:e], ne - ns)
        out.append(np.asarray(sel) + s)
    return jnp.asarray(np.concatenate(out).astype(np.int32))


def knnquery(nsample, xyz, new_xyz, offset, new_offset, leading_zero=None):
    """Per-segment KNN -> (idx (m, nsample) GLOBAL int32, dist (m, nsample))
    with dist euclidean (the reference sqrt()s the kernel's dist2,
    pointops2.py:66). Segments with fewer than ``nsample`` points repeat
    their nearest neighbors (the reference leaves heap-initial slots)."""
    if new_xyz is None:
        new_xyz = xyz
    xyz = jnp.asarray(xyz)
    new_xyz = jnp.asarray(new_xyz)
    idx_out, dist_out = [], []
    for (s, e), (ns, ne) in zip(_spans(offset, leading_zero),
                                _spans(new_offset, leading_zero)):
        k = min(nsample, e - s)
        idx, dist = core.knn(k, new_xyz[ns:ne], xyz[s:e])
        idx, dist = np.asarray(idx) + s, np.asarray(dist)
        if k < nsample:  # short segment: pad by repeating the nearest
            idx = np.concatenate(
                [idx, np.repeat(idx[:, :1], nsample - k, axis=1)], axis=1)
            dist = np.concatenate(
                [dist, np.repeat(dist[:, :1], nsample - k, axis=1)], axis=1)
        idx_out.append(idx)
        dist_out.append(dist)
    return (jnp.asarray(np.concatenate(idx_out).astype(np.int32)),
            jnp.asarray(np.concatenate(dist_out).astype(np.float32)))


def grouping(input, idx):
    """(n, c) gathered by GLOBAL (m, nsample) -> (m, nsample, c); the
    backward is the gather VJP (ref pointops.py:94-122)."""
    return jnp.asarray(input)[jnp.asarray(idx)]


def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                  use_xyz=True, relative=True, return_grouped_xyz=False,
                  leading_zero=None):
    """KNN + gather + optional coord-diff concat.

    Default return matches pointops2.py:103-123 (new_feat only);
    ``return_grouped_xyz=True`` restores the legacy tuple
    (pointops.py:125-146); ``relative=False`` is the ablation variant
    that keeps absolute grouped coords (pointops_ablation.py:79-101)."""
    if new_xyz is None:
        new_xyz = xyz
    xyz = jnp.asarray(xyz)
    new_xyz = jnp.asarray(new_xyz)
    feat = jnp.asarray(feat)
    if idx is None:
        idx, _ = knnquery(nsample, xyz, new_xyz, offset, new_offset,
                          leading_zero)
    grouped_xyz = xyz[idx]                        # (m, nsample, 3)
    shifted = grouped_xyz - new_xyz[:, None, :] if relative else grouped_xyz
    grouped_feat = feat[idx]                      # (m, nsample, c)
    new_feat = (jnp.concatenate([shifted, grouped_feat], axis=-1)
                if use_xyz else grouped_feat)
    return (new_feat, grouped_xyz) if return_grouped_xyz else new_feat


# (n, c) x (n, c) x GLOBAL idx forms are offset-free in the reference
# too (pointops.py:148-206) — the core implementations apply directly.
subtraction = core.subtraction
aggregation = core.aggregation


def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3,
                  leading_zero=None):
    """k-NN inverse-distance feature propagation per segment
    (ref pointops.py:209-223): w ~ 1/(d + 1e-8), d euclidean."""
    idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset, leading_zero)
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    return (jnp.asarray(feat)[idx] * w[..., None]).sum(axis=1)


# the reference's Interpolation.apply ("interpolation2") differs from
# interpolation() only in having a backward — JAX differentiates the
# gather/weighted-sum natively, so they coincide here.
interpolation2 = interpolation
