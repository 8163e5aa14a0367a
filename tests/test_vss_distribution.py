"""VSS occlusion-model validation vs the reference's HPR algorithm.

The reference implements visibility with open3d's
``hidden_point_removal`` (Katz spherical-flip + convex hull,
ref augmentor_utils.py:159-163, radius=1000 in every shipped cfg).
Our TPU-era replacement is a spherical z-buffer
(``aug_ops.depth_buffer_visibility``) — a direct model of panoramic
range-scan occlusion. SURVEY §7's requirement is that the replacement
"match the *distribution* of occlusion, not bit-exactness".

This test reimplements Katz HPR in ~15 lines on scipy's ConvexHull
(same algorithm open3d runs, minus the o3d dependency) and compares
the two on seeded synthetic rooms:

* scene-level kept-fraction must land in the same regime (the z-buffer
  keeps visible front surfaces, HPR keeps hull-extremal points;
  ratios within [0.7, 1.4] across rooms), and
* per-octant survival fractions must correlate strongly (>0.7) —
  i.e. both models occlude the SAME parts of the scene (back walls,
  shadowed floor), not just similar totals.

HPR with a finite flip radius under-reports visibility on concave
clutter while the z-buffer resolves it at bin resolution — exact
agreement is neither expected nor desired (the z-buffer is closer to a
real scanner); this bounds the distributional drift instead.
"""

import numpy as np
import pytest

scipy_spatial = pytest.importorskip('scipy.spatial')

from doda_tpu.data.augmentor.aug_ops import depth_buffer_visibility


def katz_hpr(points, camera, radius_mult=1000.0):
    """Katz et al. hidden point removal: spherical flip + convex hull.

    Mirrors o3d.geometry.PointCloud.hidden_point_removal(camera, radius)
    with radius = radius_mult (the reference passes 1000 directly,
    ref cfgs/dataset_cfgs/*/..._cfg.yaml 'radius: 1000')."""
    rel = points - camera
    norm = np.linalg.norm(rel, axis=1, keepdims=True) + 1e-12
    flipped = rel + 2.0 * (radius_mult - norm) * rel / norm
    pts = np.concatenate([flipped, np.zeros((1, 3))], axis=0)
    hull = scipy_spatial.ConvexHull(pts)
    visible = np.zeros(len(points), bool)
    verts = hull.vertices
    visible[verts[verts < len(points)]] = True
    return visible


def synth_room(rng, n=6000, w=6.0, d=5.0, h=2.6):
    """Floor + two walls + boxy clutter (the shapes VSS sees)."""
    n_f, n_w, n_c = n // 2, n // 4, n - n // 2 - n // 4
    floor = np.stack([rng.uniform(0, w, n_f), rng.uniform(0, d, n_f),
                      np.zeros(n_f)], 1)
    wall = np.stack([rng.uniform(0, w, n_w),
                     np.where(rng.random(n_w) < 0.5, 0.0, d),
                     rng.uniform(0, h, n_w)], 1)
    boxes = []
    for _ in range(4):
        c = np.array([rng.uniform(1, w - 1), rng.uniform(1, d - 1), 0.0])
        s = np.array([rng.uniform(0.3, 1.0), rng.uniform(0.3, 1.0),
                      rng.uniform(0.3, 1.2)])
        m = n_c // 4
        face = rng.integers(0, 3, m)
        p = rng.uniform(0, 1, (m, 3)) * s
        p[np.arange(m), face] = (rng.integers(0, 2, m)
                                 * s[face])          # on a box face
        boxes.append(c + p)
    pts = np.concatenate([floor, wall] + boxes)
    return pts


def octant_survival(points, mask, center):
    keys = ((points[:, 0] > center[0]).astype(int) * 4
            + (points[:, 1] > center[1]).astype(int) * 2
            + (points[:, 2] > center[2]).astype(int))
    out = []
    for k in range(8):
        sel = keys == k
        if sel.sum() >= 50:
            out.append(mask[sel].mean())
        else:
            out.append(np.nan)
    return np.array(out)


def test_zbuffer_matches_hpr_distribution():
    rng = np.random.default_rng(11)
    ratios, corrs = [], []
    for room in range(8):
        pts = synth_room(rng)
        cam = np.array([rng.uniform(1, 5), rng.uniform(1, 4),
                        rng.uniform(1.2, 2.2)])
        hpr = katz_hpr(pts, cam)
        zbuf = depth_buffer_visibility(pts, cam)
        ratios.append(zbuf.mean() / max(hpr.mean(), 1e-9))
        center = (pts.min(0) + pts.max(0)) / 2
        a = octant_survival(pts, hpr, center)
        b = octant_survival(pts, zbuf, center)
        ok = ~np.isnan(a) & ~np.isnan(b)
        if ok.sum() >= 4 and a[ok].std() > 1e-6 and b[ok].std() > 1e-6:
            corrs.append(np.corrcoef(a[ok], b[ok])[0, 1])
    ratios = np.array(ratios)
    assert (ratios > 0.7).all() and (ratios < 1.4).all(), (
        'z-buffer kept-fraction out of the HPR regime: '
        f'ratios={np.round(ratios, 3)}')
    assert len(corrs) >= 4, 'octant stats degenerate across rooms'
    assert np.mean(corrs) > 0.7, (
        'z-buffer occludes different scene parts than HPR: '
        f'octant survival correlations={np.round(corrs, 3)}')
