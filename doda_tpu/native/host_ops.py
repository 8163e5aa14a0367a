"""ctypes bindings for the native host-ops library, with NumPy fallbacks.

Build once with ``make -C doda_tpu/native`` (plain g++, no pybind11 —
not in this image). Every entry point silently falls back to a NumPy
implementation when the shared library is absent, so the framework has
no hard native dependency.

Reference counterparts: the CPU voxel hash (lib/pointgroup_ops/src/
voxelize/voxelize.cpp:61-155), knnquery-based label broadcast
(model/unet.py:135-145), and the BFS clustering host path
(lib/pointgroup_ops/src/bfs_cluster/bfs_cluster.cpp:28-75).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), 'lib',
                        'libdoda_host.so')
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.voxelize_unique.restype = ctypes.c_int32
    lib.voxelize_unique.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
    lib.voxelize_mean.restype = None
    lib.voxelize_mean.argtypes = [f32p, i32p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64, f32p]
    lib.nn1_grid.restype = None
    lib.nn1_grid.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                             ctypes.c_float, i32p]
    lib.connected_components.restype = None
    lib.connected_components.argtypes = [f32p, i32p, ctypes.c_int64,
                                         ctypes.c_float, i32p]
    f64p = ctypes.POINTER(ctypes.c_double)
    try:
        lib.elastic_offsets.restype = None
        lib.elastic_offsets.argtypes = [f32p, i32p, ctypes.c_double,
                                        ctypes.c_double, f64p,
                                        ctypes.c_int64, f64p]
    except AttributeError:
        pass  # stale .so without the symbol: callers fall back
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def voxelize_unique(coords: np.ndarray):
    """coords (n, 3) int -> (p2v (n,), voxel_coords (m, 3)).

    First-appearance voxel ids (reference insert-order semantics)."""
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    lib = _load()
    if lib is None:
        uniq, p2v = np.unique(coords, axis=0, return_inverse=True)
        # np.unique sorts; remap to first-appearance order for parity
        first = np.full(len(uniq), n, np.int64)
        np.minimum.at(first, p2v, np.arange(n))
        order = np.argsort(first, kind='stable')
        rank = np.empty_like(order)
        rank[order] = np.arange(len(uniq))
        return rank[p2v].astype(np.int32), uniq[order].astype(np.int32)
    p2v = np.empty(n, np.int32)
    vox = np.empty((max(n, 1), 3), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    m = lib.voxelize_unique(_ptr(coords, i32p), n, _ptr(p2v, i32p),
                            _ptr(vox, i32p))
    return p2v, vox[:m].copy()


def voxelize_mean(feats: np.ndarray, p2v: np.ndarray, n_voxels: int):
    """Scatter-mean (n, c) point features into (n_voxels, c)."""
    feats = np.ascontiguousarray(feats, np.float32)
    p2v = np.ascontiguousarray(p2v, np.int32)
    lib = _load()
    if lib is None:
        out = np.zeros((n_voxels, feats.shape[1]), np.float32)
        np.add.at(out, p2v, feats)
        cnt = np.bincount(p2v, minlength=n_voxels)[:, None]
        return out / np.maximum(cnt, 1)
    out = np.empty((n_voxels, feats.shape[1]), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.voxelize_mean(_ptr(feats, f32p), _ptr(p2v, i32p), len(feats),
                      feats.shape[1], n_voxels, _ptr(out, f32p))
    return out


def nn1(src: np.ndarray, queries: np.ndarray, cell: float = 0.1):
    """1-NN index of each query into src (grid-hash accelerated)."""
    src = np.ascontiguousarray(src, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    lib = _load()
    if lib is None:
        from scipy.spatial import cKDTree
        return cKDTree(src).query(queries, k=1)[1].astype(np.int32)
    out = np.empty(len(queries), np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.nn1_grid(_ptr(src, f32p), len(src), _ptr(queries, f32p),
                 len(queries), ctypes.c_float(cell), _ptr(out, i32p))
    return out


def elastic_interp(noise3: np.ndarray, dims, gran: float, mag: float,
                   xyz: np.ndarray):
    """xyz + trilinear(noise3, xyz) * mag — the elastic-distortion
    lookup (host twin of aug_ops._trilinear_regular). Returns None when
    the native lib (or the symbol) is unavailable; the caller keeps its
    NumPy path."""
    lib = _load()
    if lib is None or not hasattr(lib, 'elastic_offsets'):
        return None
    noise3 = np.ascontiguousarray(noise3, np.float32)
    dims_a = np.ascontiguousarray(dims, np.int32)
    xyz64 = np.ascontiguousarray(xyz, np.float64)
    out = np.empty_like(xyz64)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.elastic_offsets(_ptr(noise3, f32p), _ptr(dims_a, i32p),
                        ctypes.c_double(gran), ctypes.c_double(mag),
                        _ptr(xyz64, f64p), len(xyz64), _ptr(out, f64p))
    return out


def connected_components(xyz: np.ndarray, key: np.ndarray, radius: float):
    """Union-find components over the radius graph restricted to equal
    ``key`` (host twin of ops.pointops.bfs_cluster)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    key = np.ascontiguousarray(key, np.int32)
    lib = _load()
    if lib is None:
        from scipy.spatial import cKDTree
        import scipy.sparse as sp
        tree = cKDTree(xyz)
        pairs = tree.query_pairs(radius, output_type='ndarray')
        pairs = pairs[key[pairs[:, 0]] == key[pairs[:, 1]]]
        n = len(xyz)
        g = sp.coo_matrix((np.ones(len(pairs)),
                           (pairs[:, 0], pairs[:, 1])), shape=(n, n))
        n_c, labels = sp.csgraph.connected_components(g, directed=False)
        # densify by first appearance
        first = {}
        out = np.empty(n, np.int32)
        for i, l in enumerate(labels):
            out[i] = first.setdefault(l, len(first))
        return out
    out = np.empty(len(xyz), np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.connected_components(_ptr(xyz, f32p), _ptr(key, i32p), len(xyz),
                             ctypes.c_float(radius), _ptr(out, i32p))
    return out
