"""Checkpoint I/O with the reference's lifecycle semantics.

Serialization is flax msgpack (single file per checkpoint, structure
restored against an in-memory template — optimizer NamedTuples survive).
Mirrors util/model_utils.py: save {epoch, state, commit_id, metric}
(ref :87-94), auto-resume from the newest ``train_epoch_*`` checkpoint
(ref tool/train.py:350-353), strict/non-strict pretrain loading
(ref :73-84), and rolling deletion keeping ~2 checkpoints
(ref tool/train.py:253-257).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess

import jax
import numpy as np
from flax import serialization


def get_git_commit_id():
    """(ref: util/common_utils.py:146-151)"""
    try:
        out = subprocess.run(['git', 'rev-parse', 'HEAD'],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL)
        return out.stdout.decode()[:7] or '0000000'
    except Exception:
        return '0000000'


def save_params(path, state, epoch, metric=None):
    """Save a TrainState + metadata to ``path`` (msgpack file)."""
    path = str(path)
    host_state = jax.tree.map(np.asarray, state)
    blob = serialization.to_bytes(host_state)
    meta = {'epoch': int(epoch),
            'metric': float(-1.0 if metric is None else metric),
            'commit_id': get_git_commit_id()}
    header = json.dumps(meta).encode()
    with open(path + '.tmp', 'wb') as f:
        f.write(len(header).to_bytes(8, 'little'))
        f.write(header)
        f.write(blob)
    os.replace(path + '.tmp', path)


def _read(path):
    with open(str(path), 'rb') as f:
        n = int.from_bytes(f.read(8), 'little')
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    return meta, blob


def load_params_from_ckpt(path, state, logger=None):
    """Full resume: params/stats/optimizer/step + next epoch
    (ref: util/model_utils.py:42-54)."""
    meta, blob = _read(path)
    state = serialization.from_bytes(state, blob)
    if logger:
        logger.info('resumed from {} (epoch {})'.format(path,
                                                        meta['epoch']))
    return state, int(meta['epoch'])


def _merge_dicts(current, loaded, strict, prefix='', logger=None,
                 adapt=None):
    if isinstance(current, dict):
        out = {}
        for k, v in current.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_dicts(v, loaded[k], strict,
                                      prefix + k + '/', logger, adapt)
            else:
                if strict:
                    raise KeyError(f'missing key in pretrain: {prefix}{k}')
                if logger:
                    logger.info(f'pretrain missing {prefix}{k}; kept init')
                out[k] = v
        return out
    loaded = np.asarray(loaded)
    if adapt is not None:
        loaded = adapt(current, loaded)
    if hasattr(current, 'shape') and tuple(current.shape) \
            != tuple(loaded.shape):
        if strict:
            raise ValueError(f'shape mismatch at {prefix}: '
                             f'{loaded.shape} vs {current.shape}')
        if logger:
            logger.info(f'pretrain shape mismatch at {prefix}; kept init')
        return current
    return loaded


def load_params_from_pretrain(path, state, strict=True, logger=None):
    """Weights-only load, tolerant when strict=False
    (ref: util/model_utils.py:73-84). Handles DSNorm <-> plain-BN stat
    compatibility: (1, C) running stats broadcast to (2, C) and back
    pick domain 0, mirroring the reference's suffix-stripping loader
    (model/dsnorm.py:104-176)."""
    meta, blob = _read(path)
    # decode against a dict-ified view so mismatched structures still parse
    template = {'params': serialization.to_state_dict(state.params),
                'batch_stats': serialization.to_state_dict(
                    state.batch_stats)}
    full = serialization.msgpack_restore(blob)
    loaded = {'params': full.get('params', {}),
              'batch_stats': full.get('batch_stats', {})}

    def adapt(cur, new):
        if hasattr(cur, 'shape') and cur.ndim == 2 and new.ndim == 2 \
                and cur.shape[1] == new.shape[1]:
            if cur.shape[0] == 2 and new.shape[0] == 1:
                return np.broadcast_to(new, cur.shape).copy()
            if cur.shape[0] == 1 and new.shape[0] == 2:
                return new[:1].copy()
        return new

    params = _merge_dicts(template['params'], loaded['params'], strict,
                          'params/', logger)
    stats = _merge_dicts(template['batch_stats'], loaded['batch_stats'],
                         False, 'batch_stats/', logger, adapt=adapt)
    state = state.replace(
        params=serialization.from_state_dict(state.params, params),
        batch_stats=serialization.from_state_dict(state.batch_stats, stats))
    if logger:
        logger.info('loaded pretrain {} (epoch {}, metric {:.4f})'.format(
            path, meta['epoch'], meta['metric']))
    return state


def load_metric_from_ckpt(path):
    """(ref: util/model_utils.py:57-70)"""
    meta, _ = _read(path)
    return float(meta.get('metric', 0.0)), int(meta.get('epoch', 0))


def auto_resume_path(ckpt_dir):
    """Highest-epoch train_epoch_* checkpoint (ref: tool/train.py:350-353
    parses epoch numbers from filenames; mtime would silently resume a
    copied/touched file at the wrong epoch)."""
    def epoch_of(path):
        tail = os.path.basename(path).rsplit('train_epoch_', 1)[-1]
        digits = ''.join(ch for ch in tail if ch.isdigit())
        return int(digits) if digits else -1

    cands = [c for c in glob.glob(str(ckpt_dir / 'train_epoch_*'))
             if os.path.isfile(c) and epoch_of(c) >= 0]
    if not cands:
        return None
    cands.sort(key=epoch_of)
    return cands[-1]


def rolling_delete(ckpt_dir, epoch, save_freq, keep=2):
    """(ref: tool/train.py:253-257)"""
    victim = ckpt_dir / f'train_epoch_{epoch - save_freq * keep}'
    if victim.exists() and victim.is_file():
        victim.unlink()
