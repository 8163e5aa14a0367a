"""Segmentation metrics: per-class intersection/union/target histograms.

Replaces the reference's ``intersectionAndUnionGPU`` (torch.histc on CPU(!)
+ NCCL allreduce, ref: util/common_utils.py:233-256) with pure bincount
ops. Under a sharded jit the sums are global automatically; callers
accumulate the returned arrays in an AverageMeter and derive
mIoU/mAcc/allAcc exactly like ref ``calc_metrics``
(util/common_utils.py:259-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def intersection_and_union(preds: jax.Array, labels: jax.Array,
                           n_classes: int, ignore_label: int = 255):
    """preds/labels (N,) int; returns (intersection, union, target) (K,).

    Ignored positions are excluded from all three, matching ref semantics
    (output[target==ignore] = ignore before histogramming)."""
    valid = labels != ignore_label
    p = jnp.where(valid, preds, n_classes)
    l = jnp.where(valid, labels, n_classes)
    inter = jnp.where(p == l, p, n_classes)
    area_inter = jnp.bincount(inter.reshape(-1), length=n_classes + 1)[:n_classes]
    area_p = jnp.bincount(p.reshape(-1), length=n_classes + 1)[:n_classes]
    area_l = jnp.bincount(l.reshape(-1), length=n_classes + 1)[:n_classes]
    return area_inter, area_p + area_l - area_inter, area_l


class AverageMeter:
    """Running value/avg/sum/count (ref: util/common_utils.py:41-56)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum = self.sum + val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def calc_metrics(intersection_sum, union_sum, target_sum):
    """(mIoU, mAcc, allAcc, iou_class, acc_class)
    (ref: util/common_utils.py:259-265)."""
    iou_class = intersection_sum / (union_sum + 1e-10)
    acc_class = intersection_sum / (target_sum + 1e-10)
    miou = float(np.mean(iou_class))
    macc = float(np.mean(acc_class))
    allacc = float(np.sum(intersection_sum) / (np.sum(target_sum) + 1e-10))
    return miou, macc, allacc, iou_class, acc_class
