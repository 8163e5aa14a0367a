"""Train/eval step factories — the jit boundary of the framework.

Equivalent of the reference's ``model_fn_decorator`` closures
(ref: model/unet.py:102-203) re-shaped for JAX: instead of a mutable
module + optimizer.step(), each step is a pure function of an explicit
``TrainState`` and a padded ``PointBatch``, jitted once and driven by the
tools layer. Voxelization, the U-Net forward, loss, backward, optimizer
update and the per-class IoU histograms all live inside one compiled
program — there is no host round-trip inside a step (the reference pays
one per op wrapper).

Parallelism: steps are written for GSPMD — shard ``PointBatch`` leaves
over the batch ("data") mesh axis and every reduction (loss mean, norm
stats, metric histograms) becomes a cross-replica collective
automatically. This subsumes DDP + SyncBN + metric allreduce
(ref: tool/train.py:107-118,330, util/common_utils.py:249-256).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax
import jax
import jax.numpy as jnp

from ..utils.metrics import intersection_and_union
from .losses import (cross_entropy, lovasz_softmax, soft_cross_entropy,
                     soft_to_hard_labels)
from .unet import SparseConvNet, build_level_plan


class PointBatch(NamedTuple):
    """Fixed-capacity padded batch; leaves shaped (B, N_cap, ...).

    coords: int32 voxel coords (xyz * voxel_scale, min-shifted to 0)
    feats:  f32 point features (xyz_middle; +rgb/xyz when configured)
    labels: int32, ``ignore_label`` at padding
    valid:  bool padding mask
    """

    coords: jax.Array
    feats: jax.Array
    labels: jax.Array
    valid: jax.Array

    @property
    def batch_size(self):
        return self.coords.shape[0]


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_model(cfg) -> SparseConvNet:
    """Model factory from the cfg schema (ref: util/model_utils.py:10-17,
    cfg keys MODEL.BACKBONE.*, cfgs/scannet/spconv.yaml)."""
    bk = cfg.MODEL.BACKBONE
    n_classes = cfg.COMMON_CLASSES.get(
        'n_classes', cfg.DATA_CONFIG.DATA_CLASS.n_classes)
    in_ch = bk.in_channel + (3 if bk.get('use_xyz', False) else 0)
    return SparseConvNet(
        in_channel=in_ch,
        mid_channel=bk.mid_channel,
        n_classes=n_classes,
        block_reps=bk.block_reps,
        block_residual=bk.block_residual,
        num_levels=bk.get('num_levels', 7),
        dsnorm=cfg.MODEL.get('dsnorm', False),
    )


def model_input(cfg, batch: PointBatch):
    feats = batch.feats
    if cfg.MODEL.BACKBONE.get('use_xyz', False):
        # ref concatenates coords_float to feats (model/unet.py:89-90);
        # our feats already carry xyz_middle as the first 3 channels, so
        # use_xyz duplicates them like the reference does.
        feats = jnp.concatenate([feats, feats[..., :3]], axis=-1)
    return jnp.where(batch.valid[..., None], feats, 0.0)


def make_criterion(cfg):
    kind = cfg.OPTIMIZATION.get('loss', 'cross_entropy')
    ignore = cfg.DATA_CONFIG.DATA_CLASS.ignore_label
    n_classes = cfg.COMMON_CLASSES.get(
        'n_classes', cfg.DATA_CONFIG.DATA_CLASS.n_classes)

    def criterion(logits, labels, weight=None):
        flat_logits = logits.reshape(-1, n_classes)
        flat_labels = labels.reshape(-1)
        w = weight.reshape(-1) if weight is not None else None
        if kind == 'lovasz':
            return lovasz_softmax(flat_logits, flat_labels, ignore)
        return cross_entropy(flat_logits, flat_labels, ignore, w)[0]

    return criterion


def make_steps(cfg, model: SparseConvNet, tx, b_caps):
    """Build jitted (train_step, eval_step).

    train_step(state, batch, lr, domain, loss_weight=None)
        -> (state, metrics dict)
    eval_step(params, batch_stats, batch, domain, thres)
        -> metrics + preds + confidence-thresholded pseudo labels
           (the thres/confidence path of ref test_model_fn,
            model/unet.py:115-152)
    """
    criterion = make_criterion(cfg)
    ignore = cfg.DATA_CONFIG.DATA_CLASS.ignore_label
    n_classes = cfg.COMMON_CLASSES.get(
        'n_classes', cfg.DATA_CONFIG.DATA_CLASS.n_classes)
    b_caps = tuple(b_caps)

    # device-side augmentation (DATA_AUG.device): scene_aug + elastic run
    # inside the jitted step on the padded batch; keys derive from
    # state.step so no per-iteration host dispatch is needed.
    from ..data.device_aug import aug_fn_for
    src_aug = aug_fn_for(cfg.DATA_CONFIG)
    tar_cfg = cfg.get('DATA_CONFIG_TAR', None)
    # ST targets flow through the mix dataset's post pipeline
    # (elastic/crop/shuffle, mix_dataset.py:27-29); soft-label batches
    # skip augmentation entirely (dataset.py::soft_item).
    tar_aug = aug_fn_for(tar_cfg, ['elastic', 'crop', 'shuffle']) \
        if tar_cfg else None
    aug_base_key = jax.random.PRNGKey(
        int(cfg.get('AUG_SEED', 0)) if hasattr(cfg, 'get') else 0)

    def forward(params, batch_stats, batch, train, domain, mutable):
        plan = build_level_plan(batch.coords, batch.valid, b_caps)
        feats = model_input(cfg, batch)
        variables = {'params': params, 'batch_stats': batch_stats}
        if train:
            logits, upd = model.apply(variables, feats, plan, train=True,
                                      domain=domain, mutable=mutable)
            return logits, upd['batch_stats']
        return model.apply(variables, feats, plan, train=False,
                           domain=domain), batch_stats

    def metrics_of(logits, batch):
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        labels = jnp.where(batch.valid, batch.labels, ignore)
        inter, union, target = intersection_and_union(
            preds, labels, n_classes, ignore)
        return preds, labels, inter, union, target

    def train_step(state: TrainState, batch: PointBatch, lr,
                   domain=0, loss_weight=None):
        if src_aug is not None:
            batch = src_aug(batch, jax.random.fold_in(aug_base_key,
                                                      state.step))

        def loss_fn(params):
            logits, new_bs = forward(params, state.batch_stats, batch,
                                     True, domain, ['batch_stats'])
            labels = jnp.where(batch.valid, batch.labels, ignore)
            loss = criterion(logits, labels, loss_weight)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_bs,
                               opt_state=opt_state, step=state.step + 1)
        _, labels, inter, union, target = metrics_of(logits, batch)
        metrics = {'loss': loss, 'intersection': inter, 'union': union,
                   'target': target,
                   'count': (labels != ignore).sum()}
        return new_state, metrics

    def eval_step(params, batch_stats, batch: PointBatch, domain=0,
                  thres=None):
        logits, _ = forward(params, batch_stats, batch, False, domain, [])
        labels = jnp.where(batch.valid, batch.labels, ignore)
        loss = criterion(logits, labels)
        preds, labels, inter, union, target = metrics_of(logits, batch)
        out = {'loss': loss, 'preds': preds, 'labels': labels,
               'output': logits, 'intersection': inter, 'union': union,
               'target': target, 'count': (labels != ignore).sum()}
        # confidence-thresholded pseudo labels (ref model/unet.py:126-133)
        softmax = jax.nn.softmax(logits, axis=-1)
        confidence = jnp.max(softmax, axis=-1)
        if thres is None:
            thres_arr = jnp.zeros((n_classes,), jnp.float32)
        else:
            thres_arr = jnp.broadcast_to(
                jnp.asarray(thres, jnp.float32), (n_classes,))
        conf_ok = confidence > thres_arr[preds]
        pseudo = jnp.where(conf_ok & batch.valid, preds, ignore)
        out['pseudo_labels'] = pseudo
        out['weight'] = jnp.where(conf_ok & batch.valid, confidence, 0.0)
        out['confidence'] = confidence
        return out

    def soft_label_loss(logits, soft_labels, valid, rng):
        """Hard/soft split target loss (the SOFT_LABEL branch the
        reference declares but never wires — ref model/unet.py:174-194;
        its helpers ``get_hard_and_soft_loss``/``soft_semantic_criterion``
        don't exist upstream, so this is the working realization).

        Rows with top-1 confidence == 1 are hard one-hot labels; the
        rest carry a distribution. Static shapes: splits are masks, not
        boolean indexing."""
        sl = cfg.get('SOFT_LABEL', None)
        flat_logits = logits.reshape(-1, n_classes)
        soft = soft_labels.reshape(-1, n_classes).astype(jnp.float32)
        has_label = (soft.sum(-1) > 0) & valid.reshape(-1)
        top1_conf = soft.max(-1)
        top1 = jnp.argmax(soft, -1).astype(jnp.int32)
        hard_mask = has_label & (top1_conf >= 1.0 - 1e-6)
        if sl.get('convert_to_hard', False):
            sampled = soft_to_hard_labels(soft, rng, ignore)
            hard_loss = cross_entropy(
                flat_logits, jnp.where(hard_mask, sampled, ignore),
                ignore)[0]
            soft_loss = cross_entropy(
                flat_logits,
                jnp.where(has_label & ~hard_mask, sampled, ignore),
                ignore)[0]
        elif sl.get('thres', {}).get('enabled', False):
            hard_loss = cross_entropy(
                flat_logits, jnp.where(hard_mask, top1, ignore), ignore)[0]
            soft_loss = soft_cross_entropy(flat_logits, soft,
                                           has_label & ~hard_mask)
        else:
            hard_loss = jnp.float32(0.0)
            soft_loss = soft_cross_entropy(flat_logits, soft, has_label)
        return hard_loss + soft_loss, hard_loss, soft_loss

    soft_enabled = bool(cfg.get('SOFT_LABEL', None)
                        and cfg.SOFT_LABEL.get('enabled', False))

    def st_step(state: TrainState, src_batch: PointBatch,
                tar_batch: PointBatch, lr, w_src, w_tar,
                tar_soft=None, rng=None):
        """Self-training step: one optimizer update from the weighted sum
        of a source-domain loss (domain 0) and a target/mixed loss
        (domain 1) — the fused equivalent of the reference's two
        backward passes + single optimizer.step()
        (ref: tool/st.py:136-198)."""
        if src_aug is not None:
            src_batch = src_aug(
                src_batch,
                jax.random.fold_in(aug_base_key, 2 * state.step))
        if tar_aug is not None and not (soft_enabled
                                        and tar_soft is not None):
            tar_batch = tar_aug(
                tar_batch,
                jax.random.fold_in(aug_base_key, 2 * state.step + 1))

        def loss_fn(params):
            logits_s, bs1 = forward(params, state.batch_stats, src_batch,
                                    True, 0, ['batch_stats'])
            labels_s = jnp.where(src_batch.valid, src_batch.labels, ignore)
            loss_s = criterion(logits_s, labels_s)
            logits_t, bs2 = forward(params, bs1, tar_batch, True, 1,
                                    ['batch_stats'])
            labels_t = jnp.where(tar_batch.valid, tar_batch.labels, ignore)
            if soft_enabled and tar_soft is not None:
                loss_t, _, _ = soft_label_loss(logits_t, tar_soft,
                                               tar_batch.valid, rng)
            else:
                loss_t = criterion(logits_t, labels_t)
            total = w_src * loss_s + w_tar * loss_t
            return total, (loss_s, loss_t, logits_s, logits_t, bs2)

        (_, (loss_s, loss_t, logits_s, logits_t, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_bs,
                               opt_state=opt_state, step=state.step + 1)
        _, labels_s, is_, us_, ts_ = metrics_of(logits_s, src_batch)
        _, labels_t, it_, ut_, tt_ = metrics_of(logits_t, tar_batch)
        metrics = {
            'loss_x': loss_s * w_src, 'loss_u': loss_t * w_tar,
            'intersection_x': is_, 'union_x': us_, 'target_x': ts_,
            'count_x': (labels_s != ignore).sum(),
            'intersection_u': it_, 'union_u': ut_, 'target_u': tt_,
            'count_u': (labels_t != ignore).sum(),
        }
        return new_state, metrics

    return jax.jit(train_step), jax.jit(eval_step), jax.jit(st_step)


def init_state(cfg, model, tx, rng_key):
    """Initialize params/stats/optimizer.

    Parameter shapes don't depend on the data, so init runs jitted on a
    tiny synthetic batch (a full-size unjitted init materializes every
    intermediate and OOMs HBM at production capacities).
    """
    tiny_caps = tuple([64] * model.num_levels)
    coords = (jnp.arange(128, dtype=jnp.int32)[:, None]
              * jnp.array([[1, 2, 3]], jnp.int32)) % 16
    tiny = PointBatch(
        coords=coords[None],
        feats=jnp.ones((1, 128, cfg.MODEL.BACKBONE.in_channel),
                       jnp.float32),
        labels=jnp.zeros((1, 128), jnp.int32),
        valid=jnp.ones((1, 128), bool))

    @jax.jit
    def _init(key):
        plan = build_level_plan(tiny.coords, tiny.valid, tiny_caps)
        feats = model_input(cfg, tiny)
        return model.init(key, feats, plan, train=False)

    variables = _init(rng_key)
    params = variables['params']
    return TrainState(params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
