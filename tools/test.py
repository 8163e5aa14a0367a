"""Evaluator CLI (ref: tool/test.py).

``python tools/test.py --cfg_file cfgs/... --ckpt <dir> [--save_to_file]
[--save_logit] [--eval_src]``. Reproduces the reference's per-class IoU
table, optional txt/npy result dumps, and the crop -> full-scene 1-NN
label broadcast for S3DIS (ref: model/unet.py:135-145).
"""

import _init_path  # noqa: F401
import argparse
import datetime
import os
import time
from pathlib import Path

import jax
import numpy as np

from doda_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file,
                             log_config_to_file)
from doda_tpu.data import build_dataloader
from doda_tpu.models import model_fn as mf
from doda_tpu.models.unet import default_brick_caps
from doda_tpu.ops.pointops import knn_broadcast_labels
from doda_tpu.parallel.collectives import (init_from_launcher, make_mesh,
                                           replicate, shard_batch)
from doda_tpu.utils import checkpoint as ckpt_utils
from doda_tpu.utils.logging import get_logger
from doda_tpu.utils.metrics import (AverageMeter, calc_metrics,
                                    intersection_and_union)
from doda_tpu.utils.optim import build_optimizer


def parse_config():
    """(ref: tool/test.py:27-56)"""
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--launcher', choices=['none', 'pytorch', 'slurm'],
                        default='none')
    parser.add_argument('--tcp_port', type=int, default=18867)
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--print_freq', type=int, default=5)
    parser.add_argument('--save_to_file', action='store_true')
    parser.add_argument('--save_logit', action='store_true')
    parser.add_argument('--eval_src', action='store_true',
                        help='evaluate with source-domain DSNorm stats')
    parser.add_argument('--split', type=str, default='test')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def to_device(points, mesh=None):
    import jax.numpy as jnp
    if mesh is not None and mesh.devices.size > 1:
        return shard_batch(mesh, points)
    return jax.tree.map(jnp.asarray, points)


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_one_epoch(args, cfg, logger, loader, state, eval_step, result_dir,
                   mesh=None):
    """(ref: tool/test.py:103-200)"""
    n_classes = cfg.COMMON_CLASSES.n_classes
    ignore = cfg.DATA_CONFIG_TAR.DATA_CLASS.ignore_label
    loss_meter = AverageMeter()
    inter_m, union_m, target_m = (AverageMeter() for _ in range(3))
    batch_time = AverageMeter()
    domain = 0 if args.eval_src else (
        1 if cfg.MODEL.get('dsnorm', False) else 0)
    n_total = len(loader.dataset)
    samp = getattr(loader, 'sampler', None)
    if samp is not None and samp.world_size > 1:
        # rank's shard takes global positions rank::world of the padded,
        # tiled index list; positions < n_total are first occurrences
        n_total = max(0, -(-(n_total - samp.rank) // samp.world_size))
    n_seen = 0
    end = time.time()
    for i, batch in enumerate(loader):
        if i == 0:
            loader.dataset.check_brick_capacity(
                batch, cfg.DATA_CONFIG_TAR.DATA_PROCESSOR.get(
                    'brick_cap', 32768), logger,
                num_levels=cfg.MODEL.BACKBONE.get('num_levels', 7))
        # exact-count duplicate trimming: sampler-padded scenes at the tail
        # of the last batch are masked out of metrics and skipped in dumps
        # (ref tool/test.py:138-141). In region-eval mode a scene spans
        # several rows (batch.groups); trimming counts scenes, not rows.
        groups = batch.groups
        n_scenes = len(groups) if groups is not None \
            else batch.points.valid.shape[0]
        n_real = min(n_scenes, n_total - n_seen)
        n_seen += n_scenes
        points = batch.points
        if n_real < n_scenes:
            keep_rows = ([r for g in groups[:n_real] for r in g]
                         if groups is not None else range(n_real))
            mask = np.zeros((points.valid.shape[0], 1), bool)
            mask[list(keep_rows)] = True
            points = points._replace(valid=points.valid & mask)
        out = eval_step(state.params, state.batch_stats,
                        to_device(points, mesh), domain)
        preds = np.asarray(out['preds'])
        if batch.full is not None:
            # crop/regions -> full-resolution 1-NN broadcast
            # (ref model/unet.py:135-145)
            if groups is None:
                groups = [[b] for b in range(preds.shape[0])]
            logits = np.asarray(out['output'])
            inter = np.zeros(n_classes, np.int64)
            union = np.zeros(n_classes, np.int64)
            target = np.zeros(n_classes, np.int64)
            full_preds = []
            full_logits = []
            loss_sum, count = 0.0, 0
            for b in range(min(len(groups), n_real)):
                rows = groups[b]
                crop_xyz = np.concatenate(
                    [np.asarray(batch.points.feats[r, :batch.lengths[r]])
                     for r in rows])
                crop_pred = np.concatenate(
                    [preds[r, :batch.lengths[r]] for r in rows])
                crop_logit = np.concatenate(
                    [logits[r, :batch.lengths[r]] for r in rows])
                nn_idx = knn_broadcast_labels(
                    crop_xyz, np.arange(len(crop_xyz), dtype=np.int32),
                    batch.full['xyz_middle_all'][b])
                bp = crop_pred[nn_idx]
                labels_all = batch.full['label_all'][b].astype(np.int32)
                ii, uu, tt = (np.asarray(x) for x in intersection_and_union(
                    bp, labels_all, n_classes, ignore))
                inter += ii
                union += uu
                target += tt
                full_preds.append(bp)
                full_logits.append(crop_logit[nn_idx])
                # loss on broadcast logits vs full-res labels
                # (ref model/unet.py:141-145)
                lp = _log_softmax(crop_logit.astype(np.float64))[nn_idx]
                keep = labels_all != ignore
                if keep.any():
                    loss_sum += float(
                        -lp[keep, labels_all[keep]].sum())
                    count += int(keep.sum())
            loss = loss_sum / max(count, 1)
            preds_for_save = full_preds
        else:
            inter = np.asarray(out['intersection'])
            union = np.asarray(out['union'])
            target = np.asarray(out['target'])
            loss = float(out['loss'])
            count = int(out['count'])
            preds_for_save = [preds[b, :batch.lengths[b]]
                              for b in range(min(preds.shape[0], n_real))]

        loss_meter.update(loss, max(count, 1))
        inter_m.update(inter)
        union_m.update(union)
        target_m.update(target)

        if args.save_to_file:
            os.makedirs(result_dir / 'txt', exist_ok=True)
            data_list = loader.dataset.get_data_list()
            for b, idx in enumerate(batch.ids[:n_real]):
                name = os.path.basename(str(data_list[idx])).split('.')[0]
                np.savetxt(result_dir / 'txt' / f'{name}.txt',
                           preds_for_save[b].astype(np.uint8), fmt='%d')
        if args.save_logit:
            os.makedirs(result_dir / 'logit', exist_ok=True)
            data_list = loader.dataset.get_data_list()
            for b, idx in enumerate(batch.ids[:n_real]):
                name = os.path.basename(str(data_list[idx])).split('.')[0]
                if batch.full is not None:
                    # broadcast (full-resolution) logits, like the ref's
                    # crop branch output (model/unet.py:139)
                    dump = full_logits[b]
                else:
                    dump = np.asarray(out['output'])[b, :batch.lengths[b]]
                np.save(result_dir / 'logit' / f'{name}.npy', dump)

        batch_time.update(time.time() - end)
        end = time.time()
        if (i + 1) % args.print_freq == 0:
            acc = inter_m.val.sum() / (target_m.val.sum() + 1e-10)
            logger.info('Test: [{}/{}] Batch {:.3f} ({:.3f}) '
                        'Loss {:.4f} ({:.4f}) Accuracy {:.4f}.'.format(
                            i + 1, len(loader), batch_time.val,
                            batch_time.avg, loss_meter.val, loss_meter.avg,
                            acc))

    miou, macc, allacc, iou_class, acc_class = calc_metrics(
        inter_m.sum, union_m.sum, target_m.sum)
    logger.info('Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}.'.format(
        miou, macc, allacc))
    for c in range(n_classes):
        logger.info('Class {} : iou/accuracy {:.4f}/{:.4f}.'.format(
            cfg.COMMON_CLASSES.class_names[c], iou_class[c], acc_class[c]))
    return miou


def main():
    args, _ = parse_config()
    if args.batch_size is None:
        args.batch_size = cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    init_from_launcher(args.launcher, args.tcp_port)
    mesh = make_mesh()
    args.batch_size = args.batch_size * mesh.devices.size
    world_size, rank = jax.process_count(), jax.process_index()
    output_dir = cfg.ROOT_DIR / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG \
        / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    log_file = eval_dir / ('log_test_%s.txt' % datetime.datetime.now()
                           .strftime('%Y%m%d-%H%M%S'))
    logger = get_logger(log_file=log_file, rank=cfg.LOCAL_RANK)
    logger.info('**************** Start Evaluation ****************')
    for key, val in vars(args).items():
        logger.info('{:16} {}'.format(key, val))
    log_config_to_file(cfg, logger=logger)

    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    b_caps = default_brick_caps(
        cfg.DATA_CONFIG_TAR.DATA_PROCESSOR.get('brick_cap', 32768),
        model.num_levels)
    _, eval_step, _ = mf.make_steps(cfg, model, tx, b_caps)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    if args.ckpt:
        state = ckpt_utils.load_params_from_pretrain(args.ckpt, state,
                                                     strict=True,
                                                     logger=logger)
    if mesh.devices.size > 1:
        state = replicate(mesh, state)
    _, loader, _ = build_dataloader(
        cfg.DATA_CONFIG_TAR, args.batch_size, dist=world_size > 1,
        workers=args.workers, logger=logger, split=args.split,
        training=False, world_size=world_size, rank=rank)
    test_one_epoch(args, cfg, logger, loader, state, eval_step, eval_dir,
                   mesh=mesh)


if __name__ == '__main__':
    main()
