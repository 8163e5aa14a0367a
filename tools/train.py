"""Supervised / UDA-pretrain trainer CLI (ref: tool/train.py).

Same public surface: ``python tools/train.py --cfg_file cfgs/... --set
KEY VAL ...``; same output tree
output/<exp_group>/<tag>/<extra_tag>/{ckpt,tensorboard}; same log lines
and per-class IoU tables. The training loop drives one jitted train step
(voxelize + U-Net + loss + grad + optimizer + metrics fused on device)
instead of the reference's per-op host round-trips.
"""

import _init_path  # noqa: F401
import argparse
import datetime
import glob
import os
import time
from pathlib import Path

import jax
import numpy as np

from doda_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file,
                             log_config_to_file)
from doda_tpu.data import get_src_train_dataset, get_val_dataset
from doda_tpu.models import model_fn as mf
from doda_tpu.models.unet import default_brick_caps
from doda_tpu.utils import checkpoint as ckpt_utils
from doda_tpu.utils.logging import get_logger, make_writer
from doda_tpu.utils.metrics import AverageMeter, calc_metrics
from doda_tpu.utils.optim import build_optimizer, make_lr_fn


def parse_config():
    """(ref: tool/train.py:29-62)"""
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--start_epoch', type=int, default=0)
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--weight', type=str, default=None)
    parser.add_argument('--pretrain_not_strict', action='store_true')
    parser.add_argument('--launcher',
                        choices=['none', 'pytorch', 'slurm'],
                        default='none')
    parser.add_argument('--tcp_port', type=int, default=18867)
    parser.add_argument('--sync_bn', action='store_true',
                        help='accepted for CLI parity; cross-replica BN '
                             'is always on under sharded jit')
    parser.add_argument('--reserve_old_ckpt', action='store_true')
    parser.add_argument('--manual_seed', type=int, default=None)
    parser.add_argument('--ckpt_save_freq', type=int, default=1)
    parser.add_argument('--print_freq', type=int, default=5)
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    parser.add_argument('--pin_memory', action='store_true')
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def to_device(points):
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, points)


def train_epoch(args, cfg, logger, writer, train_loader, state, train_step,
                lr_fn, epoch, domain=0):
    """(ref: tool/train.py:69-158)"""
    batch_time = AverageMeter()
    data_time = AverageMeter()
    loss_meter = AverageMeter()
    inter_m, union_m, target_m = (AverageMeter() for _ in range(3))
    end = time.time()
    n_iter = len(train_loader)
    max_iter = args.epochs * n_iter
    for i, batch in enumerate(train_loader):
        data_time.update(time.time() - end)
        lr = float(lr_fn(epoch, i))
        state, metrics = train_step(state, to_device(batch.points), lr,
                                    domain)
        metrics = jax.tree.map(np.asarray, metrics)
        loss_meter.update(float(metrics['loss']), int(metrics['count']))
        inter_m.update(metrics['intersection'])
        union_m.update(metrics['union'])
        target_m.update(metrics['target'])
        accuracy = inter_m.val.sum() / (target_m.val.sum() + 1e-10)

        batch_time.update(time.time() - end)
        end = time.time()
        current_iter = epoch * n_iter + i + 1
        remain = (max_iter - current_iter) * batch_time.avg
        t_m, t_s = divmod(remain, 60)
        t_h, t_m = divmod(t_m, 60)
        remain_time = '{:02d}:{:02d}:{:02d}'.format(int(t_h), int(t_m),
                                                    int(t_s))
        if (i + 1) % args.print_freq == 0 or i == n_iter - 1:
            logger.info(
                'Epoch: [{}/{}][{}/{}] '
                'Data {:.3f} ({:.3f}) Batch {:.3f} ({:.3f}) '
                'Remain {} Loss {:.4f} Accuracy {:.4f}.'.format(
                    epoch + 1, args.epochs, i + 1, n_iter,
                    data_time.val, data_time.avg, batch_time.val,
                    batch_time.avg, remain_time, loss_meter.val, accuracy))
        writer.add_scalar('loss_train_batch', loss_meter.val, current_iter)
        writer.add_scalar('mIoU_train_batch', float(np.mean(
            metrics['intersection'] / (metrics['union'] + 1e-10))),
            current_iter)
        writer.add_scalar('allAcc_train_batch', accuracy, current_iter)
        writer.add_scalar('lr', lr, current_iter)

    miou, macc, allacc, _, _ = calc_metrics(inter_m.sum, union_m.sum,
                                            target_m.sum)
    logger.info('Train result at epoch [{}/{}]: mIoU/mAcc/allAcc '
                '{:.4f}/{:.4f}/{:.4f}.'.format(epoch + 1, args.epochs,
                                               miou, macc, allacc))
    writer.add_scalar('loss_train', loss_meter.avg, epoch + 1)
    writer.add_scalar('mIoU_train', miou, epoch + 1)
    writer.add_scalar('mAcc_train', macc, epoch + 1)
    writer.add_scalar('allAcc_train', allacc, epoch + 1)
    return state


def validate_epoch(args, cfg, logger, writer, val_loader, state, eval_step,
                   epoch, domain=0):
    """(ref: tool/train.py:161-232)"""
    logger.info('>>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>')
    loss_meter = AverageMeter()
    inter_m, union_m, target_m = (AverageMeter() for _ in range(3))
    for i, batch in enumerate(val_loader):
        out = eval_step(state.params, state.batch_stats,
                        to_device(batch.points), domain)
        out = {k: np.asarray(v) for k, v in out.items()
               if k in ('loss', 'intersection', 'union', 'target', 'count')}
        loss_meter.update(float(out['loss']), int(out['count']))
        inter_m.update(out['intersection'])
        union_m.update(out['union'])
        target_m.update(out['target'])
        if (i + 1) % args.print_freq == 0:
            acc = inter_m.val.sum() / (target_m.val.sum() + 1e-10)
            logger.info('Test: [{}/{}] Loss {:.4f} ({:.4f}) '
                        'Accuracy {:.4f}.'.format(
                            i + 1, len(val_loader), loss_meter.val,
                            loss_meter.avg, acc))
    miou, macc, allacc, iou_class, acc_class = calc_metrics(
        inter_m.sum, union_m.sum, target_m.sum)
    logger.info('Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}.'.format(
        miou, macc, allacc))
    n_classes = cfg.COMMON_CLASSES.n_classes
    class_names = cfg.COMMON_CLASSES.class_names
    for c in range(n_classes):
        logger.info('Class {} : iou/accuracy {:.4f}/{:.4f}.'.format(
            class_names[c], iou_class[c], acc_class[c]))
    logger.info('<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<')
    writer.add_scalar('loss_val', loss_meter.avg, epoch + 1)
    writer.add_scalar('mIoU_val', miou, epoch + 1)
    writer.add_scalar('mAcc_val', macc, epoch + 1)
    writer.add_scalar('allAcc_val', allacc, epoch + 1)
    return miou


def train(args, cfg, logger, writer, state, train_step, eval_step,
          train_loader, val_loader, train_sampler, lr_fn, ckpt_dir,
          best_miou=None, best_epoch=0):
    """(ref: tool/train.py:235-268)"""
    dsnorm = cfg.MODEL.get('dsnorm', False)
    best_miou = best_miou if best_miou is not None else 0.0
    for epoch in range(args.start_epoch, args.epochs):
        if train_sampler is not None:
            train_sampler.set_epoch(epoch)
        state = train_epoch(args, cfg, logger, writer, train_loader, state,
                            train_step, lr_fn, epoch,
                            domain=0 if dsnorm else 0)
        epoch_log = epoch + 1
        if epoch_log % args.ckpt_save_freq == 0:
            filename = ckpt_dir / f'train_epoch_{epoch_log}'
            logger.info('Saving checkpoint to: ' + str(filename))
            ckpt_utils.save_params(filename, state, epoch_log)
            if not args.reserve_old_ckpt:
                ckpt_utils.rolling_delete(ckpt_dir, epoch_log,
                                          args.ckpt_save_freq)
        if cfg.EVALUATION.evaluate \
                and epoch_log % cfg.EVALUATION.eval_freq == 0:
            miou_val = validate_epoch(args, cfg, logger, writer, val_loader,
                                      state, eval_step, epoch,
                                      domain=1 if dsnorm else 0)
            if miou_val > best_miou:
                best_miou = miou_val
                best_epoch = epoch_log
                filename = ckpt_dir / 'best_train'
                logger.info('Best Model Saving checkpoint to: '
                            + str(filename))
                ckpt_utils.save_params(filename, state, epoch_log,
                                       metric=best_miou)
        logger.info('Best epoch: {}, best mIoU: {}'.format(best_epoch,
                                                           best_miou))
    return state


def main():
    args, _ = parse_config()
    if args.batch_size is None:
        args.batch_size = cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    args.epochs = cfg.OPTIMIZATION.NUM_EPOCHS if args.epochs is None \
        else args.epochs
    if args.manual_seed is not None:
        np.random.seed(args.manual_seed)

    output_dir = cfg.ROOT_DIR / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG \
        / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    log_file = output_dir / ('log_train_%s.txt' % datetime.datetime.now()
                             .strftime('%Y%m%d-%H%M%S'))
    logger = get_logger(log_file=log_file, rank=cfg.LOCAL_RANK)
    logger.info('**************** Start Logging ****************')
    logger.info('JAX devices: %s' % (jax.devices(),))
    for key, val in vars(args).items():
        logger.info('{:16} {}'.format(key, val))
    log_config_to_file(cfg, logger=logger)
    if cfg.LOCAL_RANK == 0:
        os.system('cp %s %s' % (args.cfg_file, output_dir))
    writer = make_writer(output_dir / 'tensorboard', rank=cfg.LOCAL_RANK)

    # model + optimizer + steps
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    b_caps = default_brick_caps(
        cfg.DATA_CONFIG.DATA_PROCESSOR.get('brick_cap', 32768),
        model.num_levels)
    train_step, eval_step, _ = mf.make_steps(cfg, model, tx, b_caps)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(
        args.manual_seed if args.manual_seed is not None else 0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info('#classifier parameters: {}'.format(n_params))

    best_miou, best_epoch = None, 0
    if args.weight:
        state = ckpt_utils.load_params_from_pretrain(
            args.weight, state, strict=not args.pretrain_not_strict,
            logger=logger)
    if args.resume:
        state, args.start_epoch = ckpt_utils.load_params_from_ckpt(
            args.resume, state, logger=logger)
    else:
        newest = ckpt_utils.auto_resume_path(ckpt_dir)
        if newest:
            state, args.start_epoch = ckpt_utils.load_params_from_ckpt(
                newest, state, logger=logger)
    best = glob.glob(str(ckpt_dir / 'best_train'))
    if best:
        best_miou, best_epoch = ckpt_utils.load_metric_from_ckpt(best[0])

    # data
    _, train_loader, train_sampler = get_src_train_dataset(
        cfg, args, dist=False, logger=logger)
    val_loader, _ = get_val_dataset(args, cfg.DATA_CONFIG_TAR, dist=False,
                                    logger=logger)
    lr_fn = make_lr_fn(cfg.OPTIMIZATION, args.epochs, len(train_loader))

    logger.info('********* Start training %s/%s(%s) *********' % (
        cfg.EXP_GROUP_PATH, cfg.TAG, args.extra_tag))
    train(args, cfg, logger, writer, state, train_step, eval_step,
          train_loader, val_loader, train_sampler, lr_fn, ckpt_dir,
          best_miou=best_miou, best_epoch=best_epoch)


if __name__ == '__main__':
    main()
