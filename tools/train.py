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
from doda_tpu.parallel.collectives import (init_from_launcher, make_mesh,
                                           replicate, shard_batch)
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
    parser.add_argument('--profile', type=int, default=0,
                        help='capture a jax.profiler trace of the first N '
                             'train steps into <output_dir>/profile')
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def to_device(points, mesh=None):
    """Host batch -> device(s). With a >1-device mesh the batch dim is
    sharded over the ``data`` axis, making every jitted step a GSPMD
    program (the DDP equivalent of ref tool/train.py:360-362)."""
    import jax.numpy as jnp
    if mesh is not None and mesh.devices.size > 1:
        return shard_batch(mesh, points)
    return jax.tree.map(jnp.asarray, points)


def mask_padded_scenes(points, n_real):
    """Exact-count duplicate trimming for sharded/padded eval batches:
    scenes at positions >= n_real are sampler padding (duplicates of
    already-scored scenes); blank their masks so metrics count every
    dataset sample exactly once (ref tool/test.py:138-141,
    tool/train.py:183-186)."""
    if n_real >= points.valid.shape[0]:
        return points
    mask = (np.arange(points.valid.shape[0]) < n_real)[:, None]
    return points._replace(valid=points.valid & mask)


def train_epoch(args, cfg, logger, writer, train_loader, state, train_step,
                lr_fn, epoch, domain=0, mesh=None, profile_dir=None):
    """(ref: tool/train.py:69-158)"""
    batch_time = AverageMeter()
    data_time = AverageMeter()
    loss_meter = AverageMeter()
    inter_m, union_m, target_m = (AverageMeter() for _ in range(3))
    end = time.time()
    n_iter = len(train_loader)
    max_iter = args.epochs * n_iter
    n_dev = mesh.devices.size if mesh is not None else 1
    scene_meter = AverageMeter()
    for i, batch in enumerate(train_loader):
        data_time.update(time.time() - end)
        lr = float(lr_fn(epoch, i))
        if epoch == args.start_epoch and i == 0:
            train_loader.dataset.check_brick_capacity(
                batch, cfg.DATA_CONFIG.DATA_PROCESSOR.get(
                    'brick_cap', 32768), logger,
                num_levels=cfg.MODEL.BACKBONE.get('num_levels', 7))
        if profile_dir and epoch == args.start_epoch and i == 0:
            jax.profiler.start_trace(str(profile_dir))
        state, metrics = train_step(state, to_device(batch.points, mesh),
                                    lr, domain)
        metrics = jax.tree.map(np.asarray, metrics)
        if profile_dir and epoch == args.start_epoch \
                and i + 1 == min(args.profile, n_iter):
            jax.profiler.stop_trace()
            logger.info('profiler trace written to %s' % profile_dir)
        loss_meter.update(float(metrics['loss']), int(metrics['count']))
        inter_m.update(metrics['intersection'])
        union_m.update(metrics['union'])
        target_m.update(metrics['target'])
        accuracy = inter_m.val.sum() / (target_m.val.sum() + 1e-10)

        batch_time.update(time.time() - end)
        scene_meter.update(
            batch.points.valid.shape[0] / max(batch_time.val, 1e-9) / n_dev)
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
                'Remain {} Loss {:.4f} Accuracy {:.4f} '
                'Scenes/sec/chip {:.2f} ({:.2f}).'.format(
                    epoch + 1, args.epochs, i + 1, n_iter,
                    data_time.val, data_time.avg, batch_time.val,
                    batch_time.avg, remain_time, loss_meter.val, accuracy,
                    scene_meter.val, scene_meter.avg))
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
                   epoch, domain=0, mesh=None):
    """(ref: tool/train.py:161-232)"""
    logger.info('>>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>')
    loss_meter = AverageMeter()
    inter_m, union_m, target_m = (AverageMeter() for _ in range(3))
    n_total = len(val_loader.dataset)
    samp = getattr(val_loader, 'sampler', None)
    if samp is not None and samp.world_size > 1:
        # this rank's share of unique (non-padded) samples
        n_total = max(0, -(-(n_total - samp.rank) // samp.world_size))
    n_seen = 0
    for i, batch in enumerate(val_loader):
        points = mask_padded_scenes(batch.points, n_total - n_seen)
        n_seen += points.valid.shape[0]
        out = eval_step(state.params, state.batch_stats,
                        to_device(points, mesh), domain)
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
          best_miou=None, best_epoch=0, mesh=None, profile_dir=None):
    """(ref: tool/train.py:235-268)"""
    dsnorm = cfg.MODEL.get('dsnorm', False)
    best_miou = best_miou if best_miou is not None else 0.0
    for epoch in range(args.start_epoch, args.epochs):
        if train_sampler is not None:
            train_sampler.set_epoch(epoch)
        state = train_epoch(args, cfg, logger, writer, train_loader, state,
                            train_step, lr_fn, epoch, domain=0,
                            mesh=mesh, profile_dir=profile_dir)
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
                                      domain=1 if dsnorm else 0, mesh=mesh)
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

    # Data parallelism: one process drives all local devices; the per-step
    # batch is batch_size (per device, like the reference's
    # BATCH_SIZE_PER_GPU) x local devices, sharded over the mesh. Multiple
    # hosts join the process group via --launcher env rendezvous and shard
    # the dataset via world_size/rank (ref DDP launch,
    # util/common_utils.py:86-126).
    init_from_launcher(args.launcher, args.tcp_port)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    args.batch_size = args.batch_size * n_dev
    world_size, rank = jax.process_count(), jax.process_index()

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
    if args.pin_memory:
        logger.warning('--pin_memory has no effect: host->device copies '
                       'stage through the JAX runtime, not a pinned-memory '
                       'torch dataloader (accepted for CLI parity)')
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
    dist = world_size > 1
    _, train_loader, train_sampler = get_src_train_dataset(
        cfg, args, dist=dist, logger=logger, world_size=world_size,
        rank=rank)
    val_loader, _ = get_val_dataset(args, cfg.DATA_CONFIG_TAR, dist=dist,
                                    logger=logger, world_size=world_size,
                                    rank=rank)
    lr_fn = make_lr_fn(cfg.OPTIMIZATION, args.epochs, len(train_loader))

    if n_dev > 1:
        state = replicate(mesh, state)
    profile_dir = None
    if args.profile:
        profile_dir = output_dir / 'profile'
        profile_dir.mkdir(parents=True, exist_ok=True)

    logger.info('********* Start training %s/%s(%s) *********' % (
        cfg.EXP_GROUP_PATH, cfg.TAG, args.extra_tag))
    train(args, cfg, logger, writer, state, train_step, eval_step,
          train_loader, val_loader, train_sampler, lr_fn, ckpt_dir,
          best_miou=best_miou, best_epoch=best_epoch, mesh=mesh,
          profile_dir=profile_dir)


if __name__ == '__main__':
    main()
