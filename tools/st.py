"""Self-training trainer CLI — the full DODA loop (ref: tool/st.py).

Per epoch: (once) generate pseudo labels for the target train set with
per-class confidence thresholds, then alternate source batches (domain 0)
and TACM-mixed target batches (domain 1) through one fused jitted step,
updating the tail-cuboid queue from each mixed batch. Checkpoints, eval,
split-sampler persistence and the done.txt / class_ratio.txt artifacts
match the reference's output tree.
"""

import _init_path  # noqa: F401
import argparse
import datetime
import glob
import os
import shutil
import time
from pathlib import Path

import jax
import numpy as np

from doda_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file,
                             log_config_to_file)
from doda_tpu.data import get_dataset
from doda_tpu.data.loader import DataReader
from doda_tpu.models import model_fn as mf
from doda_tpu.models.unet import default_brick_caps
from doda_tpu.parallel.collectives import (all_gather_objects,
                                           init_from_launcher, make_mesh,
                                           replicate)
from doda_tpu.utils import checkpoint as ckpt_utils
from doda_tpu.utils import pseudo_labels as pl_utils
from doda_tpu.utils.logging import get_logger, make_writer
from doda_tpu.utils.metrics import AverageMeter, calc_metrics
from doda_tpu.utils.optim import build_optimizer, make_lr_fn

from train import to_device, validate_epoch  # shared helpers


def parse_config():
    """(ref: tool/st.py:29-76)"""
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
    parser.add_argument('--launcher', choices=['none', 'pytorch', 'slurm'],
                        default='none')
    parser.add_argument('--tcp_port', type=int, default=18867)
    parser.add_argument('--sync_bn', action='store_true')
    parser.add_argument('--reserve_old_ckpt', action='store_true')
    parser.add_argument('--preserve_pseudo_labels', action='store_true')
    parser.add_argument('--manual_seed', type=int, default=None)
    parser.add_argument('--ckpt_save_freq', type=int, default=1)
    parser.add_argument('--print_freq', type=int, default=5)
    parser.add_argument('--local_rank', type=int, default=0)
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


def set_pseudo_labels(args, cfg, logger, tar_data, tar_loader, state,
                      eval_step, pseudo_labels_dir, mesh=None):
    """Generate + install pseudo labels
    (ref: util/pseudo_labels_util.py:157-176 set_pseudo_labels).

    Pass 1 (only for ratio thresholds): accumulate per-class confidence
    histograms; pass 2: write thresholded labels per scene. Both passes
    run full-resolution, no-aug (ref :49-55)."""
    n_classes = cfg.COMMON_CLASSES.n_classes
    soft_enabled = bool(cfg.get('SOFT_LABEL', None)
                        and cfg.SOFT_LABEL.get('enabled', False))
    generated = False
    # need_soft: a store from a pre-SOFT_LABEL run (done.txt but no
    # soft/ dir) must regenerate, or __getitem__ raises mid-epoch
    if not pl_utils.generation_done(pseudo_labels_dir,
                                    need_soft=soft_enabled):
        os.makedirs(pseudo_labels_dir, exist_ok=True)
        tar_data.set_training_mode(False)
        ds = tar_data.get_downsampling_scale()
        if cfg.DATA_CONFIG_TAR.DATA_PROCESSOR.get('no_downsample_infer',
                                                  False):
            tar_data.set_downsampling_scale(1)

        def sweep(fn):
            for batch in tar_loader:
                out = eval_step(state.params, state.batch_stats,
                                to_device(batch.points, mesh), 1)
                fn(batch, out)

        def collect_hist():
            logger.info('*********** Get Pseudo Label Confidence ***********')
            hist = np.zeros((n_classes, pl_utils.N_BINS), np.int64)

            def acc(batch, out):
                pl_utils.accumulate_confidence_histogram(
                    out['preds'], out['confidence'], batch.points.valid,
                    n_classes, hist)
            sweep(acc)
            return hist

        thres = pl_utils.get_perclass_thres(cfg, collect_hist)
        logger.info('per class thres: {} '.format(thres))

        logger.info('*********** Generating Pseudo Labels ***********')
        class_ratio = np.zeros(n_classes, np.float64)
        data_list = tar_data.get_data_list()
        thres_arr = np.asarray(thres, np.float32)

        def write(batch, out):
            preds = np.asarray(out['preds'])
            conf = np.asarray(out['confidence'])
            valid = np.asarray(batch.points.valid)
            pseudo = np.where(conf > thres_arr[preds], preds, 255)
            softmax = None
            if soft_enabled:
                logits = np.asarray(out['output'], np.float32)
                e = np.exp(logits - logits.max(-1, keepdims=True))
                softmax = e / e.sum(-1, keepdims=True)
            for b, idx in enumerate(batch.ids):
                n = batch.lengths[b]
                name = os.path.basename(str(data_list[idx])).split('.')[0]
                pl_utils.save_scene_labels(pseudo_labels_dir, name,
                                           pseudo[b, :n])
                if soft_enabled:
                    pl_utils.save_scene_soft_labels(
                        pseudo_labels_dir, name, softmax[b, :n],
                        pseudo[b, :n] != 255)
                lab = pseudo[b, :n][valid[b, :n]]
                class_ratio[:] += np.bincount(
                    lab[lab != 255], minlength=n_classes)[:n_classes] / 1e3

        sweep(write)
        class_ratio /= class_ratio.sum() + 1e-9
        pl_utils.save_class_ratio(pseudo_labels_dir, class_ratio)
        pl_utils.mark_done(pseudo_labels_dir)
        tar_data.set_downsampling_scale(ds)
        tar_data.set_training_mode(True)
        generated = True
    tar_data.set_pseudo_labels_dir(pseudo_labels_dir)
    return generated


def update_split_sampler(split_sampler, extras, num_c, update_ratio):
    """Queue + EMA ratio updates from one mixed batch
    (ref: tool/st.py:82-97).

    With >1 process the per-class tail cuboids and ratio sums are
    host-gathered across ranks first (ref all_gather_object,
    tool/st.py:86-89) so every rank's queue sees every rank's
    harvested cuboids — otherwise the queues diverge per host."""
    tail_splits = extras.get('tar_tail_splits', [])
    per_class = [[x for item in tail_splits[i::num_c] for x in item]
                 for i in range(num_c)]
    ratios = extras.get('tar_splits_class_ratio', [])
    ratio_sum = np.sum(ratios, axis=0) if len(ratios) else None
    if jax.process_count() > 1:
        gathered = all_gather_objects((per_class, ratio_sum))
        per_class = [sum((g[0][c] for g in gathered), [])
                     for c in range(num_c)]
        sums = [g[1] for g in gathered if g[1] is not None]
        ratio_sum = np.sum(sums, axis=0) if sums else None
    split_sampler.update(per_class)
    if update_ratio and ratio_sum is not None:
        split_sampler.update_class_ratio(ratio_sum)


def train_epoch(args, cfg, logger, writer, source_reader, tar_loader,
                split_sampler, state, st_step, lr_fn, epoch, mesh=None):
    """(ref: tool/st.py:100-271)"""
    meters = {k: AverageMeter() for k in
              ('batch', 'data', 'loss', 'loss_x', 'loss_u')}
    ms = {k: AverageMeter() for k in
          ('ix', 'ux', 'tx', 'iu', 'uu', 'tu')}
    w_src = cfg.SELF_TRAIN.SRC.get('loss_weight', 1.0)
    w_tar = cfg.SELF_TRAIN.TAR.get('loss_weight', 1.0)
    cq_cfg = cfg.DATA_CONFIG_TAR.DATA_AUG.tacm.cuboid_queue
    n_iter = len(tar_loader)
    max_iter = args.epochs * n_iter
    end = time.time()
    for i, batch in enumerate(tar_loader):
        if (i + 1) == n_iter:  # manually drop last (ref :121-122)
            continue
        if epoch == 0 and i == 0:
            tar_loader.dataset.check_brick_capacity(
                batch, cfg.DATA_CONFIG_TAR.DATA_PROCESSOR.get(
                    'brick_cap', 32768), logger,
                num_levels=cfg.MODEL.BACKBONE.get('num_levels', 7))
        meters['data'].update(time.time() - end)
        source_batch = source_reader.read_data()
        lr = float(lr_fn(epoch, i))
        soft = batch.extras.get('soft_labels')
        soft_kw = {}
        if soft is not None:
            import jax.numpy as jnp
            soft_kw = dict(tar_soft=jnp.asarray(soft),
                           rng=jax.random.fold_in(
                               jax.random.PRNGKey(args.manual_seed or 0),
                               epoch * n_iter + i))
        state, m = st_step(state, to_device(source_batch.points, mesh),
                           to_device(batch.points, mesh), lr, w_src, w_tar,
                           **soft_kw)
        m = jax.tree.map(np.asarray, m)
        # weight meters by total point count like the reference
        # (labels.size(0), tool/st.py:155,182) — valid counts can be 0
        # when a mixed batch is all-ignore early in self-training
        meters['loss_x'].update(float(m['loss_x']),
                                max(int(m['count_x']), 1))
        meters['loss_u'].update(float(m['loss_u']),
                                max(int(m['count_u']), 1))
        meters['loss'].update(float(m['loss_x'] + m['loss_u']),
                              max(int(m['count_u']), 1))
        for k, mk in (('ix', 'intersection_x'), ('ux', 'union_x'),
                      ('tx', 'target_x'), ('iu', 'intersection_u'),
                      ('uu', 'union_u'), ('tu', 'target_u')):
            ms[k].update(m[mk])
        acc_x = ms['ix'].val.sum() / (ms['tx'].val.sum() + 1e-10)
        acc_u = ms['iu'].val.sum() / (ms['tu'].val.sum() + 1e-10)

        if cq_cfg.enabled and split_sampler is not None \
                and split_sampler.initialized:
            update_split_sampler(split_sampler, batch.extras,
                                 cq_cfg.num_class,
                                 cq_cfg.get('update_class_ratio', False))

        meters['batch'].update(time.time() - end)
        end = time.time()
        current_iter = epoch * n_iter + i + 1
        remain = (max_iter - current_iter) * meters['batch'].avg
        t_m, t_s = divmod(remain, 60)
        t_h, t_m = divmod(t_m, 60)
        # last processed iteration is n_iter - 2 (final batch is dropped)
        if (i + 1) % args.print_freq == 0 or i == n_iter - 2:
            logger.info(
                'Epoch: [{}/{}][{}/{}] Data {:.3f} ({:.3f}) '
                'Batch {:.3f} ({:.3f}) Remain {:02d}:{:02d}:{:02d} '
                'Loss {:.4f} Loss_x {:.4f} Loss_u {:.4f} '
                'SrcAccuracy {:.4f} TarAccuracy {:.4f}. '.format(
                    epoch + 1, args.epochs, i + 1, n_iter,
                    meters['data'].val, meters['data'].avg,
                    meters['batch'].val, meters['batch'].avg,
                    int(t_h), int(t_m), int(t_s), meters['loss'].val,
                    meters['loss_x'].val, meters['loss_u'].val,
                    acc_x, acc_u))
        writer.add_scalar('loss_x_train_batch', meters['loss_x'].val,
                          current_iter)
        writer.add_scalar('loss_u_train_batch', meters['loss_u'].val,
                          current_iter)
        writer.add_scalar('loss_train_batch', meters['loss'].val,
                          current_iter)
        writer.add_scalar('allAcc_x_train_batch', acc_x, current_iter)
        writer.add_scalar('allAcc_u_train_batch', acc_u, current_iter)
        writer.add_scalar('lr', lr, current_iter)

    miou_x, macc_x, allacc_x, _, _ = calc_metrics(
        ms['ix'].sum, ms['ux'].sum, ms['tx'].sum)
    miou_u, macc_u, allacc_u, _, _ = calc_metrics(
        ms['iu'].sum, ms['uu'].sum, ms['tu'].sum)
    logger.info('Train result at epoch [{}/{}]: Src mIoU/mAcc/allAcc '
                '{:.4f}/{:.4f}/{:.4f}, Tar mIoU/mAcc/allAcc '
                '{:.4f}/{:.4f}/{:.4f}.'.format(
                    epoch + 1, args.epochs, miou_x, macc_x, allacc_x,
                    miou_u, macc_u, allacc_u))
    writer.add_scalar('loss_train', meters['loss'].avg, epoch + 1)
    writer.add_scalar('mIoU_train', miou_u, epoch + 1)
    return state


def main():
    args, _ = parse_config()
    if args.batch_size is None:
        args.batch_size = cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    args.epochs = cfg.OPTIMIZATION.NUM_EPOCHS if args.epochs is None \
        else args.epochs
    if args.manual_seed is not None:
        np.random.seed(args.manual_seed)

    # data-parallel mesh over all local devices (see tools/train.py);
    # multi-host ranks join via --launcher env rendezvous first
    init_from_launcher(args.launcher, args.tcp_port)
    mesh = make_mesh()
    args.batch_size = args.batch_size * mesh.devices.size
    world_size, rank = jax.process_count(), jax.process_index()

    output_dir = cfg.ROOT_DIR / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG \
        / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    pseudo_labels_dir = output_dir / 'pseudo_labels'
    for d in (output_dir, ckpt_dir):
        d.mkdir(parents=True, exist_ok=True)

    log_file = output_dir / ('log_st_%s.txt' % datetime.datetime.now()
                             .strftime('%Y%m%d-%H%M%S'))
    logger = get_logger(log_file=log_file, rank=cfg.LOCAL_RANK)
    logger.info('**************** Start Logging ****************')
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

    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    b_caps = default_brick_caps(
        cfg.DATA_CONFIG_TAR.DATA_PROCESSOR.get('brick_cap', 32768),
        model.num_levels)
    train_step, eval_step, st_step = mf.make_steps(cfg, model, tx, b_caps)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(
        args.manual_seed if args.manual_seed is not None else 0))
    logger.info('#classifier parameters: {}'.format(
        sum(x.size for x in jax.tree.leaves(state.params))))

    best_miou, best_epoch = 0.0, 0
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

    if mesh.devices.size > 1:
        state = replicate(mesh, state)
    (src_loader, src_sampler, tar_data, tar_loader, tar_sampler,
     val_loader, _) = get_dataset(cfg, args, dist=world_size > 1,
                                  logger=logger, world_size=world_size,
                                  rank=rank)
    source_reader = DataReader(src_loader, src_sampler)
    split_sampler = getattr(tar_data, 'split_sampler', None)
    sampler_path = output_dir / 'split_sampler.pkl'
    if split_sampler is not None and sampler_path.exists():
        split_sampler.load(sampler_path)  # (ref: tool/st.py:518-522)
        logger.info('resumed split sampler from %s' % sampler_path)
    lr_fn = make_lr_fn(cfg.OPTIMIZATION, args.epochs, len(tar_loader))

    logger.info('********* Start self-training %s/%s(%s) *********' % (
        cfg.EXP_GROUP_PATH, cfg.TAG, args.extra_tag))

    # initial eval (ref: tool/st.py:349)
    miou = validate_epoch(args, cfg, logger, writer, val_loader, state,
                          eval_step, args.start_epoch - 1,
                          domain=1 if cfg.MODEL.get('dsnorm', False) else 0,
                          mesh=mesh)
    logger.info('Initial val mIoU: {:.4f}'.format(miou))

    tacm_cfg = cfg.DATA_CONFIG_TAR.DATA_AUG.tacm
    if cfg.get('SOFT_LABEL', None) and cfg.SOFT_LABEL.get('enabled', False):
        if tacm_cfg.get('enabled', False):
            # soft rows cannot survive cuboid mixing; the reference's
            # SOFT_LABEL branch (model/unet.py:174-194) has no data path
            # at all, so this combination was never defined upstream
            logger.warning('SOFT_LABEL.enabled requires tacm.enabled=False;'
                           ' ignoring soft labels for mixed batches')
        else:
            tar_data.set_soft_labels(True)
            logger.info('SOFT_LABEL mode: target batches carry soft '
                        'distributions from the pseudo-label store')
    for epoch in range(args.start_epoch, args.epochs):
        # pseudo labels (first epoch or resumed via done.txt sentinel)
        generated = set_pseudo_labels(args, cfg, logger, tar_data,
                                      tar_loader, state, eval_step,
                                      pseudo_labels_dir, mesh=mesh)
        if split_sampler is not None and not split_sampler.initialized:
            class_ratio = pl_utils.load_class_ratio(pseudo_labels_dir)
            split_sampler.init_class_ratio({'class_ratio': class_ratio})
            split_sampler.update_cfg(tacm_cfg.cuboid_queue)
            logger.info('split sampler initialized; tail classes: %s'
                        % (tacm_cfg.cuboid_queue['tail_class_idx'],))

        if tar_sampler is not None:
            tar_sampler.set_epoch(epoch)
        source_reader.set_cur_epoch(epoch)
        state = train_epoch(args, cfg, logger, writer, source_reader,
                            tar_loader, split_sampler, state, st_step,
                            lr_fn, epoch, mesh=mesh)
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
            miou = validate_epoch(
                args, cfg, logger, writer, val_loader, state, eval_step,
                epoch, domain=1 if cfg.MODEL.get('dsnorm', False) else 0,
                mesh=mesh)
            if miou > best_miou:
                best_miou, best_epoch = miou, epoch_log
                ckpt_utils.save_params(ckpt_dir / 'best_train', state,
                                       epoch_log, metric=best_miou)
        logger.info('Best epoch: {}, best mIoU: {}'.format(best_epoch,
                                                           best_miou))
        if split_sampler is not None:
            split_sampler.save(sampler_path)  # (ref: tool/st.py:396-398)

    if not args.preserve_pseudo_labels and pseudo_labels_dir.exists():
        shutil.rmtree(pseudo_labels_dir)  # (ref: tool/st.py:403-405)


if __name__ == '__main__':
    main()
