"""Convert a reference DODA torch checkpoint into this framework's format.

Maps the reference ``SparseConvNet`` state_dict (ref model/unet.py:15-69,
model/unet_block.py; checkpoint layout util/model_utils.py:87-94) onto
the flax parameter tree:

  input_conv.0.weight (3,3,3,Ci,Co)        -> input_kernel (27,Ci,Co)
  unet.blocks.block{i}.conv_branch.{0,3}   -> unet/block{i}/MaskedBatchNorm_{0,1}
  unet.blocks.block{i}.conv_branch.{2,5}   -> unet/block{i}/kernel{1,2}
  unet.blocks.block{i}.i_branch.0.weight   -> unet/block{i}/i_kernel
  unet.conv.{0,2}                          -> unet/conv_norm + down_kernel (8,..)
  unet.u...                                -> unet/u/... (recursively)
  unet.deconv.{0,2}                        -> unet/deconv_norm + up_kernel
  unet.blocks_tail.block{i}                -> unet/tail{i}
  output_layer.0                           -> output_norm
  linear.{weight,bias}                     -> linear/{kernel^T, bias}
  DSNorm running_{mean,var}_{source,target}-> batch_stats rows (2, C)

Kernel-offset convention: spconv v1.2 weights are (k0,k1,k2,Ci,Co) with
input = output + (k - 1) per axis; our raster (dx,dy,dz) matches, so the
reshape is direct. If a converted checkpoint evaluates near-random, the
reference build used the flipped convention — pass ``--flip_kernel``.

    python tools/convert_torch_ckpt.py --src ref.pth --dst ckpt_conv \
        --cfg_file cfgs/da_front3d_scannet/spconv.yaml
"""

import _init_path  # noqa: F401
import argparse
import json
import os

import numpy as np


def to_np(t):
    return np.asarray(t.detach().cpu().numpy())


class Converter:
    def __init__(self, sd, flip):
        self.sd = {k[len('module.'):] if k.startswith('module.') else k: v
                   for k, v in sd.items()}
        self.flip = flip
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return to_np(self.sd[key])

    def has(self, key):
        return key in self.sd

    def conv(self, key, k=3):
        w = self.take(key)  # (k,k,k,Ci,Co)
        if self.flip:
            w = w[::-1, ::-1, ::-1]
        return np.ascontiguousarray(w.reshape(k ** 3, w.shape[3],
                                              w.shape[4]))

    def norm(self, prefix):
        """torch BN / DSNorm -> (params, stats) dicts."""
        params = {'scale': self.take(prefix + '.weight'),
                  'bias': self.take(prefix + '.bias')}
        if self.has(prefix + '.running_mean_source'):  # DSNorm
            mean = np.stack([self.take(prefix + '.running_mean_source'),
                             self.take(prefix + '.running_mean_target')])
            var = np.stack([self.take(prefix + '.running_var_source'),
                            self.take(prefix + '.running_var_target')])
        else:
            mean = self.take(prefix + '.running_mean')[None]
            var = self.take(prefix + '.running_var')[None]
        self.used.add(prefix + '.num_batches_tracked')
        return params, {'mean': mean, 'var': var}

    def block(self, prefix):
        """ResidualBlock (ref model/unet_block.py:10-38)."""
        params, stats = {}, {}
        if self.has(prefix + '.i_branch.0.weight'):
            w = self.take(prefix + '.i_branch.0.weight')  # (1,1,1,Ci,Co)
            params['i_kernel'] = np.ascontiguousarray(
                w.reshape(w.shape[3], w.shape[4]))
        n0p, n0s = self.norm(prefix + '.conv_branch.0')
        n1p, n1s = self.norm(prefix + '.conv_branch.3')
        params['MaskedBatchNorm_0'] = n0p
        params['MaskedBatchNorm_1'] = n1p
        stats['MaskedBatchNorm_0'] = n0s
        stats['MaskedBatchNorm_1'] = n1s
        params['kernel1'] = self.conv(prefix + '.conv_branch.2.weight')
        params['kernel2'] = self.conv(prefix + '.conv_branch.5.weight')
        return params, stats

    def ublock(self, prefix, block_reps):
        """UBlock recursion (ref model/unet_block.py:55-100)."""
        params, stats = {}, {}
        for i in range(block_reps):
            p, s = self.block(f'{prefix}.blocks.block{i}')
            params[f'block{i}'] = p
            stats[f'block{i}'] = s
        if self.has(f'{prefix}.conv.2.weight'):
            np_, ns_ = self.norm(f'{prefix}.conv.0')
            params['conv_norm'] = np_
            stats['conv_norm'] = ns_
            params['down_kernel'] = self.conv(f'{prefix}.conv.2.weight',
                                              k=2)
            up, us = self.ublock(f'{prefix}.u', block_reps)
            params['u'] = up
            stats['u'] = us
            np_, ns_ = self.norm(f'{prefix}.deconv.0')
            params['deconv_norm'] = np_
            stats['deconv_norm'] = ns_
            params['up_kernel'] = self.conv(f'{prefix}.deconv.2.weight',
                                            k=2)
            for i in range(block_reps):
                p, s = self.block(f'{prefix}.blocks_tail.block{i}')
                params[f'tail{i}'] = p
                stats[f'tail{i}'] = s
        return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', required=True, help='reference .pth file')
    ap.add_argument('--dst', required=True, help='output checkpoint path')
    ap.add_argument('--cfg_file', required=True)
    ap.add_argument('--flip_kernel', action='store_true')
    args = ap.parse_args()

    import torch
    from doda_tpu.config import cfg, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    block_reps = cfg.MODEL.BACKBONE.block_reps

    payload = torch.load(args.src, map_location='cpu', weights_only=False)
    sd = payload.get('model_state', payload.get('state_dict', payload))
    if not isinstance(sd, dict) or 'linear.weight' not in {
            k.replace('module.', '') for k in sd}:
        # newest reference format: {'epoch', 'state_dict', ...}
        for key in ('state_dict', 'model_state_dict', 'model'):
            if key in payload:
                sd = payload[key]
                break
    cv = Converter(sd, args.flip_kernel)

    params = {'input_kernel': cv.conv('input_conv.0.weight')}
    stats = {}
    up, us = cv.ublock('unet', block_reps)
    params['unet'] = up
    stats['unet'] = us
    onp, ons = cv.norm('output_layer.0')
    params['output_norm'] = onp
    stats['output_norm'] = ons
    params['linear'] = {
        'kernel': np.ascontiguousarray(cv.take('linear.weight').T),
        'bias': cv.take('linear.bias'),
    }

    unused = set(cv.sd) - cv.used
    if unused:
        print('unconverted reference keys:', sorted(unused)[:10])

    from flax import serialization
    blob = serialization.msgpack_serialize(
        {'params': params, 'batch_stats': stats})
    meta = {'epoch': int(payload.get('epoch', 0)),
            'metric': float(payload.get('metric', -1.0) or -1.0),
            'commit_id': str(payload.get('commit_id', ''))[:7]}
    header = json.dumps(meta).encode()
    with open(args.dst, 'wb') as f:
        f.write(len(header).to_bytes(8, 'little'))
        f.write(header)
        f.write(blob)
    n = sum(v.size for v in [params['input_kernel'],
                             params['linear']['kernel']])
    print(f'wrote {args.dst} ({os.path.getsize(args.dst)} bytes); '
          'load with tools/{train,st,test}.py --weight ' + args.dst)


if __name__ == '__main__':
    main()
