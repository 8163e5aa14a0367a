"""Converted-checkpoint SEMANTIC fidelity vs a dense torch oracle.

test_convert.py proves the key mapping round-trips; this file proves the
*numbers* survive — a reference-architecture state_dict is converted,
loaded, and forwarded on a hand-built scene, and the logits must match a
from-first-principles dense implementation of spconv v1.2 semantics
built on torch.nn.functional (cross-correlation conv3d, masked to
active sites — submanifold conv equals dense conv on a zero-padded
grid with the output re-masked, because inactive inputs are zero):

  SubMConv3d(k3)          -> conv3d(x, w, padding=1) * mask
  SparseConv3d(k2 s2)     -> conv3d(x, w, stride=2) * maxpool(mask)
  SparseInverseConv3d(k2) -> conv_transpose3d(x, w, stride=2) * mask
  BN (eval)               -> pointwise affine from running stats
                             (eps 1e-4, ref model/unet.py:28), re-masked
  DSNorm (eval)           -> same affine from the running_{mean,var}_
                             {source,target} pair picked by domain
                             (ref model/dsnorm.py:63-84)
  UBlock skip             -> cat((identity, decoder_out), channel)
                             (ref model/unet_block.py:96)

A transposed linear, flipped kernel raster, or wrong octant parity in
tools/convert_torch_ckpt.py shifts every logit and fails the 1e-3
comparison; the converter's round-trip test cannot see such bugs
(the mapping would still round-trip). Ref ckpt layout:
util/model_utils.py:87-94; forward semantics model/unet.py:15-69.

Cases (round 5 widened the surface per the round-4 review):
  small           2-level / reps 1 / plain BN (the original fixture)
  flagship_shape  3-level / reps 2 / DSNorm ckpt -> DSNorm model,
                  target domain — flagship-shaped: tail blocks at 2p->p,
                  a 2x-channel stride chain (4->8->12), both DSNorm stat
                  rows exercised
  plain_to_dsnorm plain-BN ckpt loaded into a DSNorm model (stats
                  broadcast to both domains; ref dsnorm.py:138-141)
  dsnorm_to_plain DSNorm ckpt loaded into a plain-BN model (source row
                  wins; ref dsnorm.py:104-176)
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from test_convert import fake_reference_sd  # noqa: E402

MID, CLASSES = 4, 3
GRID = 8   # voxels per axis -> 2x2x2 bricks at level 0


def _cfg_yaml(tmp_path, levels, reps, dsnorm):
    p = tmp_path / 'cfg.yaml'
    p.write_text('''
COMMON_CLASSES: {n_classes: %d}
MODEL:
  BACKBONE: {use_xyz: False, in_channel: 3, mid_channel: %d,
             block_residual: True, block_reps: %d, num_levels: %d}
  dsnorm: %s
DATA_CONFIG:
  DATA_CLASS: {ignore_label: 255, n_classes: %d}
OPTIMIZATION: {optim: sgd, base_lr: 0.01, momentum: 0.9,
               weight_decay: 0.0001, loss: cross_entropy}
''' % (CLASSES, MID, reps, levels, dsnorm, CLASSES))
    return p


class DenseRef:
    """Dense-grid forward of the reference network (eval mode).

    ``suffix``: running-stat key suffix — '' for plain BN, '_source' /
    '_target' for the DSNorm row the forward should read.
    """

    def __init__(self, sd, reps, suffix=''):
        self.sd = {k: v.to(torch.float64) if v.is_floating_point() else v
                   for k, v in sd.items()}
        self.reps = reps
        self.suffix = suffix

    def conv(self, x, key, stride=1, pad=0):
        w = self.sd[key]                       # (k,k,k,Ci,Co)
        wt = w.permute(4, 3, 0, 1, 2)          # torch layout (Co,Ci,k,k,k)
        return F.conv3d(x, wt, stride=stride, padding=pad)

    def up(self, x, key):
        w = self.sd[key]                       # (2,2,2,Cp,Cc)
        wt = w.permute(3, 4, 0, 1, 2)          # (Cp,Cc,2,2,2)
        return F.conv_transpose3d(x, wt, stride=2)

    def bn_relu(self, x, prefix, mask):
        w, b = self.sd[prefix + '.weight'], self.sd[prefix + '.bias']
        m = self.sd[prefix + '.running_mean' + self.suffix]
        v = self.sd[prefix + '.running_var' + self.suffix]
        sh = (1, -1, 1, 1, 1)
        y = (x - m.view(sh)) * torch.rsqrt(v.view(sh) + 1e-4)
        y = y * w.view(sh) + b.view(sh)
        return torch.relu(y) * mask

    def block(self, x, prefix, mask):
        if f'{prefix}.i_branch.0.weight' in self.sd:   # 1x1x1 shortcut
            identity = self.conv(x, f'{prefix}.i_branch.0.weight') * mask
        else:
            identity = x
        h = self.bn_relu(x, f'{prefix}.conv_branch.0', mask)
        h = self.conv(h, f'{prefix}.conv_branch.2.weight', pad=1) * mask
        h = self.bn_relu(h, f'{prefix}.conv_branch.3', mask)
        h = self.conv(h, f'{prefix}.conv_branch.5.weight', pad=1) * mask
        return h + identity

    def ublock(self, x, prefix, mask):
        for i in range(self.reps):
            x = self.block(x, f'{prefix}.blocks.block{i}', mask)
        if f'{prefix}.conv.2.weight' not in self.sd:
            return x
        identity = x
        h = self.bn_relu(x, f'{prefix}.conv.0', mask)
        mask_p = F.max_pool3d(mask, 2)
        h = self.conv(h, f'{prefix}.conv.2.weight', stride=2) * mask_p
        h = self.ublock(h, f'{prefix}.u', mask_p)
        h = self.bn_relu(h, f'{prefix}.deconv.0', mask_p)
        h = self.up(h, f'{prefix}.deconv.2.weight') * mask
        x = torch.cat((identity, h), dim=1)   # ref unet_block.py:96
        for i in range(self.reps):
            x = self.block(x, f'{prefix}.blocks_tail.block{i}', mask)
        return x

    def forward(self, x, mask):
        h = self.conv(x, 'input_conv.0.weight', pad=1) * mask
        h = self.ublock(h, 'unet', mask)
        h = self.bn_relu(h, 'output_layer.0', mask)
        w, b = self.sd['linear.weight'], self.sd['linear.bias']
        # (1, C, D, H, W) -> (D, H, W, classes)
        h = h[0].permute(1, 2, 3, 0)
        return h @ w.T + b


CASES = {
    # levels, reps, sd_dsnorm, model_dsnorm, domain, stat suffix
    'small': (2, 1, False, False, 0, ''),
    'flagship_shape': (3, 2, True, True, 1, '_target'),
    'plain_to_dsnorm': (2, 1, False, True, 1, ''),
    'dsnorm_to_plain': (2, 1, True, False, 0, '_source'),
}


@pytest.mark.parametrize('case', sorted(CASES))
def test_converted_forward_matches_dense_reference(tmp_path, case):
    levels, reps, sd_dsnorm, model_dsnorm, domain, suffix = CASES[case]
    sd = fake_reference_sd(mid=MID, n_classes=CLASSES, levels=levels,
                           reps=reps, dsnorm=sd_dsnorm)
    # tame depth-compounding magnitudes so f32-vs-f64 comparison is tight
    for k, v in sd.items():
        if v.is_floating_point() and 'running' not in k:
            sd[k] = v * 0.3
    src = tmp_path / 'ref.pth'
    torch.save({'epoch': 1, 'state_dict': sd, 'metric': 0.0,
                'commit_id': 'fixture'}, src)
    cfg_file = _cfg_yaml(tmp_path, levels, reps, model_dsnorm)
    dst = tmp_path / 'converted'
    out = subprocess.run(
        [sys.executable, 'tools/convert_torch_ckpt.py', '--src', str(src),
         '--dst', str(dst), '--cfg_file', str(cfg_file)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr

    # hand-built scene: one point per active voxel, scattered surface
    rng = np.random.default_rng(3)
    all_coords = np.stack(np.meshgrid(*([np.arange(GRID)] * 3),
                                      indexing='ij'), -1).reshape(-1, 3)
    sel = rng.permutation(len(all_coords))[:60]
    coords = all_coords[sel].astype(np.int32)
    feats = rng.normal(size=(len(coords), 3)).astype(np.float32)

    # dense torch oracle
    x = torch.zeros((1, 3, GRID, GRID, GRID), dtype=torch.float64)
    mask = torch.zeros((1, 1, GRID, GRID, GRID), dtype=torch.float64)
    for (cx, cy, cz), f in zip(coords, feats):
        x[0, :, cx, cy, cz] = torch.tensor(f, dtype=torch.float64)
        mask[0, 0, cx, cy, cz] = 1.0
    want = DenseRef(sd, reps, suffix).forward(x, mask).numpy()

    # our forward through the converted checkpoint, f32 engine
    from doda_tpu.config import CfgNode, cfg_from_yaml_file
    cfg = CfgNode()
    cfg_from_yaml_file(str(cfg_file), cfg)
    from doda_tpu.models import model_fn as mf
    from doda_tpu.models.unet import SparseConvNet, build_level_plan
    from doda_tpu.utils import checkpoint as ck
    from doda_tpu.utils.optim import build_optimizer
    model = SparseConvNet(in_channel=3, mid_channel=MID,
                          n_classes=CLASSES, block_reps=reps,
                          block_residual=True, num_levels=levels,
                          dsnorm=model_dsnorm, dtype=jnp.float32)
    tx = build_optimizer(cfg.OPTIMIZATION)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(0))
    state = ck.load_params_from_pretrain(str(dst), state, strict=True)

    b_caps = (64,) + (32,) * (levels - 1)
    plan = build_level_plan(jnp.asarray(coords[None]),
                            jnp.ones((1, len(coords)), bool), b_caps)
    logits = model.apply({'params': state.params,
                          'batch_stats': state.batch_stats},
                         jnp.asarray(feats[None]), plan, train=False,
                         domain=domain)
    got = np.asarray(logits[0])                    # (N, classes)
    want_pts = want[coords[:, 0], coords[:, 1], coords[:, 2]]
    np.testing.assert_allclose(got, want_pts, rtol=2e-3, atol=2e-3)
