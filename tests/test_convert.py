"""Reference-checkpoint converter: fake torch state_dict -> our tree."""

import subprocess
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip('torch')


def fake_reference_sd(mid=4, n_classes=5, levels=3, reps=2, dsnorm=False):
    """Build a state_dict with the reference's exact key names/shapes
    (ref model/unet.py:15-69, model/unet_block.py:10-100)."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    def norm(prefix, c):
        sd[prefix + '.weight'] = t(c)
        sd[prefix + '.bias'] = t(c)
        if dsnorm:
            for dom in ('source', 'target'):
                sd[f'{prefix}.running_mean_{dom}'] = t(c)
                sd[f'{prefix}.running_var_{dom}'] = abs(t(c)) + 0.5
        else:
            sd[prefix + '.running_mean'] = t(c)
            sd[prefix + '.running_var'] = abs(t(c)) + 0.5
        sd[prefix + '.num_batches_tracked'] = torch.tensor(0)

    def block(prefix, cin, cout):
        if cin != cout:
            sd[prefix + '.i_branch.0.weight'] = t(1, 1, 1, cin, cout)
        norm(prefix + '.conv_branch.0', cin)
        sd[prefix + '.conv_branch.2.weight'] = t(3, 3, 3, cin, cout)
        norm(prefix + '.conv_branch.3', cout)
        sd[prefix + '.conv_branch.5.weight'] = t(3, 3, 3, cout, cout)

    def ublock(prefix, planes):
        p = planes[0]
        for i in range(reps):
            block(f'{prefix}.blocks.block{i}', p, p)
        if len(planes) > 1:
            norm(f'{prefix}.conv.0', p)
            sd[f'{prefix}.conv.2.weight'] = t(2, 2, 2, p, planes[1])
            ublock(f'{prefix}.u', planes[1:])
            norm(f'{prefix}.deconv.0', planes[1])
            sd[f'{prefix}.deconv.2.weight'] = t(2, 2, 2, planes[1], p)
            for i in range(reps):
                block(f'{prefix}.blocks_tail.block{i}',
                      2 * p if i == 0 else p, p)

    sd['input_conv.0.weight'] = t(3, 3, 3, 3, mid)
    ublock('unet', [mid * (i + 1) for i in range(levels)])
    norm('output_layer.0', mid)
    sd['linear.weight'] = t(n_classes, mid)
    sd['linear.bias'] = t(n_classes)
    return sd


@pytest.mark.parametrize('dsnorm', [False, True])
def test_convert_roundtrip(tmp_path, dsnorm):
    sd = fake_reference_sd(dsnorm=dsnorm)
    src = tmp_path / 'ref.pth'
    torch.save({'epoch': 7, 'state_dict': sd, 'metric': 0.5,
                'commit_id': 'abc1234'}, src)

    cfg_file = tmp_path / 'cfg.yaml'
    cfg_file.write_text('''
COMMON_CLASSES: {n_classes: 5}
MODEL:
  BACKBONE: {use_xyz: False, in_channel: 3, mid_channel: 4,
             block_residual: True, block_reps: 2, num_levels: 3}
  dsnorm: %s
DATA_CONFIG:
  DATA_CLASS: {ignore_label: 255, n_classes: 5}
OPTIMIZATION: {optim: sgd, base_lr: 0.01, momentum: 0.9,
               weight_decay: 0.0001, loss: cross_entropy}
''' % dsnorm)
    dst = tmp_path / 'converted'
    out = subprocess.run(
        [sys.executable, 'tools/convert_torch_ckpt.py', '--src', str(src),
         '--dst', str(dst), '--cfg_file', str(cfg_file)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert 'unconverted' not in out.stdout, out.stdout

    # strict-load into the matching model
    from doda_tpu.config import CfgNode, cfg_from_yaml_file
    cfg = CfgNode()
    cfg_from_yaml_file(str(cfg_file), cfg)
    from doda_tpu.models import model_fn as mf
    from doda_tpu.utils import checkpoint as ck
    from doda_tpu.utils.optim import build_optimizer
    model = mf.build_model(cfg)
    tx = build_optimizer(cfg.OPTIMIZATION)
    state = mf.init_state(cfg, model, tx, jax.random.PRNGKey(1))
    loaded = ck.load_params_from_pretrain(str(dst), state, strict=True)

    # spot-check values survived the mapping
    np.testing.assert_allclose(
        np.asarray(loaded.params['input_kernel']).reshape(3, 3, 3, 3, 4),
        sd['input_conv.0.weight'].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.params['linear']['kernel']),
        sd['linear.weight'].numpy().T, rtol=1e-6)
    stats = loaded.batch_stats['unet']['block0']['MaskedBatchNorm_0']
    if dsnorm:
        np.testing.assert_allclose(
            np.asarray(stats['mean'][1]),
            sd['unet.blocks.block0.conv_branch.0.running_mean_target']
            .numpy(), rtol=1e-6)
    else:
        np.testing.assert_allclose(
            np.asarray(stats['mean'][0]),
            sd['unet.blocks.block0.conv_branch.0.running_mean'].numpy(),
            rtol=1e-6)
    assert ck.load_metric_from_ckpt(str(dst)) == (0.5, 7)
