"""Every shipped experiment config parses, resolves its base configs and
class mappers, and builds the model (parity: the reference ships the same
cfgs/ tree; see cfgs/*/spconv*.yaml)."""

import glob

import pytest

from doda_tpu.config import CfgNode, cfg_from_yaml_file
from doda_tpu.data.class_mapper import get_mapper
from doda_tpu.models import model_fn as mf
from doda_tpu.utils.optim import build_optimizer, make_lr_fn

EXPERIMENT_CFGS = sorted(
    p for p in glob.glob('cfgs/*/*.yaml') if 'dataset_cfgs' not in p)


def test_config_tree_matches_reference_inventory():
    names = {p.replace('cfgs/', '') for p in EXPERIMENT_CFGS}
    for exp in ('da_front3d_scannet', 'da_front3d_s3dis',
                'da_s3dis_scannet', 'da_scannet_s3dis'):
        assert f'{exp}/spconv.yaml' in names
        assert f'{exp}/spconv_st.yaml' in names
    for exp in ('scannet', 's3dis', 'front3d'):
        assert f'{exp}/spconv.yaml' in names


@pytest.mark.parametrize('path', EXPERIMENT_CFGS)
def test_experiment_config_builds(path):
    cfg = CfgNode()
    cfg_from_yaml_file(path, cfg)
    assert cfg.COMMON_CLASSES.n_classes == len(
        cfg.COMMON_CLASSES.class_names)
    for key in ('DATA_CONFIG', 'DATA_CONFIG_TAR'):
        dc = cfg.get(key, None)
        if dc is None:
            continue
        assert dc.DATA_PROCESSOR.voxel_scale > 0  # base cfg merged in
        mapper_file = dc.get('CLASS_MAPPER_FILE', None)
        if mapper_file:
            mapper, common = get_mapper(mapper_file)
            assert mapper is not None and len(common) > 0
    model = mf.build_model(cfg)
    assert model.num_levels >= 2
    tx = build_optimizer(cfg.OPTIMIZATION)
    lr_fn = make_lr_fn(cfg.OPTIMIZATION, cfg.OPTIMIZATION.NUM_EPOCHS, 10)
    assert float(lr_fn(0, 0)) > 0 and tx is not None
