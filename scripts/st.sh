#!/usr/bin/env bash
# Launch self-training (ref: scripts/train.sh adapted for tool/st.py).
#   ./scripts/st.sh cfgs/da_front3d_scannet/spconv_st.yaml --weight <ckpt>
set -e
CFG=$1
shift || true
python tools/st.py --cfg_file "$CFG" "$@"
