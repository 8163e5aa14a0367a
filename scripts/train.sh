#!/usr/bin/env bash
# Launch training (ref: scripts/train.sh — torch.distributed.launch with
# N procs/GPUs; here one process drives all local TPU chips via jit
# sharding, so no launcher wrapper is needed).
#   ./scripts/train.sh cfgs/scannet/spconv.yaml [extra args...]
set -e
CFG=$1
shift || true
python tools/train.py --cfg_file "$CFG" "$@"
