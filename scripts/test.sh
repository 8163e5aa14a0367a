#!/usr/bin/env bash
# Launch evaluation (ref: scripts/test.sh).
#   ./scripts/test.sh cfgs/scannet/spconv.yaml --ckpt <ckpt>
set -e
CFG=$1
shift || true
python tools/test.py --cfg_file "$CFG" "$@"
