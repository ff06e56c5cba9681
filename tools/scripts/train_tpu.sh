#!/usr/bin/env bash
# Single-host TPU training launcher (replaces dist_train.sh's
# torch.distributed.launch: one process drives all local chips via the
# GSPMD-sharded jitted step).
set -e
CFG=$1
shift
python tools/train.py --cfg_file "$CFG" "$@"
