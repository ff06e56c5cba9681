#!/usr/bin/env bash
# Evaluation launcher (replaces dist_test.sh / slurm_test_*.sh).
set -e
CFG=$1
shift
python tools/test.py --cfg_file "$CFG" "$@"
