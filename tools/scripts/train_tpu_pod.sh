#!/usr/bin/env bash
# Multi-host TPU pod launcher (replaces slurm_train.sh): run this on every
# host of the pod; jax.distributed.initialize picks up the TPU pod topology
# automatically and each process drives its local chips.
set -e
CFG=$1
shift
JAX_COORDINATOR_AUTO=1 python tools/train.py --cfg_file "$CFG" "$@"
