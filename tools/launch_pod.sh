#!/bin/bash
# Launch rware_tpu training across every host of a TPU pod slice.
#
# One process per host (the TPU-native process model — see
# rware_tpu/distributed.py): JAX derives coordinator/process topology from
# the TPU metadata server on Cloud TPU VMs, so each host runs the SAME
# command and `jax.distributed.initialize()` (train.py --distributed) wires
# the process group; the env batch then shards over every chip in the slice
# via --mesh (rware_tpu/parallel/sharding.make_mesh spans all devices).
#
# Usage, from any machine with gcloud access to the pod:
#
#   tools/launch_pod.sh TPU_NAME ZONE [train.py args...]
#
# e.g.
#   tools/launch_pod.sh my-v5e-64 us-west4-1 \
#       --collect pallas --n-envs 262144 --updates 1000 \
#       --checkpoint-dir gs://bucket/run1
#
# Per-host batch assembly: train.py shards n_envs over all chips
# (shard_env_batch); each host initialises only its local slice, so host
# memory stays flat as the slice grows.  Gradients are pmean'd over the env
# axis inside the jitted train step (collectives ride ICI).  Failure
# recovery: add --checkpoint-dir (+--resume) — any host failure restarts
# from the latest anchor via run_with_recovery semantics.
#
# This script is the thin transport layer only; it is exercised in CI by
# tests/test_distributed.py and the 8-device virtual-mesh dryrun
# (__graft_entry__.dryrun_multichip) — real pod hardware is not available
# in the build container (BASELINE.md "Multi-chip").
set -euo pipefail

TPU_NAME=${1:?usage: launch_pod.sh TPU_NAME ZONE [train args...]}
ZONE=${2:?usage: launch_pod.sh TPU_NAME ZONE [train args...]}
shift 2

REPO_DIR=${REPO_DIR:-$(cd "$(dirname "$0")/.." && pwd)}

# Same command on every worker; JAX's TPU bootstrap assigns process ids.
exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" --worker=all \
  --command "cd $REPO_DIR && python train.py --distributed --mesh --collect pallas $*"
