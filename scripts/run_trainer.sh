#!/bin/bash
# TPU-host training launcher — the counterpart of the reference's SLURM
# run_trainer.sh (/root/reference/run_trainer.sh: 1 GPU / 4 CPU / 16 GB /
# 7 days, jq config rewrite, wandb offline). On a TPU VM there is no
# scheduler wrapper: the process owns every local chip through one
# jax.distributed runtime; multihost slices launch this same script on
# each worker (GKE/gcloud `--worker=all`).
#
# Usage: scripts/run_trainer.sh CONFIG.json RUN_NAME [extra CLI args...]

set -euo pipefail

CONFIG=${1:?usage: run_trainer.sh CONFIG.json RUN_NAME [args...]}
RUN_NAME=${2:?usage: run_trainer.sh CONFIG.json RUN_NAME [args...]}
shift 2

export WANDB_MODE=${WANDB_MODE:-offline}

WORKDIR=$(dirname "$CONFIG")
RUN_CONFIG="$WORKDIR/${RUN_NAME}_config.json"

# Rewrite run name + checkpoint path into a per-run config (the reference
# does this with jq; python3 is always present on TPU VMs).
python3 - "$CONFIG" "$RUN_CONFIG" "$RUN_NAME" <<'EOF'
import json, sys
src, dst, name = sys.argv[1:4]
cfg = json.load(open(src))
cfg.setdefault("wandb", {})["wandb_name"] = name
ckpt_dir = f"ckpt_{name}"
cfg["model"]["checkpoint_path"] = f"{ckpt_dir}/best_model.ckpt"
json.dump(cfg, open(dst, "w"), indent=4)
EOF

mkdir -p "$WORKDIR/ckpt_${RUN_NAME}"
exec python3 -m dquartic_tpu.cli train "$RUN_CONFIG" "$@"
