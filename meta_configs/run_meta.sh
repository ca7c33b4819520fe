#!/bin/bash
# Loop every meta config of a family through the CLI
# (reference meta_configs/meta_configs_MMWHS/run_meta.sh:1-14).
set -euo pipefail
FAMILY=${1:-meta_configs_MMWHS}
cd "$(dirname "$0")/.."
for cfg in meta_configs/"$FAMILY"/config_dict_id*.json; do
    echo "=== running $cfg"
    python main.py --meta_config_path "$cfg"
done
