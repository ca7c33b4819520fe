#!/usr/bin/env bash
# Sweep every MRXCAT meta config through the training CLI, one log per config.
# TPU equivalent of the reference launcher (meta_configs_MRXCAT/run_meta.sh):
# device selection is the axon plugin's job, so no CUDA_VISIBLE_DEVICES here.
set -u
here=$(cd "$(dirname "$0")" && pwd)
repo=$(cd "$here/../.." && pwd)
export PYTHONPATH="$repo:${PYTHONPATH:-}"

for cfg in "$here"/config_dict_id*.json; do
    log="$here/$(basename "$cfg" .json).log"
    echo "meta sweep: $cfg -> $log"
    python "$repo/main.py" --meta_config_path "$cfg" "$@" >> "$log" 2>&1
done
