#!/bin/bash
# Experiment driver (reference: run.sh).
# Runs the full pipeline for one or more configuration files:
#   download/format -> augment -> preprocess -> partition -> train -> evaluate
#
# Usage:
#   ./run.sh                       # default configuration
#   ./run.sh configs/fargan.py     # one experiment
#   ./run.sh configs/ablations/*.py

set -e

configs=("$@")
if [ ${#configs[@]} -eq 0 ]; then
    configs=(configs/promonet.py)
fi

# Data setup (config-independent)
python -m promonet_tpu.data.download
python -m promonet_tpu.data.augment
python -m promonet_tpu.data.preprocess
python -m promonet_tpu.partition

for config in "${configs[@]}"; do
    echo "=== ${config} ==="
    python -m promonet_tpu.train --config "${config}"
    python -m promonet_tpu.evaluate --config "${config}"
done
