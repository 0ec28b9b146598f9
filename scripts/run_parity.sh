#!/bin/bash
# Accuracy-parity experiment (VERDICT item 7): train the full DIS-SF ->
# presave -> DIS-MF -> presave -> DIS-FTSF pipeline on a reduced synthetic
# dataset and record the eval-metric trajectories (o(1) outlier parity is
# the north star, BASELINE.md).
#
# Prereq: dataset generated via
#   python -m depthinspace_tpu.tools.create_syn_data default \
#       --objects procedural --n_samples 2048 --data_dir ./dataset
#
# Usage: bash scripts/run_parity.sh [SF_EPOCHS] [MF_EPOCHS] [FTSF_EPOCHS]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_EPOCHS=${1:-30}
MF_EPOCHS=${2:-10}
FTSF_EPOCHS=${3:-10}

# flow: computed in-graph from GT disparity + poses (--flow_source rigid,
# exact on the static synthetic scenes — same math as the offline rigid
# provider, equivalence tested in tests/test_device_pipeline.py); no
# presave stage needed.
FLOW="--flow_source rigid"
# eval: big batches amortize the tunnel round trip (metrics identical)
EVAL="--test_batch_size 16 --test_frequency 2"

echo "=== stage 1: DIS-SF training ($SF_EPOCHS epochs)"
python train_val.py --architecture single_frame --cmd retrain \
    --epochs "$SF_EPOCHS" $FLOW $EVAL

echo "=== stage 2: presave SF disparities"
python -m depthinspace_tpu.tools.presave_disp single_frame \
    --epoch $((SF_EPOCHS - 1))

echo "=== stage 3: DIS-MF training ($MF_EPOCHS epochs, bs 4)"
python train_val.py --architecture multi_frame --cmd retrain \
    --epochs "$MF_EPOCHS" --train_batch_size 4 --mf_remat false $FLOW $EVAL

echo "=== stage 4: presave MF disparities (pseudo-GT)"
python -m depthinspace_tpu.tools.presave_disp multi_frame \
    --epoch $((MF_EPOCHS - 1)) --flow_source rigid

# stage 5 retrains into output/single_frame (same contract as the
# reference, model/worker.py:183) — archive the self-supervised SF run
rm -rf output/single_frame_selfsup
cp -r output/single_frame output/single_frame_selfsup

echo "=== stage 5: DIS-FTSF fine-tuning ($FTSF_EPOCHS epochs)"
python train_val.py --architecture single_frame --cmd retrain \
    --use_pseudo_gt True --epochs "$FTSF_EPOCHS" $FLOW $EVAL

echo "=== done; metric trajectories in output/*/metrics.json"
python scripts/parity_report.py
