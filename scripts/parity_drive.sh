#!/bin/bash
# Deadline-aware accuracy-parity driver (VERDICT r2 item 1).
#
# Runs the full DIS-SF -> presave -> DIS-MF -> presave -> DIS-FTSF
# pipeline like run_parity.sh, but against a wall-clock deadline: the
# MF stage runs under `timeout` sized to leave room for the presave +
# FTSF stages, and resumes from whatever per-epoch checkpoint it
# reached (the worker writes net_%04d.params every epoch —
# reference contract model/worker.py:400-402).  metrics.json is written
# incrementally per epoch, so even a truncated stage leaves its full
# metric trajectory for scripts/parity_report.py.
#
# Usage: parity_drive.sh <deadline-epoch-seconds> [SF_EPOCHS] [MF_EPOCHS] [FTSF_EPOCHS]
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE=${1:?usage: parity_drive.sh <deadline-epoch-s> [sf] [mf] [ftsf]}
SF_EPOCHS=${2:-30}
MF_EPOCHS=${3:-10}
FTSF_EPOCHS=${4:-10}

FLOW="--flow_source rigid"
# eval on a fixed 128-sample prefix of the test split every 2 epochs:
# same metric keys, deterministic subset, ~4x cheaper per point (the
# full 512-sample retest can be run afterwards with --cmd retest)
EVAL="--test_batch_size 16 --test_frequency 2 --test_samples 128"
# MF half-pass epochs (128 steps of bs=4): twice the eval points per
# wall-clock minute; documented in STATUS.md
MF_ITER="--max_train_iter 128"
FTSF_RESERVE=900          # presave-MF + FTSF floor (s)

remaining() { echo $(( DEADLINE - $(date +%s) )); }
last_epoch() {  # newest net_%04d.params under output/$1
    # keep leading zeros out of the arithmetic but map net_0000 -> 0 (a
    # greedy 'net_0*' sed eats all zeros and yields the empty string)
    ls "output/$1"/net_*.params 2>/dev/null \
        | sed 's/.*net_\([0-9]*\)\.params/\1/;s/^0*//;s/^$/0/' \
        | sort -n | tail -1
}

echo "=== parity_drive: deadline in $(remaining)s; SF=$SF_EPOCHS MF=$MF_EPOCHS FTSF=$FTSF_EPOCHS"

echo "=== stage 1: DIS-SF ($SF_EPOCHS epochs)"
SF_BUDGET=$(( $(remaining) - FTSF_RESERVE - 300 ))
# guard: timeout 0 means NO limit and negative values exit 125 — a
# too-close deadline must abort, not run unbounded
[ "$SF_BUDGET" -gt 120 ] || { echo "deadline too close (SF budget ${SF_BUDGET}s); aborting"; exit 1; }
timeout "$SF_BUDGET" \
    python train_val.py --architecture single_frame --cmd retrain \
        --epochs "$SF_EPOCHS" $FLOW $EVAL
SF_LAST=$(last_epoch single_frame)
echo "=== stage 1 done: SF last epoch $SF_LAST ($(remaining)s left)"
[ -z "$SF_LAST" ] && { echo "no SF checkpoint; aborting"; exit 1; }

# presave only the splits later stages read: train [1024:2048] + the
# 128-sample eval prefix of the test split [512:640] (--test_samples 128)
RANGES="--ranges 512:640,1024:2048"

echo "=== stage 2: presave SF disparities (epoch $SF_LAST)"
python -m depthinspace_tpu.tools.presave_disp single_frame \
    --epoch "$SF_LAST" $RANGES

MF_BUDGET=$(( $(remaining) - FTSF_RESERVE ))
if [ "$MF_BUDGET" -gt 120 ]; then
    echo "=== stage 3: DIS-MF ($MF_EPOCHS epochs, budget ${MF_BUDGET}s)"
    timeout "$MF_BUDGET" \
        python train_val.py --architecture multi_frame --cmd retrain \
            --epochs "$MF_EPOCHS" --train_batch_size 4 --mf_remat false \
            $MF_ITER $FLOW $EVAL
    MF_LAST=$(last_epoch multi_frame)
    echo "=== stage 3 done: MF last epoch ${MF_LAST:-none} ($(remaining)s left)"
else
    MF_LAST=""
fi

if [ -n "${MF_LAST:-}" ]; then
    echo "=== stage 4: presave MF disparities (epoch $MF_LAST)"
    python -m depthinspace_tpu.tools.presave_disp multi_frame \
        --epoch "$MF_LAST" --flow_source rigid $RANGES

    # archive the self-supervised SF run and reset the dir so the FTSF
    # stage (same output contract as the reference, model/worker.py:183)
    # starts with clean metrics.json / checkpoints
    rm -rf output/single_frame_selfsup
    mv output/single_frame output/single_frame_selfsup
    mkdir -p output/single_frame

    FTSF_BUDGET=$(( $(remaining) - 60 ))
    if [ "$FTSF_BUDGET" -gt 120 ]; then
        echo "=== stage 5: DIS-FTSF ($FTSF_EPOCHS epochs, budget ${FTSF_BUDGET}s)"
        timeout "$FTSF_BUDGET" \
            python train_val.py --architecture single_frame --cmd retrain \
                --use_pseudo_gt True --epochs "$FTSF_EPOCHS" $FLOW $EVAL
    fi
fi

echo "=== parity_drive finished ($(remaining)s to deadline)"
python scripts/parity_report.py || true
