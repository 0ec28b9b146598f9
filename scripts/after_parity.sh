#!/bin/bash
# Chain the round-2 TPU queue behind the parity run (one chip — TPU jobs
# must serialize; CLAUDE.md): when the parity PID exits, train the learned
# flow provider and record its EPE-vs-Farneback validation.
set -uo pipefail
cd "$(dirname "$0")/.."

PARITY_PID=${1:?usage: after_parity.sh <parity_pid>}
tail --pid="$PARITY_PID" -f /dev/null
echo "parity run (pid $PARITY_PID) exited; starting flow training"

python -m depthinspace_tpu.tools.train_flow --steps 2000 --batch_size 8 \
    --val_samples 16 --out output/flownet.msgpack 2>&1 \
    | grep -v --line-buffered WARNING
echo "flow training done"
