#!/bin/sh
# Round-boundary full sweeps (VERDICT r1 item 8): the three sweep tiers
# that default CI subsets, run in full. Takes ~1h on the 1-CPU box; run
# once per round and record the pass counts + date in STATUS.md.
#
#   sh tools/run_full_sweeps.sh [logdir]
set -x
LOGDIR=${1:-/tmp}
cd "$(dirname "$0")/.."
PARITY_FULL=1 python -m pytest tests/test_torch_parity.py -q \
    > "$LOGDIR/sweep_parity.log" 2>&1
tail -1 "$LOGDIR/sweep_parity.log"
PARAM_FULL=1 python -m pytest tests/test_param_counts.py -q \
    > "$LOGDIR/sweep_param.log" 2>&1
tail -1 "$LOGDIR/sweep_param.log"
GRAD_FULL=1 python -m pytest tests/test_grad_smoke.py -q \
    > "$LOGDIR/sweep_grad.log" 2>&1
tail -1 "$LOGDIR/sweep_grad.log"
