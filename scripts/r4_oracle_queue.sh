#!/bin/bash
# Round-4 oracle queue: wait for the fast_l4096 oracle legs (started first,
# both workers), then run the concat_small qc/layered legs.  Everything is
# chunk-journaled, so a killed queue resumes with the same command.
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi
nice -n 10 python scripts/ber_parity.py oracle --preset fast_l4096 \
  --trials 300 --workers 2 >> results/ber_parity_l4096_oracle_r4.log 2>&1
nice -n 10 python scripts/ber_parity.py oracle --preset concat_small \
  --trials 5000 --workers 2 > results/ber_parity_concat_oracle_r4.log 2>&1
echo "oracle queue done: $(date)" >> results/ber_parity_concat_oracle_r4.log
