#!/bin/bash
# Round-4 on-chip queue: run the remaining measurement jobs sequentially
# (one chip, one claim at a time; 90s gaps for axon claim release).
# Logs to /tmp/r4_queue.log; artifacts land in /tmp then harvest_r4.sh.
cd "$(dirname "$0")/.."
set -x
python scripts/serve_load.py
sleep 90
python scripts/train_knee.py
sleep 90
FROZENBILM_BENCH_ATTEMPTS=6 python bench.py > /tmp/bench_r4_stdout.json
echo "QUEUE DONE rc=$?"
