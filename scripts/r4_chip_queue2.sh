#!/bin/bash
# Round-4 on-chip queue, phase 2: MC HLO attribution, then serve_load
# round 2 (6B engine legs, chunk A/B, pipelined-engine remeasure of the
# in-flight legs — the sync numbers are preserved under *_sync keys).
cd "$(dirname "$0")/.."
set -x
python scripts/mc_hlo_attrib.py
sleep 90
python scripts/serve_load.py
echo "QUEUE2 DONE rc=$?"
