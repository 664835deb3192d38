#!/bin/bash
# Run a python command on the real chip, waiting out the axon claim-release
# lag (the tunnel rejects new processes for ~1-3 min after the previous one).
for i in $(seq 1 20); do
  if PYTHONPATH=/root/repo python "$@"; then
    exit 0
  fi
  echo "[tpu_run] attempt $i failed; waiting for chip claim release..." >&2
  sleep 45
done
exit 1
