#!/bin/bash
# Run a python command on the real chip, waiting out the axon claim-release
# lag (minutes) or outage (round 2 saw multi-hour ones). Attempts and sleep
# are overridable: TPU_RUN_ATTEMPTS (default 20), TPU_RUN_SLEEP (default 45s).
#
# PYTHONPATH must EXTEND the inherited value, never replace it: the remote-TPU
# backend registers via /root/.axon_site/sitecustomize.py, found only through
# the env PYTHONPATH. Clobbering it makes every run fail client-side with
# "Backend 'axon' is not in the list of known backends: ['cpu', 'tpu']"
# (the 'tpu' there is the stock libtpu factory, which has no local chip) —
# indistinguishable from a chip outage from the error text alone.
ATTEMPTS="${TPU_RUN_ATTEMPTS:-20}"
SLEEP="${TPU_RUN_SLEEP:-45}"
for i in $(seq 1 "$ATTEMPTS"); do
  if PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}" python "$@"; then
    exit 0
  fi
  echo "[tpu_run] attempt $i/$ATTEMPTS failed; waiting for chip claim release..." >&2
  sleep "$SLEEP"
done
exit 1
