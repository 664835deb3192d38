#!/bin/bash
# Copy the round-3 on-chip suite artifacts from /tmp into docs/measurements/.
# Refuses obviously-wrong artifacts (CPU-stamped files, missing files).
set -e
cd "$(dirname "$0")/.."
DEST=docs/measurements

copy() { # src dst
  if [ -f "$1" ]; then cp "$1" "$DEST/$2"; echo "harvested $2"; else echo "MISSING $1"; fi
}

# require a TPU device_kind stamp (unstamped files are stale CPU smokes
# from before the stamping change)
copy_tpu_stamped() { # src dst
  if [ ! -f "$1" ]; then echo "MISSING $1"; return; fi
  if grep -qi '"device_kind": *"[^"]*TPU' "$1"; then
    cp "$1" "$DEST/$2"; echo "harvested $2"
  else
    echo "REFUSING $2: no TPU device_kind stamp"
  fi
}

copy /tmp/bench_r3_post.json      bench_r3_post.json
copy_tpu_stamped /tmp/int8_xprof_r3.json  int8_xprof_r3.json
copy /tmp/rel_ab_long_r3.json     rel_select_ab_long_r3.json
copy_tpu_stamped /tmp/train_xprof_r3.json train_xprof_r3.json
copy /tmp/mc_bucket_ab.json       mc_bucket_ab_r3.json

if [ -f /tmp/serve_load_r3.json ]; then
  if grep -q '"small": true' /tmp/serve_load_r3.json; then
    echo "REFUSING serve_load_r3.json: small-mode (CPU smoke) stamp"
  elif ! grep -qi '"device_kind": *"[^"]*TPU' /tmp/serve_load_r3.json; then
    echo "REFUSING serve_load_r3.json: no TPU device_kind stamp"
  else
    cp /tmp/serve_load_r3.json "$DEST/serve_load_r3.json"
    echo "harvested serve_load_r3.json"
  fi
fi
