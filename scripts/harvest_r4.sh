#!/bin/bash
# Copy the round-4 on-chip suite artifacts from /tmp into docs/measurements/.
# Refuses CPU-stamped/small-mode files where a TPU stamp is expected.
set -e
cd "$(dirname "$0")/.."
DEST=docs/measurements

copy() { # src dst
  if [ -f "$1" ]; then cp "$1" "$DEST/$2"; echo "harvested $2"; else echo "MISSING $1"; fi
}

copy_tpu_stamped() { # src dst
  if [ ! -f "$1" ]; then echo "MISSING $1"; return; fi
  if grep -q '"small": true' "$1"; then
    echo "REFUSING $2: small-mode (CPU smoke) stamp"; return
  fi
  if grep -qi '"device_kind": *"[^"]*TPU' "$1"; then
    cp "$1" "$DEST/$2"; echo "harvested $2"
  else
    echo "REFUSING $2: no TPU device_kind stamp"
  fi
}

copy_tpu_stamped /tmp/train_xprof_r3.json  train_xprof_r4.json
copy_tpu_stamped /tmp/mc_bucket_ab.json    mc_bucket_ab_r4.json
copy_tpu_stamped /tmp/mc_profile.json      mc_profile_r4.json
copy            /tmp/rel_ab_long_r3.json   rel_select_ab_long_r4.json
copy_tpu_stamped /tmp/serve_load_r3.json   serve_load_r4.json
copy_tpu_stamped /tmp/train_knee_r4.json   train_knee_r4.json
copy_tpu_stamped /tmp/grad_nan_probe2.json grad_nan_probe2_r4.json
copy_tpu_stamped /tmp/train_fix_proof.json train_fix_proof_r4.json
copy_tpu_stamped /tmp/mc_hlo_attrib.json   mc_hlo_attrib_r4.json
copy_tpu_stamped /tmp/bench_r4_stdout.json bench_r4_stdout.json
