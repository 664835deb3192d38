#!/bin/bash
# Fetch the released FrozenBiLM checkpoints (reference download/download_checkpoints.sh
# uses gshell; standard tooling here) then convert them to the native format.
# Usage: download/download_checkpoints.sh <MODEL_DIR>
set -euo pipefail
MODEL_DIR=${1:?usage: download_checkpoints.sh <MODEL_DIR>}
mkdir -p "$MODEL_DIR"

# Google Drive folder from the reference README; requires gdown or gshell.
FOLDER_URL="https://drive.google.com/drive/folders/1-0oHsPtLC7ga2TXedDziCe8kHcHnmX1h"

if command -v gdown >/dev/null; then
  gdown --folder "$FOLDER_URL" -O "$MODEL_DIR"
elif command -v gshell >/dev/null; then
  gshell --with-id "$FOLDER_URL" --directory "$MODEL_DIR"
else
  echo "install gdown or gshell to fetch from Google Drive" >&2
  exit 1
fi

# one-time torch -> native conversion (runtime never needs torch)
for pth in "$MODEL_DIR"/*.pth; do
  python scripts/convert.py checkpoint --pth "$pth" \
    --model_name deberta-v2-xlarge --out "${pth%.pth}_native" || true
done
