#!/bin/bash
# Fetch the preprocessed dataset annotations + CLIP features (reference
# download/download_data.sh), then pack feature dicts into the native
# memory-mapped store.
# Usage: download/download_data.sh <DATA_DIR>
set -euo pipefail
DATA_DIR=${1:?usage: download_data.sh <DATA_DIR>}
mkdir -p "$DATA_DIR"

FOLDER_URL="https://drive.google.com/drive/folders/1cEbxhrwbl0membbZpANnaSkFaprbyzTO"

if command -v gdown >/dev/null; then
  gdown --folder "$FOLDER_URL" -O "$DATA_DIR"
elif command -v gshell >/dev/null; then
  gshell --with-id "$FOLDER_URL" --directory "$DATA_DIR"
else
  echo "install gdown or gshell to fetch from Google Drive" >&2
  exit 1
fi

# pack every clipvitl14.pth into the packed store next to it
find "$DATA_DIR" -name "clipvitl14*.pth" | while read -r pth; do
  python scripts/convert.py features --pth "$pth" --out "${pth%.pth}" || true
done
