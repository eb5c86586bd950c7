#!/usr/bin/env bash
# Create TSE manifests from Libri2Mix metadata.
# Usage: ./create_metadata.sh <libri2mix_meta_dir> <librispeech_meta_dir> <corpus_root> <out_root>
# Parity: reference egs/tse/local/create_metadata.sh
set -euo pipefail

LIBRI2MIX_META=${1:?libri2mix metadata dir}
LIBRISPEECH_META=${2:?librispeech metadata dir}
CORPUS_ROOT=${3:?corpus root}
OUT_ROOT=${4:?output root}

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"

declare -A SETS=(
  [train]="mixture_train-100_mix_clean.csv librispeech_train-100.csv"
  [dev]="mixture_dev_mix_clean.csv librispeech_dev.csv"
  [eval]="mixture_test_mix_clean.csv librispeech_test.csv"
)

for split in train dev eval; do
  read -r MIX_CSV LS_CSV <<< "${SETS[$split]}"
  python3 "$SCRIPT_DIR/parser.py" \
    "$LIBRI2MIX_META/$MIX_CSV" \
    "$OUT_ROOT/$split" \
    "$LIBRISPEECH_META/$LS_CSV" \
    "$CORPUS_ROOT"
  echo "wrote manifests: $OUT_ROOT/$split"
done
