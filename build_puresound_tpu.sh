#!/usr/bin/env bash
# Build + install puresound_tpu (parity: reference build_puresound.sh).
set -euo pipefail
cd "$(dirname "$0")"

make -C csrc                       # native audio decoder
python setup.py sdist              # source distribution
pip install dist/puresound_tpu-*.tar.gz
