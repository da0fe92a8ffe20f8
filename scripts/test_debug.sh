#!/usr/bin/env bash
# Counterpart of the reference's scripts/test_debug.sh: dump a rendered
# glyph dir as TSV for cross-implementation diffing (the parity tool —
# identical rows mean identical integer metrics and bitmap sizes).
set -euo pipefail
cd "$(dirname "$0")/.."
dir="${1:-/tmp/vg_noto_merge/noto_sans_regular}"
python -m versatiles_glyphs_tpu debug "$dir" -f tsv
