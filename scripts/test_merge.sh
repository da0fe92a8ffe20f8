#!/usr/bin/env bash
# Counterpart of the reference's scripts/test_merge.sh
# (/root/reference/scripts/test_merge.sh): time a merge of the Noto
# Sans *Regular set. Extra args pass through (e.g. --renderer exact,
# --transport f32).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${VG_OUT:-/tmp/vg_noto_merge}"
time python -m versatiles_glyphs_tpu merge \
  "/root/reference/testdata/Noto Sans/"*Regular.ttf -o "$out" "$@"
