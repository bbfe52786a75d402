#!/usr/bin/env bash
# Pre-snapshot gate: the smoke tier and the f32 robustness tier must BOTH
# pass, each in its own process (the f32 tier flips jax_enable_x64 at
# conftest import, so it cannot share a process with the x64 suite).
# Usage: bash tools/check_green.sh   (from the repo root; exits nonzero
# on any failure). Round-4 lesson: the snapshot shipped a red smoke tier
# because nothing forced this to run before committing — this script is
# that forcing function (VERDICT r4 item 2c).
set -uo pipefail
cd "$(dirname "$0")/.."

rc=0

echo "=== smoke tier (pytest -m 'not slow') ==="
python -m pytest tests/ -m "not slow" -q || rc=1

echo "=== f32 robustness tier (BOOM_TPU_F32_TIER=1 pytest -m f32) ==="
BOOM_TPU_F32_TIER=1 python -m pytest tests/ -m f32 -q || rc=1

if [ "$rc" -ne 0 ]; then
  echo "check_green: FAILED" >&2
else
  echo "check_green: OK"
fi
exit $rc
