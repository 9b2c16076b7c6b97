#!/bin/bash
# Round-16 sequential measurement pipeline: full suite gate, then the
# v13 baseline recording (quiet-host protocol), then the scale campaign.
set -e
set -o pipefail
cd /root/repo

echo "== gate: full test suite =="
sbt -batch test 2>&1 | tail -4

echo "== v13 baseline recording =="
bash tools/record_v13.sh

echo "== r16 scale campaign =="
bash tools/r16_scale.sh
