#!/bin/bash
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
while pgrep -f "r4_final.sh" > /dev/null 2>&1; do sleep 60; done
step() {
  local name=$1 to=$2; shift 2
  [ -f "$L/r4_$name.done" ] && { echo "== $name done"; return; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r4_$name.out" 2>"$L/r4_$name.err" && touch "$L/r4_$name.done"
  echo "== $name rc=$?"
}
step eng_prefix64b 3000 python benchmarks/engine_bench.py --engine paged --flash --page-size 64 \
  --prompt-len 320 --shared-prefix 288 --requests 24 --max-seq 512 --prefix-cache
step fb_int8_flash 2400 python benchmarks/full_bench.py --quants int8 --batches 8 --flash
step fb_int8_v2 2400 python benchmarks/full_bench.py --quants int8 --batches 8 --flash --attn-v2
echo "== extra complete"
