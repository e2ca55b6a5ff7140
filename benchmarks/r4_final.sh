#!/bin/bash
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
while pgrep -f "r4_paged.sh" > /dev/null 2>&1; do sleep 60; done
step() {
  local name=$1 to=$2; shift 2
  [ -f "$L/r4_$name.done" ] && { echo "== $name done"; return; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r4_$name.out" 2>"$L/r4_$name.err" && touch "$L/r4_$name.done"
  echo "== $name rc=$?"
}
step gptq_pipeline2 7200 python benchmarks/gptq_6b.py --pipeline --layers 2
step bench_final 1800 python bench.py
step profile 1800 python benchmarks/profile_decode.py --steps 16
echo "== final complete"
