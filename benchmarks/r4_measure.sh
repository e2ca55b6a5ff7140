#!/bin/bash
# Round-4 remaining measurement suite (sequential; ONE TPU process).
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
step() {
  local name=$1 to=$2; shift 2
  if [ -f "$L/r4_$name.done" ]; then echo "== $name done (skip)"; return 0; fi
  echo "== $name: $* ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r4_$name.out" 2>"$L/r4_$name.err"
  local rc=$?
  [ $rc -eq 0 ] && touch "$L/r4_$name.done"
  echo "== $name rc=$rc"
}

step eng_dense 2400 python benchmarks/engine_bench.py
step eng_lookahead_flash 2400 python benchmarks/engine_bench.py --flash --lookahead
step eng_long_dense 3000 python benchmarks/engine_bench.py --flash --prompt-len 448 --requests 24
step eng_long_lookahead 3000 python benchmarks/engine_bench.py --flash --prompt-len 448 --requests 24 --lookahead
step eng_paged 3000 python benchmarks/engine_bench.py --engine paged --flash --prefill-chunk 256 --prefix-cache --shared-prefix 48
step fb_batches 3600 python benchmarks/full_bench.py --quants int4g32 --batches 1,8,16,32 --flash
step fb_int8 2400 python benchmarks/full_bench.py --quants int8 --batches 1,8
step fb_int8_dyn 2400 python benchmarks/full_bench.py --quants int8 --batches 1,8 --dyn-int8
step fb_bf16 2400 python benchmarks/full_bench.py --quants none --batches 1,8
step gptq_pipeline 5400 python benchmarks/gptq_6b.py --pipeline --layers 2
step smoke_green 3600 python benchmarks/tpu_smoke.py
step sweep_m256 5400 python benchmarks/autotune_sweep.py --m 256 --all --force
step sweep_i8_m64 3600 python benchmarks/autotune_sweep.py --kernel int8 --m 64 --all
echo "== r4 suite complete $(date -u +%H:%M:%S)"
