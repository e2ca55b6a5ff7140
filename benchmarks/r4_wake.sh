#!/bin/bash
# Post-wedge measurement list for the indexed-kernel build (round 4).
# ONE TPU process; ordered by value-per-minute.
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
# session resets drop the editable install; scripts run as files need it
python -c "import chatglm_q_tpu" 2>/dev/null \
  || pip install -e . --no-build-isolation --no-deps -q
python -c "import chatglm_q_tpu" \
  || { echo "editable install failed"; exit 1; }
timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
  || { echo "device not answering"; exit 1; }
step() {
  local name=$1 to=$2; shift 2
  [ -f "$L/r4w_$name.done" ] && { echo "== $name done"; return; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r4w_$name.out" 2>"$L/r4w_$name.err" && touch "$L/r4w_$name.done"
  echo "== $name rc=$?"
}
step bench_idx 1800 python bench.py
step smoke_idx 3600 python benchmarks/tpu_smoke.py
step fb_int8_idx 2400 python benchmarks/full_bench.py --quants int8 --batches 1,8
step fb_batches_idx 3600 python benchmarks/full_bench.py --quants int4g32 --batches 1,8,16,32 --flash
step eng_flash_idx 2400 python benchmarks/engine_bench.py --flash
step eng_paged_idx 2400 python benchmarks/engine_bench.py --engine paged --flash
echo "== wake sequence complete"
