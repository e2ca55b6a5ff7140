#!/bin/bash
# Round-5 follow-up measurements (after r5_measure.sh): b1 idx A/B and
# engine throughput with the idx cache kernels.  ONE TPU process,
# resumable via .done markers.
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
python -c "import chatglm_q_tpu" 2>/dev/null \
  || pip install -e . --no-build-isolation --no-deps -q
python -c "import chatglm_q_tpu" \
  || { echo "editable install failed"; exit 1; }
ok=0
for i in 1 2 3 4 5 6; do
  timeout 170 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
    && { ok=1; break; }
  echo "probe $i failed; retrying in 180s"
  sleep 180
done
[ "$ok" = 1 ] || { echo "device not answering"; exit 1; }
step() {
  local name=$1 to=$2; shift 2
  [ -f "$L/r5_$name.done" ] && { echo "== $name done"; return; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r5_$name.out" 2>"$L/r5_$name.err" \
    && touch "$L/r5_$name.done"
  echo "== $name rc=$?"
}
# 1. does the idx cache path cost batch-1 anything? (headline guard:
#    r4 145.2 vs r5 139.8-142.1 readings — same process, back to back)
step b1ab 2400 python benchmarks/full_bench.py --quants int4g32 \
  --batches 1 --flash --skip-prefill
step b1ab_noidx 2400 python benchmarks/full_bench.py --quants int4g32 \
  --batches 1 --flash --no-idx-cache --skip-prefill
# 2. continuous-batching engines with the idx kernels (r4: dense 874,
#    paged 776-930 agg tok/s)
step eng_dense 3600 python benchmarks/engine_bench.py --engine dense \
  --flash --requests 32 --max-batch 16 --new-tokens 128
step eng_paged 3600 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 32 --max-batch 16 --new-tokens 128
# 3. bigger admission width — the idx kernels make b32 pay
step eng_paged32 3600 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 64 --max-batch 32 --new-tokens 128
echo "== r5 followup complete"
