#!/bin/bash
# Round-5 measurement runbook (after batch_roofline): ONE TPU process,
# ordered by value-per-minute, resumable via .done markers.
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
python -c "import chatglm_q_tpu" 2>/dev/null \
  || pip install -e . --no-build-isolation --no-deps -q
python -c "import chatglm_q_tpu" \
  || { echo "editable install failed"; exit 1; }
ok=0
for i in 1 2 3 4 5 6 7 8; do
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
# 1. headline with the donation fix — stderr must be free of
#    "donated buffers were not usable" (VERDICT #5 done-criterion)
step bench_donate 1800 python bench.py
# 2. speculative honest-win attempt: echo model, paged engine,
#    spec k=7 vs plain paged (VERDICT #7)
step spec_plain 2400 python benchmarks/engine_bench.py --engine paged \
  --echo-model --flash --requests 16 --new-tokens 128
step spec_k7 2400 python benchmarks/engine_bench.py --engine paged \
  --echo-model --flash --requests 16 --new-tokens 128 --speculative-k 7
# 2b. int8 decode re-measure: the embedding fix removes a ~0.65 ms/step
#     full-table dequant (bf16[65024,4096] confirmed in the old HLO)
step int8_embfix 2400 python benchmarks/full_bench.py --quants int8 \
  --batches 1,8 --skip-prefill
# 3. 8K-context serving (BASELINE config 5 shape): b8/b16 at 8K cache,
#    start_len 7800 (the cache actually full), flash, bf16 vs fp8 KV
step kv8k_bf16 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,16 --cache-len 8192 --start-len 7800 --flash --skip-prefill
step kv8k_fp8 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,16 --cache-len 8192 --start-len 7800 --flash --kv-dtype fp8 \
  --skip-prefill
step kv8k_paged 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8 --cache-len 8192 --start-len 7800 --flash --paged --skip-prefill
# 4. GPTQ pipeline at 6B width with the new per-layer loss lines
step gptq_losses 3600 python benchmarks/gptq_6b.py --pipeline --layers 1
echo "== r5 sequence complete"
