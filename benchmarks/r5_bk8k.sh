#!/bin/bash
# Round-5 8K attention block-size sweep: decode attention at long context
# is grid-step-overhead bound (~0.6us/step x 7168 steps at b8 — see
# docs/RESULTS.md); bigger KV blocks cut the step count.  Run AFTER
# r5_followup.sh (ONE TPU process).
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
python -c "import chatglm_q_tpu" 2>/dev/null \
  || pip install -e . --no-build-isolation --no-deps -q
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
# baseline bk=512 already measured: b8 685.3 / b16 935.2 (r5_kv8k_bf16)
step bk8k_1024 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,16 --cache-len 8192 --start-len 7800 --flash --skip-prefill \
  --attn-block-k 1024
step bk8k_2048 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,16 --cache-len 8192 --start-len 7800 --flash --skip-prefill \
  --attn-block-k 2048
# short-cache guard: big blocks must not regress the 1024-cache numbers
# (clamped masked blocks get DMA'd when bk > valid length)
step bk1k_2048 2400 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,64 --cache-len 1024 --start-len 64 --flash --skip-prefill \
  --attn-block-k 2048
echo "== r5 bk sweep complete"
