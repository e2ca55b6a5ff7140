#!/bin/bash
# Bisect the max_batch=32 paged-engine INTERNAL error (r5_eng_paged32,
# reproducible 2/2): pool size vs flash kernel vs compact machinery vs
# raw B=32 paged decode.  Run after r5_bk8k.sh.
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
# raw B=32 paged decode kernels (no engine machinery)
step p32_fb 2400 python benchmarks/full_bench.py --quants int4g32 \
  --batches 32 --flash --paged --skip-prefill
# bigger pool: rules out allocator tightness / garbage-page aliasing
step p32_pages96 2400 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 64 --max-batch 32 --new-tokens 128 --pages 96
# no flash: rules out the paged flash decode / pool-write kernels
step p32_noflash 2400 python benchmarks/engine_bench.py --engine paged \
  --requests 64 --max-batch 32 --new-tokens 128
# dense engine at 32: rules out the compact-paged machinery entirely
step p32_dense 2400 python benchmarks/engine_bench.py --engine dense \
  --flash --requests 64 --max-batch 32 --new-tokens 128
echo "== p32 bisect complete"
# workaround check: full-batch decode structure at max_batch 32
step p32_fullbatch 2400 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 64 --max-batch 32 --new-tokens 128 --full-batch
echo "== p32 fullbatch check complete"
