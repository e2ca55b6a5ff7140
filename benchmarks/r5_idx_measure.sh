#!/bin/bash
# Round-5 idx-cache-kernel measurement: smoke gate, then batched decode.
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
python -c "import chatglm_q_tpu" 2>/dev/null \
  || pip install -e . --no-build-isolation --no-deps -q
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
step smoke_idxkv 3600 python benchmarks/tpu_smoke.py
# batched decode with the idx cache kernels (compare r5_broof_*: 8.09 /
# 13.44 / 19.78 / 29.73 ms per step at b8/16/32/64)
step fb_idxkv 3600 python benchmarks/full_bench.py --quants int4g32 \
  --batches 1,8,16,32,64 --flash --skip-prefill
# b1 headline with donation fix + idx cache path
step bench_idxkv 1800 python bench.py
echo "== r5 idx sequence complete"
