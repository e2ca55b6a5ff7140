#!/bin/bash
# Confirm the capacity-scaled block engages by DEFAULT at 8K (no
# --attn-block-k flag), then bisect the paged-32 fault.
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
pip install -e . --no-build-isolation --no-deps -q
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
step kv8k_default 2400 python benchmarks/full_bench.py --quants int4g32 \
  --batches 8,16 --cache-len 8192 --start-len 7800 --flash --skip-prefill
echo "== default8k complete"
bash benchmarks/r5_p32_bisect.sh
