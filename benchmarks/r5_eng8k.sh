#!/bin/bash
# Round-5 e2e 8K serving: the BASELINE config-5 shape through the FULL
# continuous-batching engines (admission, chunked decode, retirement),
# with the capacity-scaled decode blocks engaging by default.
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
step eng8k_dense 3600 python benchmarks/engine_bench.py --engine dense \
  --flash --requests 16 --max-batch 8 --max-seq 8192 --prompt-len 7680 \
  --new-tokens 64
step eng8k_paged 3600 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 16 --max-batch 8 --max-seq 8192 --prompt-len 7680 \
  --new-tokens 64
echo "== eng8k complete"
