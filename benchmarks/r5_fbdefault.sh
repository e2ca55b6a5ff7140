#!/bin/bash
# Validate the new tunneled-backend default (paged engine → full-batch
# decode): the round-5 paged/spec configs must run clean and comparably.
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
step fbdef_paged 2400 python benchmarks/engine_bench.py --engine paged \
  --flash --requests 32 --max-batch 16 --new-tokens 128
step fbdef_spec 2400 python benchmarks/engine_bench.py --engine paged \
  --echo-model --flash --requests 16 --max-batch 16 --new-tokens 128 \
  --speculative-k 7
echo "== fbdefault validation complete"
