#!/bin/bash
# Round 5: does one-chip decode agg keep scaling past b64?
# int4g32 dynamic-activation + int8 at b96/b128, idx cache kernels, flash.
set -u
cd /root/repo
python -c "import chatglm_q_tpu" 2>/dev/null || \
  pip install -e . --no-build-isolation --no-deps -q || { echo "install failed"; exit 1; }
for i in 1 2 3 4 5 6; do
  timeout 170 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" && break
  echo "probe $i failed; sleeping"; sleep 180
done
echo "=== int4g32 dyn b96/b128 decode ==="
timeout 2400 python benchmarks/full_bench.py --quants int4g32 --batches 96,128 \
  --flash --dyn-int8 --skip-prefill
echo "=== int8 b128 decode ==="
timeout 2400 python benchmarks/full_bench.py --quants int8 --batches 128 \
  --flash --skip-prefill
echo "=== done ==="
