#!/bin/bash
# Round-2 TPU measurement sequence (docs/STATUS.md runbook).
# ONE TPU process at a time; every step logs to benchmarks/logs/.
# Steps are ordered by value-per-minute so a re-wedge loses the least.
# Resume: already-completed steps are skipped via their .done markers.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
L=benchmarks/logs

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "$L/$name.done" ]; then echo "== $name: done (skip)"; return 0; fi
  echo "== $name: $* (timeout ${to}s)"
  timeout "$to" "$@" >"$L/$name.out" 2>"$L/$name.err"
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$L/$name.done"; echo "== $name OK"; tail -5 "$L/$name.out"
  else echo "== $name FAILED rc=$rc"; tail -5 "$L/$name.err"; fi
  return $rc
}

# 0a. chipless AOT compile-validation of every measurement program via the
# LOCAL libtpu (catches Mosaic-fatal bugs before burning device time; the
# cache entries it writes do NOT hit plain runs — see aot_precompile.py).
# Never touches the TPU.  For fast on-device compiles prefer client-side
# compile mode: prefix steps with PALLAS_AXON_REMOTE_COMPILE=0 once
# tpu_smoke validates it.
step aot_precompile 1800 python benchmarks/aot_precompile.py --sweep --full

# 0b. health probe (fast fail if the device is still wedged)
timeout 110 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
  || { echo "TPU not responding — aborting"; exit 1; }

# 1. scheme shootout (small kernels, highest information first)
step microbench 2400 python benchmarks/kernel_microbench.py \
  int4 int4_grouped int4_bt_grouped int4_noscale int8 int8_bt

# 2. per-shape autotune of the production kernels (resumable internally)
step sweep_m8 5400 python benchmarks/autotune_sweep.py --m 8 --budget 12
step sweep_int8_m8 2400 python benchmarks/autotune_sweep.py --kernel int8 --m 8 --budget 8

# 3. headline (reads the autotune table via int4_matmul_auto)
step bench 1800 python bench.py

# 3b. kernel-level trace: DMA/VPU overlap + op attribution (VERDICT #1c);
# best-effort — the remote profiler may not work through this tunnel
step profile 1800 python benchmarks/profile_decode.py --steps 16

# 4. batch sweep + decode-v2 + paged decode comparisons
step fb_batches 3600 python benchmarks/full_bench.py --quants int4g32 --batches 1,8,16,32
step fb_v2_1k  2400 python benchmarks/full_bench.py --quants int4g32 --batches 1,8 \
  --flash --attn-v2 --start-len 960
step fb_grid_1k 2400 python benchmarks/full_bench.py --quants int4g32 --batches 1,8 \
  --flash --start-len 960
step fb_paged  2400 python benchmarks/full_bench.py --quants int4g32 --batches 1,8 \
  --flash --paged --start-len 960

step fb_int8  2400 python benchmarks/full_bench.py --quants int8 --batches 1,8

# 5. engine end-to-end (dense, chunked admission, paged+prefix)
step eng_dense 2400 python benchmarks/engine_bench.py
step eng_lookahead 2400 python benchmarks/engine_bench.py --lookahead
step eng_chunk 2400 python benchmarks/engine_bench.py --prefill-chunk 128
step eng_paged 2400 python benchmarks/engine_bench.py --engine paged --flash \
  --prefill-chunk 256 --prefix-cache --shared-prefix 48
step eng_flash 2400 python benchmarks/engine_bench.py --flash
step eng_spec  2400 python benchmarks/engine_bench.py --engine paged --flash \
  --prefill-chunk 256 --speculative-k 7
step eng_spec_sampled 2400 python benchmarks/engine_bench.py --engine paged --flash \
  --prefill-chunk 256 --speculative-k 7 --sampled 0.8

# 5b. batch/prefill-shape autotune (dequant cost applies at all M;
# dyn-int8's +44% prefill shows it; batch serving lives at M=16-64)
step sweep_m64 3600 python benchmarks/autotune_sweep.py --m 64 --budget 8
step sweep_m256 5400 python benchmarks/autotune_sweep.py --m 256 --budget 8

# 6. GPTQ at 6B shapes
step gptq6b 3600 python benchmarks/gptq_6b.py --pipeline --layers 2

# 7. all kernels vs oracles on hardware (incl. new decode-v2/paged rows)
step smoke 3600 python benchmarks/tpu_smoke.py

echo "== sequence complete; see $L/*.out"
