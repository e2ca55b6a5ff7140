#!/bin/bash
# Wake-up driver: run the moment the TPU answers (docs/STATUS.md wake plan).
#
# 1. Probe the device (SIGTERM timeout — never SIGKILL a TPU client).
# 2. Validate CLIENT-SIDE COMPILE mode (PALLAS_AXON_REMOTE_COMPILE=0: the
#    plugin compiles with the local libtpu — seconds instead of minutes —
#    and only executes remotely) with a Pallas-vs-oracle correctness check.
# 3. Run the full measurement sequence in whichever mode validated.
#
# ONE TPU process at a time: stop any poll loop before running this.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

echo "== probe"
timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
  || { echo "device not answering"; exit 1; }

echo "== validate client-side compile mode"
cat > /tmp/wake_check.py <<'EOF'
import jax, jax.numpy as jnp
import numpy as np
from chatglm_q_tpu.ops import pallas_matmul as PM
from chatglm_q_tpu.ops.quant import unpack_int4_tpu
K, N = 1024, 1024
x = jax.random.normal(jax.random.PRNGKey(0), (8, K), jnp.bfloat16)
p = jax.random.bits(jax.random.PRNGKey(1), (K // 2, N), jnp.uint8)
s = jnp.full((K // 32, N), 0.01, jnp.bfloat16)
got = jax.jit(lambda a, b, c: PM.int4_matmul_pallas(a, b, c, scheme="selscale"))(x, p, s)
want = x.astype(jnp.float32) @ unpack_int4_tpu(p, s)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
rel = err / (float(jnp.max(jnp.abs(want))) + 1e-9)
if rel >= 2e-2:
    # rc 2 = the KERNEL is numerically wrong — the caller must ABORT, not
    # fall back to remote mode and measure a known-bad kernel
    print("kernel-vs-oracle MISMATCH, rel", rel)
    import sys; sys.exit(2)
print("kernel-vs-oracle OK, rel", rel)
EOF
MODE_ENV=""
PALLAS_AXON_REMOTE_COMPILE=0 timeout 550 python /tmp/wake_check.py \
     > benchmarks/logs/wake_localcompile.log 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  echo "client-side compile mode VALID — using it for all steps"
  MODE_ENV="PALLAS_AXON_REMOTE_COMPILE=0"
elif [ $rc -eq 2 ]; then
  echo "KERNEL NUMERICALLY WRONG (see benchmarks/logs/wake_localcompile.log) — aborting"
  exit 2
else
  echo "client-side compile unavailable (rc=$rc) — remote mode"
fi

echo "== measurement sequence"
env $MODE_ENV bash benchmarks/r2_measure.sh
