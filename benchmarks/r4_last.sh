#!/bin/bash
set -u
cd "$(dirname "$0")/.."
L=benchmarks/logs
step() {
  local name=$1 to=$2; shift 2
  [ -f "$L/r4_$name.done" ] && { echo "== $name done"; return; }
  echo "== $name ($(date -u +%H:%M:%S))"
  timeout "$to" "$@" >"$L/r4_$name.out" 2>"$L/r4_$name.err" && touch "$L/r4_$name.done"
  echo "== $name rc=$?"
}
step profile_int8_b8 2400 python benchmarks/profile_decode.py --steps 16 --quant int8 --batch 8
step profile_int8_b1 2400 python benchmarks/profile_decode.py --steps 16 --quant int8 --batch 1
step sweep_m32 5400 python benchmarks/autotune_sweep.py --m 32 --all
step lm_head_micro 2400 python - <<'PYEOF'
import json, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, "benchmarks"); sys.path.insert(0, ".")
import autotune_sweep as AS
for impl, cfg in (("grid", {"bk": 4096, "bn": 1024, "scheme": "grouped"}),
                  ("grid", {"bk": 4096, "bn": 512, "scheme": "grouped"}),
                  ("grid", {"bk": 2048, "bn": 512, "scheme": "grouped"}),
                  ("grid", {"bk": 1024, "bn": 2048, "scheme": "grouped"}),
                  ("grid", {"bk": 2048, "bn": 2048, "scheme": "bt_grouped"})):
    try:
        t = AS.measure("int4", 8, 4096, 65536, impl, cfg)
        print(json.dumps({"shape": "lm_head", **cfg, "us": round(t*1e6, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({**cfg, "error": repr(e)[:160]}), flush=True)
PYEOF
echo "== last complete"
