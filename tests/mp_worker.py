"""Worker for the true 2-process ``jax.distributed`` test.

Each process contributes 2 virtual CPU devices → a global (data=2, model=2)
mesh spanning both processes, with REAL cross-process collectives (Gloo).
This is the one configuration the single-process virtual mesh cannot
falsify: host-side scheduler lockstep (``sync_submissions`` padded
broadcast) and host fetches of globally-sharded arrays only misbehave when
``jax.process_count() > 1``.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port> <out.json> [engine]
``engine``: "dense" (default) or "paged_spec" (DistributedPagedServingEngine
with in-graph speculative decoding — exercises the spec-chunk ``_fetch``
path, which fetches data-sharded draft/accept arrays every chunk).
Writes {"tokens": {req_id: [ids...]}, "process": i} to out.json.
"""
import json
import os
import sys

# 4 global devices total, split across the processes (argv parsed before
# the jax import because the flag must be set at backend init)
_N_PROC = int(sys.argv[2])
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={4 // _N_PROC} "
    + os.environ.get("XLA_FLAGS", "")
)

import jax

jax.config.update("jax_platforms", "cpu")

PROMPTS = [[3, 17, 42], [7, 9, 11, 13]]


def main():
    proc_id, n_proc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    engine_kind = sys.argv[5] if len(sys.argv) > 5 else "dense"
    if n_proc > 1:
        from chatglm_q_tpu.utils.distributed import initialize

        initialize(coordinator_address=f"localhost:{port}",
                   num_processes=n_proc, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from chatglm_q_tpu.config import (ChatGLM2Config, GLMLoadConfig,
                                      TpuRuntimeConfig)
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.parallel import sharding as S
    from chatglm_q_tpu.serving.dist_engine import (
        DistributedPagedServingEngine, DistributedServingEngine)

    config = ChatGLM2Config(
        hidden_size=64, inner_hidden_size=128, head_hidden_size=16,
        num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
        vocab_size=256, max_sequence_length=64,
    )
    quant_type = "none"
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2),
                (S.DATA_AXIS, S.MODEL_AXIS))
    params = M.init_params(jax.random.PRNGKey(0), config, quant_type,
                           jnp.float32)
    params = S.shard_params(params, mesh, config, quant_type)
    load_cfg = GLMLoadConfig(model_config=config, quant_type=quant_type,
                             torch_dtype="float32")
    with mesh:
        if engine_kind == "paged_spec":
            engine = DistributedPagedServingEngine(
                load_cfg, params, None, mesh=mesh, max_batch=4,
                max_seq_len=64, decode_chunk=4, num_pages=18, page_size=8,
                speculative_k=3,
                rt=TpuRuntimeConfig(use_pallas=False, mesh=mesh),
            )
        else:
            engine = DistributedServingEngine(
                load_cfg, params, None, mesh=mesh, max_batch=4,
                max_seq_len=64, decode_chunk=4,
                rt=TpuRuntimeConfig(use_pallas=False),
            )
        # host 0 is the request front-end; other hosts receive via broadcast
        engine.sync_submissions(
            PROMPTS if jax.process_index() == 0 else None,
            max_new_tokens=6, temperature=0.0,
        )
        while engine.has_work:
            engine.step()
    tokens = {str(r.req_id): [int(t) for t in r.generated]
              for r in engine.finished}
    with open(out_path, "w") as f:
        json.dump({"tokens": tokens, "process": proc_id}, f)
    print(f"proc {proc_id} done: {tokens}", flush=True)


if __name__ == "__main__":
    main()
