"""Chipless AOT compile gate: every production Mosaic kernel must compile
for the real bench hardware (TPU v5e) — no device needed.

The local ``libtpu`` can compile for a v5e topology
(``jax.experimental.topologies.get_topology_desc``) even though the only
real chip is behind a tunnel.  This catches Mosaic lowering regressions on
CPU CI — round 3 found three this way that CPU interpret-mode tests can
never see (all landed in round 2, whose TPU was wedged):

* f16 scale tiles: "Invalid vector type for load" / "Unsupported cast:
  float16 -> bfloat16" — f16 vectors have no VPU support on v5e (fixed:
  SCALE_DTYPE → bf16);
* lane-splitting reshape ``(bm, bk) → (bm, gb, 32)`` in the bt_grouped
  rank-1 offset: "infer-vector-layout: unsupported shape cast" (fixed:
  0/1 selection-matrix matmul);
* sub-32-bit vector shifts in the int8 ``bt`` scheme: "failed to legalize
  arith.shrui" (fixed: widen to i32 for the shift).

Skipped when no local libtpu/topology support is present.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatglm_q_tpu.ops import pallas_attention as PA
from chatglm_q_tpu.ops import pallas_matmul as PM


def _topology_sharding():
    import os

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # libtpu refuses to load in >1 process at once (/tmp/libtpu_lockfile),
    # so under pytest-xdist 3 of 4 workers would get SH=None and this whole
    # gate SILENTLY skips.  AOT compilation touches no device, so multiple
    # loads are safe here; measured: all 4 concurrent workers then pass.
    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "1")
    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices[:1]).reshape(1,), ("x",))
    return NamedSharding(mesh, P())


try:
    SH = _topology_sharding()
except Exception as e:  # no local libtpu / topology support
    SH = None
    _TOPO_ERR = str(e)
    # This gate is the ONLY Mosaic-lowering check that runs without the
    # device; silently skipping it lets v5e-incompatible kernels reach
    # hardware (it happened in round 2).  Make the skip unmissable.
    import sys as _sys
    import warnings as _warnings

    _MSG = ("test_tpu_aot: v5e AOT gate DID NOT RUN (no local libtpu "
            f"topology support: {_TOPO_ERR[:200]}) — 22 Mosaic compile "
            "checks were skipped; do NOT treat this suite run as covering "
            "kernel lowering")
    print(f"\n{'!' * 78}\n{_MSG}\n{'!' * 78}", file=_sys.stderr, flush=True)
    _warnings.warn(_MSG)

pytestmark = pytest.mark.skipif(SH is None, reason="no local v5e AOT support")


def aot(fn, *args):
    """Lower+compile for the v5e topology; raises on any Mosaic error."""
    structs = [jax.ShapeDtypeStruct(a[0], a[1], sharding=SH) for a in args]
    jax.jit(fn).lower(*structs).compile()


B, G, Hg, D = 8, 2, 16, 128
K, N, T = 4096, 4096, 1024


@pytest.mark.parametrize("scheme", ["broadcast", "grouped", "selscale",
                                    "bt_grouped"])
@pytest.mark.parametrize("impl", ["grid", "pipelined"])
def test_int4_fwd_compiles(scheme, impl):
    fn = (PM.int4_matmul_pallas if impl == "grid"
          else PM.int4_matmul_pallas_pipelined)
    aot(lambda x, p, s: fn(x, p, s, scheme=scheme, interpret=False),
        ((8, K), jnp.bfloat16), ((K // 2, N), jnp.uint8),
        ((K // 32, N), jnp.bfloat16))


def test_indexed_kernels_compile():
    """Layer-indexed stacked-weight kernels (scalar-prefetched layer id;
    round 4): the serving scan's per-layer weight access must not
    materialize XLA slice copies."""
    L = 4
    aot(lambda x, p, s, i: PM.int4_matmul_pallas_idx(x, p, s, i,
                                                     interpret=False),
        ((8, K), jnp.bfloat16), ((L, K // 2, N), jnp.uint8),
        ((L, K // 32, N), jnp.bfloat16), ((), jnp.int32))
    aot(lambda x, w, s, i: PM.int8_matmul_pallas_idx(x, w, s, i,
                                                     interpret=False),
        ((8, K), jnp.bfloat16), ((L, K, N), jnp.int8),
        ((L, N), jnp.float32), ((), jnp.int32))
    # tiled serving layout: contiguous column blocks
    aot(lambda x, p, s, i: PM.int4_matmul_pallas_idx(x, p, s, i,
                                                     interpret=False),
        ((8, K), jnp.bfloat16), ((L, N // 1024, K // 2, 1024), jnp.uint8),
        ((L, N // 1024, K // 32, 1024), jnp.bfloat16), ((), jnp.int32))


def test_int4_fwd_compiles_lmhead_selscale():
    """The lm_head decode shape (N=65536) under selscale — the round-3 OOM
    shapes were exactly the big-N decode rows the sweep selects first."""
    aot(lambda x, p, s: PM.int4_matmul_pallas(x, p, s, scheme="selscale",
                                              interpret=False),
        ((8, K), jnp.bfloat16), ((K // 2, 65536), jnp.uint8),
        ((K // 32, 65536), jnp.bfloat16))


@pytest.mark.parametrize("scheme", ["convert", "bt"])
def test_int8_fwd_compiles(scheme):
    aot(lambda x, w, s: PM.int8_matmul_pallas(x, w, s, scheme=scheme,
                                              interpret=False),
        ((8, K), jnp.bfloat16), ((K, N), jnp.int8), ((N,), jnp.float32))


def test_transposed_and_dyn_compile():
    aot(lambda g, p, s: PM.int4_matmul_t_pallas(g, p, s, interpret=False),
        ((8, N), jnp.bfloat16), ((K // 2, N), jnp.uint8),
        ((K // 32, N), jnp.bfloat16))
    aot(lambda g, w, s: PM.int8_matmul_t_pallas(g, w, s, interpret=False),
        ((8, N), jnp.bfloat16), ((K, N), jnp.int8), ((N,), jnp.float32))
    aot(lambda x, w, s: PM.int8_dyn_matmul_pallas(x, w, s, interpret=False),
        ((8, K), jnp.bfloat16), ((K, N), jnp.int8), ((N,), jnp.float32))
    # dyn-int4 (round 5): int4→int8 widen + s8×s8 MXU group dots must
    # lower for v5e, direct and layer-indexed
    aot(lambda x, p, s: PM.int4_dyn_matmul_pallas(x, p, s, interpret=False),
        ((32, K), jnp.bfloat16), ((K // 2, N), jnp.uint8),
        ((K // 32, N), jnp.bfloat16))
    aot(lambda x, p, s, i: PM.int4_dyn_matmul_pallas_idx(x, p, s, i,
                                                         interpret=False),
        ((32, K), jnp.bfloat16), ((4, K // 2, N), jnp.uint8),
        ((4, K // 32, N), jnp.bfloat16), ((), jnp.int32))
    aot(lambda x, w, s, i: PM.int8_dyn_matmul_pallas_idx(x, w, s, i,
                                                         interpret=False),
        ((32, K), jnp.bfloat16), ((4, K, N), jnp.int8),
        ((4, N), jnp.float32), ((), jnp.int32))


def test_attention_kernels_compile():
    sm = 1.0 / np.sqrt(D)
    aot(lambda q, k, v, l: PA.flash_attention_prefill(
            q, k, v, l, sm, interpret=False),
        ((B, 256, G, Hg, D), jnp.bfloat16), ((B, G, T, D), jnp.bfloat16),
        ((B, G, T, D), jnp.bfloat16), ((B,), jnp.int32))
    aot(lambda q, k, v, l: PA.flash_attention_decode(
            q, k, v, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((B, G, T, D), jnp.bfloat16),
        ((B, G, T, D), jnp.bfloat16), ((B,), jnp.int32))
    aot(lambda q, k, v, l: PA.flash_attention_decode_v2(
            q, k, v, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((B, G, T, D), jnp.bfloat16),
        ((B, G, T, D), jnp.bfloat16), ((B,), jnp.int32))


def test_idx_cache_kernels_compile():
    """Layer-indexed stacked-cache decode attention + in-place KV write
    (round 5): the serving scan's cache handling must not materialize XLA
    slab copies (the batch-scaling cost profiled in round 5)."""
    sm = 1.0 / np.sqrt(D)
    L = 4
    for kvdt in (jnp.bfloat16, jnp.float8_e4m3fn):
        aot(lambda q, k, v, lay, l: PA.flash_attention_decode_idx(
                q, k, v, lay, l, sm, interpret=False),
            ((B, G, Hg, D), jnp.bfloat16), ((L, B, G, T, D), kvdt),
            ((L, B, G, T, D), kvdt), ((), jnp.int32), ((B,), jnp.int32))
        aot(lambda c, n, lay, s: PA.kv_cache_write_idx(
                c, n, lay, s, interpret=False),
            ((L, B, G, T, D), kvdt), ((B, G, D), jnp.bfloat16),
            ((), jnp.int32), ((B,), jnp.int32))
        NP, P_, MP = 64, 256, 16
        aot(lambda p, n, lay, pt, s: PA.kv_pool_write_idx(
                p, n, lay, pt, s, interpret=False),
            ((L, NP, G, P_, D), kvdt), ((B, G, D), jnp.bfloat16),
            ((), jnp.int32), ((B, MP), jnp.int32), ((B,), jnp.int32))


def test_paged_attention_kernels_compile():
    sm = 1.0 / np.sqrt(D)
    L, NP, P_, MP = 2, 64, 64, 16
    aot(lambda q, kp, vp, li, pt, l: PA.flash_attention_decode_paged(
            q, kp, vp, li, pt, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((L, NP, G, P_, D), jnp.bfloat16),
        ((L, NP, G, P_, D), jnp.bfloat16), ((1,), jnp.int32),
        ((B, MP), jnp.int32), ((B,), jnp.int32))
    aot(lambda q, kp, vp, li, pt, st: PA.flash_attention_chunk_paged(
            q, kp, vp, li, pt, st, sm, interpret=False),
        ((B, 8, G, Hg, D), jnp.bfloat16), ((L, NP, G, P_, D), jnp.bfloat16),
        ((L, NP, G, P_, D), jnp.bfloat16), ((1,), jnp.int32),
        ((B, MP), jnp.int32), ((B,), jnp.int32))


def test_full_decode_step_compiles(monkeypatch):
    """The flagship program end to end: a 6B-width (2-layer) int4g32 decode
    step with flash decode attention, all Mosaic kernels active."""
    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.ops.quant import int4_storage_k

    monkeypatch.setattr(PM, "_is_tpu", lambda: True)
    monkeypatch.setattr(PA, "_is_tpu", lambda: True)

    cfg = ChatGLM2Config(num_layers=2)  # 6B widths, 2 layers
    rt = TpuRuntimeConfig(use_pallas=True, use_flash_attention=True)
    qt = "int4g32"
    H, I, V = cfg.hidden_size, cfg.inner_hidden_size, cfg.vocab_size
    Ip = int4_storage_k(I)
    L = cfg.num_layers

    def lin(k, n, bias):
        k, n = int4_storage_k(k), int4_storage_k(n)
        p = {"weight": jax.ShapeDtypeStruct((L, k // 2, n), jnp.uint8, sharding=SH),
             "weight_scale": jax.ShapeDtypeStruct((L, k // 32, n), jnp.bfloat16, sharding=SH)}
        if bias:
            p["bias"] = jax.ShapeDtypeStruct((L, n), jnp.bfloat16, sharding=SH)
        return p

    def s(shape, dtype=jnp.bfloat16):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=SH)

    params = {
        "word_embedding": {"weight": s((V // 2, H), jnp.uint8),
                           "weight_scale": s((V // 32, H), jnp.float32)},
        "layers": {
            "attn_ln": {"weight": s((L, H))},
            "ffn_ln": {"weight": s((L, H))},
            "q_proj": lin(H, cfg.q_size, True),
            "kv_proj": lin(H, 2 * cfg.kv_size, True),
            "o_proj": lin(cfg.q_size, H, False),
            "w_in_h": lin(H, I, False),
            "w_in_gate": lin(H, I, False),
            "w_out": lin(I, H, False),
        },
        "final_ln": {"weight": s((H,))},
        "lm_head": {"weight": s((H // 2, 65536), jnp.uint8),
                    "weight_scale": s((H // 32, 65536), jnp.bfloat16)},
    }
    from chatglm_q_tpu.models.chatglm2 import KVCache

    cache = KVCache(
        k=s((L, 1, cfg.num_multi_query_groups, 256, cfg.head_hidden_size)),
        v=s((L, 1, cfg.num_multi_query_groups, 256, cfg.head_hidden_size)),
        lengths=s((1,), jnp.int32),
    )
    ids = s((1,), jnp.int32)

    jax.jit(
        lambda p, i, c: M.decode_step(p, cfg, i, c, qt, jnp.bfloat16, rt)
    ).lower(params, ids, cache).compile()


@functools.lru_cache(maxsize=1)
def _pod_decode_hlo() -> str:
    """GSPMD-compile the TP+DP sharded decode step for REAL v5e hardware
    over a (data=2, model=2) topology mesh; returns the optimized (post-
    scheduling) HLO text.  Cached: the compile gate and the collective-
    schedule assertions share one compile."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.parallel import sharding as S

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 2),
                (S.DATA_AXIS, S.MODEL_AXIS))
    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    qt = "int4g32"
    rt = TpuRuntimeConfig(use_pallas=False, mesh=mesh)

    shapes = jax.eval_shape(
        lambda key: M.init_params(key, cfg, qt, jnp.float32),
        jax.random.PRNGKey(0))
    specs = S.param_pspecs(cfg, qt, shapes)
    params = jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)),
        shapes, specs)
    kv = jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)),
        jax.eval_shape(lambda: M.init_kv_cache(cfg, 2, 32, jnp.float32)),
        S.kv_cache_pspecs())
    ids = jax.ShapeDtypeStruct((2,), jnp.int32,
                               sharding=NamedSharding(mesh, P(S.DATA_AXIS)))
    with mesh:
        compiled = jax.jit(
            lambda p, i, c: M.decode_step(p, cfg, i, c, qt, jnp.float32, rt)
        ).lower(params, ids, kv).compile()
    return compiled.as_text()


def test_multichip_sharded_decode_compiles():
    """The (2,2) TP+DP decode step GSPMD-compiles (ICI collectives,
    layouts) — beyond what the virtual CPU mesh can validate."""
    assert len(_pod_decode_hlo()) > 0


def test_int8_embedding_gather_no_table_dequant():
    """embedding_lookup_int8 must gather rows THEN dequantize — scaling the
    whole (V, H) table first materializes a ~0.5 GB bf16 intermediate at 6B
    (VERDICT r4 weak #3).  Compile at the real 6B shapes for v5e and assert
    no full-table float buffer appears in the optimized HLO."""
    from chatglm_q_tpu.ops.quant import embedding_lookup_int8

    V, H, B = 65024, 4096, 8
    params = {"weight": jax.ShapeDtypeStruct((V, H), jnp.int8, sharding=SH),
              "weight_scale": jax.ShapeDtypeStruct((H,), jnp.float32,
                                                   sharding=SH)}
    compiled = jax.jit(
        lambda p, ids: embedding_lookup_int8(p, ids, jnp.bfloat16)
    ).lower(params, jax.ShapeDtypeStruct((B,), jnp.int32,
                                         sharding=SH)).compile()
    txt = compiled.as_text()
    for pat in (f"bf16[{V},{H}]", f"f32[{V},{H}]", f"bf16[{V * H}]"):
        assert pat not in txt, f"full-table dequant intermediate: {pat}"


def test_attention_kernels_compile_8k():
    """Full 8192 context (the reference's max_sequence_length): VMEM-block
    feasibility of the ragged decode kernels at the long-context shapes."""
    sm = 1.0 / np.sqrt(D)
    T8 = 8192
    aot(lambda q, k, v, l: PA.flash_attention_decode(
            q, k, v, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((B, G, T8, D), jnp.bfloat16),
        ((B, G, T8, D), jnp.bfloat16), ((B,), jnp.int32))
    aot(lambda q, k, v, l: PA.flash_attention_decode_v2(
            q, k, v, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((B, G, T8, D), jnp.bfloat16),
        ((B, G, T8, D), jnp.bfloat16), ((B,), jnp.int32))
    aot(lambda q, k, v, l: PA.flash_attention_prefill(
            q, k, v, l, sm, interpret=False),
        ((1, 2048, G, Hg, D), jnp.bfloat16), ((1, G, T8, D), jnp.bfloat16),
        ((1, G, T8, D), jnp.bfloat16), ((1,), jnp.int32))
    # paged at 8K: 32 pages/row of 256
    L_, NP, P_, MP = 2, 64, 256, 32
    aot(lambda q, kp, vp, li, pt, l: PA.flash_attention_decode_paged(
            q, kp, vp, li, pt, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((L_, NP, G, P_, D), jnp.bfloat16),
        ((L_, NP, G, P_, D), jnp.bfloat16), ((1,), jnp.int32),
        ((B, MP), jnp.int32), ((B,), jnp.int32))
    # layer-indexed stacked-cache kernels at 8K (the kv8k bench path),
    # at the capacity-scaled block the runtime heuristic picks
    # (decode_block_k: T//4 = 2048 rows — 1024+-row flash tiles compile
    # fine on v5e, the >512-row lore was prefill-specific)
    aot(lambda q, k, v, lay, l: PA.flash_attention_decode_idx(
            q, k, v, lay, l, sm, block_k=2048, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((L_, B, G, T8, D), jnp.bfloat16),
        ((L_, B, G, T8, D), jnp.bfloat16), ((), jnp.int32),
        ((B,), jnp.int32))
    aot(lambda c, n, lay, s: PA.kv_cache_write_idx(c, n, lay, s),
        ((L_, B, G, T8, D), jnp.bfloat16), ((B, G, D), jnp.bfloat16),
        ((), jnp.int32), ((B,), jnp.int32))
    # and with the fp8 KV storage option (in-kernel cast after the DMA)
    aot(lambda q, k, v, lay, l: PA.flash_attention_decode_idx(
            q, k, v, lay, l, sm, interpret=False),
        ((B, G, Hg, D), jnp.bfloat16), ((L_, B, G, T8, D), jnp.float8_e4m3fn),
        ((L_, B, G, T8, D), jnp.float8_e4m3fn), ((), jnp.int32),
        ((B,), jnp.int32))
    aot(lambda c, n, lay, s: PA.kv_cache_write_idx(c, n, lay, s),
        ((L_, B, G, T8, D), jnp.float8_e4m3fn), ((B, G, D), jnp.bfloat16),
        ((), jnp.int32), ((B,), jnp.int32))


def test_sharded_attention_kernels_compile():
    """The shard_map-wrapped Pallas attention paths (T-sharded decode with
    log-sum-exp merge; model-sharded paged decode; ring prefill) compiled
    for real v5e over a 4-device topology mesh."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.parallel import sharding as S
    from chatglm_q_tpu.parallel.ring_attention import ring_attention

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 2),
                (S.DATA_AXIS, S.MODEL_AXIS))
    sm = 1.0 / np.sqrt(D)
    T = 1024

    def st(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    B2 = 2
    q = st((B2, G, Hg, D), jnp.bfloat16, P(S.DATA_AXIS))
    k = st((B2, G, T, D), jnp.bfloat16, P(S.DATA_AXIS, None, S.MODEL_AXIS))
    v = st((B2, G, T, D), jnp.bfloat16, P(S.DATA_AXIS, None, S.MODEL_AXIS))
    lengths = st((B2,), jnp.int32, P(S.DATA_AXIS))
    with mesh:
        jax.jit(lambda q, k, v, l: PA.flash_attention_decode_kv_tsharded(
            q, k, v, l, sm, mesh, interpret=False)).lower(
                q, k, v, lengths).compile()

    # ring-attention prefill (XLA einsum body — no Pallas inside, but the
    # shard_map + ppermute program must compile for the ICI topology)
    S_ = 256
    qr = st((B2, S_, G, Hg, D), jnp.bfloat16, P(S.DATA_AXIS, S.MODEL_AXIS))
    kr = st((B2, S_, G, D), jnp.bfloat16, P(S.DATA_AXIS, S.MODEL_AXIS))
    vr = st((B2, S_, G, D), jnp.bfloat16, P(S.DATA_AXIS, S.MODEL_AXIS))
    lr = st((B2,), jnp.int32, P())
    with mesh:
        jax.jit(lambda q, k, v, l: ring_attention(
            q, k, v, l, mesh, S.MODEL_AXIS, sm)).lower(
                qr, kr, vr, lr).compile()

    # model-sharded paged decode (strided local views + lse merge)
    L_, NP, P_, MP = 2, 64, 64, 16
    kp = st((L_, NP, G, P_, D), jnp.bfloat16,
            P(None, (S.DATA_AXIS, S.MODEL_AXIS)))
    vp = st((L_, NP, G, P_, D), jnp.bfloat16,
            P(None, (S.DATA_AXIS, S.MODEL_AXIS)))
    li = st((1,), jnp.int32, P())
    pt = st((B2, MP), jnp.int32, P(S.DATA_AXIS))
    lp = st((B2,), jnp.int32, P(S.DATA_AXIS))
    with mesh:
        jax.jit(lambda q, kp, vp, li, pt, l:
                PA.flash_attention_decode_paged_msharded(
                    q, kp, vp, li, pt, l, sm, mesh, interpret=False)).lower(
                        q, kp, vp, li, pt, lp).compile()


def test_sharded_idx_cache_kernels_compile():
    """The layer-indexed stacked-cache decode kernels under shard_map
    (mesh twin of the round-5 b8-b64 fix): in-place write + flash decode
    straight off the (L, B, G, T, D) cache, compiled for real v5e over a
    (data=2, model=2) topology mesh."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.parallel import sharding as S

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 2),
                (S.DATA_AXIS, S.MODEL_AXIS))
    sm = 1.0 / np.sqrt(D)
    L_, B2, T = 2, 2, 1024

    def st(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    cache_spec = P(None, S.DATA_AXIS, None, None, None)
    cache = st((L_, B2, G, T, D), jnp.bfloat16, cache_spec)
    new = st((B2, G, D), jnp.bfloat16, P(S.DATA_AXIS))
    layer = st((), jnp.int32, P())
    starts = st((B2,), jnp.int32, P(S.DATA_AXIS))
    with mesh:
        jax.jit(lambda c, n, lay, s: PA.kv_cache_write_idx_sharded(
            c, n, lay, s, mesh)).lower(cache, new, layer, starts).compile()

    q = st((B2, G, Hg, D), jnp.bfloat16, P(S.DATA_AXIS, None, S.MODEL_AXIS))
    lengths = st((B2,), jnp.int32, P(S.DATA_AXIS))
    with mesh:
        jax.jit(lambda q, k, v, lay, l: PA.flash_attention_decode_idx_sharded(
            q, k, v, lay, l, sm, mesh)).lower(
                q, cache, cache, layer, lengths).compile()


@functools.lru_cache(maxsize=1)
def _pod_train_hlo() -> str:
    """8-device (2, 4) v5e pod: the FULL training step — loss + grads
    through the quantized layers + optax update — GSPMD-compiled with the
    real dp/tp param layout; returns the optimized HLO text (cached)."""
    import optax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.parallel import sharding as S
    from chatglm_q_tpu.utils.train import make_train_step, partition_params

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 4),
                (S.DATA_AXIS, S.MODEL_AXIS))
    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    qt = "int4g32"
    rt = TpuRuntimeConfig(use_pallas=False, remat_layers=True)
    optimizer = optax.adamw(1e-4)

    shapes = jax.eval_shape(
        lambda key: M.init_params(key, cfg, qt, jnp.float32),
        jax.random.PRNGKey(0))
    specs = S.param_pspecs(cfg, qt, shapes)

    def shard(tree, spec_tree):
        # trainable/frozen trees hold None at each other's leaf positions
        return jax.tree.map(
            lambda sds, sp: None if sds is None else jax.ShapeDtypeStruct(
                sds.shape, sds.dtype, sharding=NamedSharding(mesh, sp)),
            tree, spec_tree, is_leaf=lambda x: x is None)

    trainable_s, frozen_s = jax.eval_shape(
        lambda key: partition_params(M.init_params(key, cfg, qt, jnp.float32)),
        jax.random.PRNGKey(0))
    t_specs = jax.tree.map(lambda t, sp: None if t is None else sp,
                           trainable_s, specs, is_leaf=lambda x: x is None)
    f_specs = jax.tree.map(lambda f, sp: None if f is None else sp,
                           frozen_s, specs, is_leaf=lambda x: x is None)
    trainable = shard(trainable_s, t_specs)
    frozen = shard(frozen_s, f_specs)
    # optimizer state: unspecified shardings — GSPMD propagates them from
    # the trainable leaves (mu/nu mirror the param layout)
    opt_state = jax.eval_shape(optimizer.init, trainable_s)
    batch, seq = 4, 32
    data = NamedSharding(mesh, P(S.DATA_AXIS, None))
    ids = jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=data)
    labels = jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=data)

    step = make_train_step(cfg, qt, optimizer, jnp.float32, rt)
    with mesh:
        compiled = jax.jit(step).lower(trainable, frozen, opt_state, ids,
                                       labels).compile()
    return compiled.as_text()


def test_pod8_train_step_compiles():
    """BASELINE configs 4-5 are unmeasurable without multi-chip hardware,
    but the training step must stay compile-proven at pod shapes."""
    assert len(_pod_train_hlo()) > 0


def _collective_schedule_report(txt: str):
    """Parse post-scheduling HLO: per computation, match async collective
    start/done pairs and count real compute (fusion/dot/convolution)
    scheduled between them; also count blocking (sync) collectives."""
    import re

    pairs = []
    for comp in txt.split("\n\n"):
        lines = comp.splitlines()
        starts = {}
        for i, l in enumerate(lines):
            m = re.match(
                r"\s*%(\S+?) = .*"
                r"(collective-permute|all-gather|all-reduce)-start\(", l)
            if m:
                starts[m.group(1)] = (i, m.group(2))
            m2 = re.search(
                r"(?:collective-permute|all-gather|all-reduce)-done"
                r"\(%(\S+?)\)", l)
            if m2 and m2.group(1) in starts:
                j, kind = starts[m2.group(1)]
                ncomp = sum(
                    1 for b in lines[j + 1: i]
                    if re.search(r"= .*(fusion|dot|convolution)\(", b))
                pairs.append({"name": m2.group(1), "kind": kind,
                              "gap": i - j - 1, "compute_between": ncomp})
    sync = {
        kind: len(re.findall(kind + r"\(", txt))
        for kind in ("collective-permute", "all-gather", "reduce-scatter")
    }
    sync["all-reduce"] = len(re.findall(r"(?<!-)all-reduce\(", txt))
    n_start = len(re.findall(r"-start\(", txt))
    return pairs, sync, n_start


def test_pod_collectives_async_and_overlapped():
    """Comms-overlap evidence from the compiled pod programs (VERDICT r4
    next #6): in both the (2,2) TP+DP decode step and the (2,4) train step,
    the ICI transfers that CAN overlap (the kv/ring collective-permutes —
    no immediate data dependence) must be scheduled as async start/done
    pairs with real compute between them (latency-hiding scheduler
    engaged), and must never appear in blocking (sync) form.

    The TP activation psums (all-reduce after o_proj/w_out partial dots)
    legitimately remain sync: their results feed the residual add
    immediately — a data dependence, not a scheduling failure.  The
    assertion on them is that each carries an ICI ring
    collective_algorithm_config (the v5e ring emitter is engaged)."""
    import re

    for name, txt in (("decode", _pod_decode_hlo()),
                      ("train", _pod_train_hlo())):
        pairs, sync, n_start = _collective_schedule_report(txt)
        # 1. async pairs exist, and blocking collective-permutes do not
        assert n_start > 0, f"{name}: no async collectives at all"
        assert sync["collective-permute"] == 0, \
            f"{name}: blocking collective-permute present"
        assert sync["all-gather"] == 0, f"{name}: blocking all-gather"
        # 2. the scheduler filled the transfer latency with compute:
        #    every matched pair has compute between start and done, and at
        #    least one pair hides a substantial block (>= 5 fused ops)
        assert len(pairs) >= 2, f"{name}: matched pairs: {pairs}"
        overlapped = [p for p in pairs if p["compute_between"] > 0]
        assert len(overlapped) == len(pairs), f"{name}: unfilled: {pairs}"
        assert max(p["compute_between"] for p in pairs) >= 5, \
            f"{name}: only trivial overlap: {pairs}"
        # 3. sync all-reduces (TP activation psums) all run the ICI ring
        #    emitter and sit on a dot/reduce critical path
        for m in re.finditer(r"%all-reduce[^(]*? = [^\n]*", txt):
            line = m.group(0)
            if "-start" in line or "-done" in line:
                continue
            assert "collective_algorithm_config" in line, line[:200]


def test_pod8_msharded_paged_decode_compiles():
    """8-device (2, 4) v5e pod: the distributed paged engine's inner decode
    program — paged pool sharded over BOTH mesh axes, strided-partial
    log-sum-exp merge — GSPMD-compiles at pod shape."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.models import paged_kv as PK
    from chatglm_q_tpu.parallel import sharding as S

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 4),
                (S.DATA_AXIS, S.MODEL_AXIS))
    cfg = ChatGLM2Config(
        hidden_size=256, inner_hidden_size=512, head_hidden_size=32,
        num_multi_query_groups=2, num_attention_heads=8, num_layers=2,
        vocab_size=1024, max_sequence_length=64,
    )
    qt = "int4g32"
    rt = TpuRuntimeConfig(use_pallas=False, mesh=mesh, paged_shard_model=True)

    shapes = jax.eval_shape(
        lambda key: M.init_params(key, cfg, qt, jnp.float32),
        jax.random.PRNGKey(0))
    specs = S.param_pspecs(cfg, qt, shapes)
    params = jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)),
        shapes, specs)
    B, NP_, PSZ = 8, 64, 8
    kv_specs = S.paged_kv_pspecs(shard_model=True)
    cache_shapes = jax.eval_shape(
        lambda: PK.init_paged_kv_cache(cfg, B, NP_, max_length=64,
                                       page_size=PSZ, dtype=jnp.float32))
    cache = jax.tree.map(
        lambda sds, sp: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, sp)),
        cache_shapes, kv_specs)
    tok = jax.ShapeDtypeStruct((B,), jnp.int32,
                               sharding=NamedSharding(mesh, P(S.DATA_AXIS)))
    with mesh:
        jax.jit(
            lambda p, t, c: PK.decode_step_paged(p, cfg, t, c, qt,
                                                 jnp.float32, rt)
        ).lower(params, tok, cache).compile()


def test_multichip_tp_pallas_decode_compiles(monkeypatch):
    """The rt.tp_pallas serving program at 6B widths: per-shard fused
    dequant kernels under shard_map (col/row Megatron placement) + the
    shard_map'd flash decode — GSPMD-compiled for a (1, 4) v5e mesh."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chatglm_q_tpu.config import ChatGLM2Config, TpuRuntimeConfig
    from chatglm_q_tpu.models import chatglm2 as M
    from chatglm_q_tpu.parallel import sharding as S

    monkeypatch.setattr(PM, "_is_tpu", lambda: True)
    monkeypatch.setattr(PA, "_is_tpu", lambda: True)

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.array(topo.devices).reshape(1, 4),
                (S.DATA_AXIS, S.MODEL_AXIS))
    cfg = ChatGLM2Config(num_layers=2)  # 6B widths
    qt = "int4g32"
    rt = TpuRuntimeConfig(use_pallas=True, use_flash_attention=True,
                          tp_pallas=True, mesh=mesh)

    shapes = jax.eval_shape(
        lambda key: M.init_params(key, cfg, qt, jnp.bfloat16),
        jax.random.PRNGKey(0))
    specs = S.param_pspecs(cfg, qt, shapes)
    params = jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)),
        shapes, specs)
    kv = jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)),
        jax.eval_shape(lambda: M.init_kv_cache(cfg, 4, 256, jnp.bfloat16)),
        S.kv_cache_pspecs())
    ids = jax.ShapeDtypeStruct((4,), jnp.int32,
                               sharding=NamedSharding(mesh, P(S.DATA_AXIS)))
    with mesh:
        jax.jit(
            lambda p, i, c: M.decode_step(p, cfg, i, c, qt, jnp.bfloat16, rt)
        ).lower(params, ids, kv).compile()
