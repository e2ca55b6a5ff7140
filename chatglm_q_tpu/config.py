"""Model and load-time configuration.

Re-creates the behavior of the reference's two config dataclasses
(`ChatGLM2Config`, /root/reference/chatglm_q/model.py:9-22 and
`ChatGLMLoadConfig`, /root/reference/chatglm_q/loader.py:16-38) with the same
JSON schema so checkpoints produced by either implementation are mutually
loadable.  TPU-specific knobs (mesh shape, kernel selection) live in
:class:`TpuRuntimeConfig` and are deliberately *not* serialized into
``config.json`` — on-disk format stays reference-compatible.
"""
from __future__ import annotations

import json
import dataclasses
from dataclasses import dataclass, field
from typing import Literal, Optional

import jax.numpy as jnp

_TUNNELED: Optional[bool] = None


def _is_tunneled_backend() -> bool:
    """True when the TPU backend is a remote "axon" tunnel (every dispatch
    pays ~30 ms RTT and un-synced dispatch bursts can stall — see
    TpuRuntimeConfig.sync_prefill_chunks)."""
    global _TUNNELED
    if _TUNNELED is None:
        try:
            import jax

            d = jax.devices()[0]
            _TUNNELED = (d.platform == "tpu"
                         and "axon" in d.client.platform_version)
        except Exception:
            _TUNNELED = False
    return _TUNNELED

QuantType = Literal["none", "int8", "int4g32"]
DTypeName = Literal["float32", "float16", "bfloat16"]

# Group size along the contraction (K) dimension for int4 quantization.
# Unlike the reference (module-level mutable ``DEFAULT_GROUP_SIZE``,
# int4/qlinear.py:5), this is plumbed explicitly through configs.
DEFAULT_GROUP_SIZE = 32


@dataclass
class ChatGLM2Config:
    """ChatGLM2-6B architecture hyperparameters (reference model.py:9-22)."""

    hidden_size: int = 4096
    inner_hidden_size: int = 13696
    head_hidden_size: int = 128

    num_multi_query_groups: int = 2
    num_attention_heads: int = 32
    num_layers: int = 28

    vocab_size: int = 65024
    dropout_rate: float = 0.0
    layernorm_epsilon: float = 1e-05
    max_sequence_length: int = 8192

    @property
    def qkv_out_size(self) -> int:
        return self.head_hidden_size * (
            self.num_attention_heads + 2 * self.num_multi_query_groups
        )

    @property
    def q_size(self) -> int:
        return self.head_hidden_size * self.num_attention_heads

    @property
    def kv_size(self) -> int:
        return self.head_hidden_size * self.num_multi_query_groups


def dtype_from_name(name: DTypeName):
    return {
        "float32": jnp.float32,
        "float16": jnp.float16,
        "bfloat16": jnp.bfloat16,
    }[name]


@dataclass
class GLMLoadConfig:
    """Serialization config; JSON-compatible with the reference
    ``ChatGLMLoadConfig`` (loader.py:16-38) including field names and
    the strict ``model_type`` validation (loader.py:25-28)."""

    model_type: str = "ChatGLM2Model"
    model_config: ChatGLM2Config = field(default_factory=ChatGLM2Config)
    quant_type: QuantType = "none"
    weight_files: list = field(default_factory=list)
    tokenizer_file: str = "sentencepiece.model"
    torch_dtype: DTypeName = "float32"

    def __post_init__(self):
        assert self.model_type == "ChatGLM2Model", "Only 'ChatGLM2Model' is supported"
        if not isinstance(self.model_config, ChatGLM2Config):
            self.model_config = ChatGLM2Config(**self.model_config)
        assert self.quant_type in ("none", "int8", "int4g32"), self.quant_type
        assert self.torch_dtype in ("float32", "float16", "bfloat16"), self.torch_dtype

    @property
    def activation_dtype(self):
        return dtype_from_name(self.torch_dtype)

    @staticmethod
    def from_json(json_str) -> "GLMLoadConfig":
        return GLMLoadConfig(**json.loads(json_str))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), ensure_ascii=False, indent=2)


@dataclass(frozen=True, eq=False)
class TpuRuntimeConfig:
    """TPU-only runtime knobs — never serialized to checkpoint config.json.

    use_pallas: run fused Pallas dequant-matmul / attention kernels.  When
        False (or when the active backend is not TPU) the pure-jnp fallback
        ops are used; those fallbacks double as the test oracles, mirroring
        the reference's Triton→torch fallback switch
        (int8/qlinear.py:6-16).
    """

    use_pallas: Optional[bool] = None  # None = auto (TPU backend only)
    # Pallas flash/ragged attention in the serving paths (None = follow
    # use_pallas).  The XLA masked-softmax path remains for parity mode.
    # Under a mesh, shard_map-wrapped kernel variants exist for decode
    # (sharded/tsharded/paged/msharded — ops/pallas_attention.py) and the
    # linears (tp_pallas below); whole-prompt/chunked prefill attention
    # under a mesh stays on the GSPMD XLA path (MXU-bound there).
    use_flash_attention: Optional[bool] = None
    # Dynamic activation quantization for the quantized layers (int8 AND
    # int4g32): per-row int8 activations + s8×s8 MXU dots with the scales
    # applied to the int32 accumulator (the reference's ONNX
    # DynamicQuantizeLinear semantics, int8/qlinear.py:54-70; for int4 the
    # nibbles widen int4→int8 with no float dequant at all).  ~0.3-1%
    # activation quantization error — a different numerics mode, so opt-in.
    dynamic_int8: bool = False
    # Matmul M-dimension at or below which the fused (bandwidth-bound) decode
    # kernels are used; above it, prefill-style dequant-then-matmul is used.
    decode_m_threshold: int = 128
    # Sequence-shard the KV cache over the model axis (requires mesh):
    # per-chip KV bytes/token drop tp×; decode merges per-shard flash
    # partials (ops/pallas_attention.flash_attention_decode_kv_tsharded).
    # Prefill then uses the XLA attention path (GSPMD-partitioned).
    kv_shard_t: bool = False
    # Shard the paged KV pool's physical-page dim over BOTH mesh axes
    # (requires mesh): per-chip pool HBM and KV reads/token drop tp× vs the
    # data-only pool sharding.  Logical page j of a row lives on model chip
    # j % tp (the distributed paged engine's allocator guarantees this);
    # decode merges the tp strided partials exactly
    # (ops/pallas_attention.flash_attention_decode_paged_msharded).
    paged_shard_model: bool = False
    # O(length)-DMA ragged decode kernel (flash_attention_decode_v2):
    # manual double-buffered HBM reads with a dynamic trip count, enabled by
    # the (L, B, G, T, D) cache layout's contiguous per-group rows.
    decode_attn_v2: bool = False
    # Disable the layer-indexed stacked-cache decode kernels
    # (kv_cache_write_idx + flash_attention_decode_idx) and fall back to the
    # XLA slab-copy cache update.  A/B lever only — the idx path measured
    # +15/+46/+63/+73% aggregate at b8/16/32/64 (docs/RESULTS.md round 5).
    no_idx_cache: bool = False
    # Tensor-parallel serving with the FUSED Pallas kernels: each linear
    # runs per-shard under shard_map with the Megatron col/row placement
    # (parallel/tp_linear.py) instead of the GSPMD jnp-dequant fallback
    # (which materializes bf16 weights — up to 4× the int4 HBM traffic per
    # chip).  Serving/forward only; requires mesh.
    tp_pallas: bool = False
    # Training: rematerialize each layer in the backward pass instead of
    # storing its activations (jax.checkpoint around the layer-scan body) —
    # activation HBM drops from O(num_layers) to O(1) layers at the cost of
    # one extra forward recompute, the standard TPU FLOPs-for-memory trade.
    remat_layers: bool = False
    # Flash-attention block sizes.
    attn_block_q: int = 256
    attn_block_k: int = 512
    # Mesh for shard_map-wrapped flash attention under tensor/data
    # parallelism (q heads sharded over the model axis, KV replicated,
    # batch over the data axis).  None = single-device kernels; the XLA
    # attention path needs no mesh (GSPMD partitions it automatically).
    mesh: object = None  # Optional[jax.sharding.Mesh]

    # Force a host synchronization after each dispatched prefill chunk.
    # None = auto: ON for tunneled "axon" backends, where a burst of small
    # async chunk programs with no sync between them trips a ~60 s
    # transport stall at the next fetch (round-4 probe: 5-step chunked
    # admission went 68 s → 24 s with per-chunk syncs, the stall was
    # dt=60.012 s exactly); OFF everywhere else — on co-located TPUs
    # async chunk pipelining is strictly good.
    sync_prefill_chunks: Optional[bool] = None

    def sync_chunks_enabled(self) -> bool:
        if self.sync_prefill_chunks is not None:
            return self.sync_prefill_chunks
        return _is_tunneled_backend()

    def decode_block_k(self, cache_len: int) -> int:
        """KV block rows for the ragged decode kernels, given the cache's
        static capacity.  Long contexts are grid-step-overhead bound
        (~0.6 us/step regardless of work — docs/RESULTS.md round 5), so
        blocks scale with capacity: measured at 8K, T//4 = 2048 rows gives
        +19%/+30% agg at b8/b16 over the 512 default, while short caches
        keep 512 (big blocks DMA masked rows when valid length << block)."""
        if cache_len >= 4096:
            return max(self.attn_block_k, cache_len // 4)
        return self.attn_block_k

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        import jax

        return jax.default_backend() == "tpu"

    def flash_enabled(self) -> bool:
        if self.use_flash_attention is not None:
            return self.use_flash_attention
        return self.pallas_enabled()
