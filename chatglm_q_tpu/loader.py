"""Checkpoint load/save — on-disk format identical to the reference.

Re-creates /root/reference/chatglm_q/loader.py:69-159: ``config.json``
(GLMLoadConfig schema), safetensors shards with the reference's tensor
names/layouts, greedy ≤2 GiB sharding on save, lenient load (unknown keys
warned and skipped, uninitialized keys reported — loader.py:97-110).

The in-memory parameter tree differs deliberately from the on-disk layout
(TPU-first design); this module is the single place where the two meet:

  on disk (reference layout)                 in memory (this package)
  ------------------------------------       ---------------------------------
  layers.{i}.attn.qkv_proj.weight (N,K)*  →  layers.q_proj/kv_proj, K-major,
                                             stacked on a leading L axis
  layers.{i}.ffn.w_in.weight (2I,K)*      →  layers.w_in_h / w_in_gate
  int8 weight (out,in) + scale (out,)     →  weight (K,N) int8 + scale (N,)
  int4 weight (in/2,out) offset-8 nibbles →  same shape, two's-complement
                                             nibbles (byte XOR 0x88)
  (*) float checkpoints store torch Linear (out,in); quantized int4 ones are
      already K-major (int4/qlinear.py:83).

Loading a checkpoint produced by the reference pipelines therefore works
directly, and checkpoints saved here load in the reference.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

import ml_dtypes

from .config import ChatGLM2Config, GLMLoadConfig
from .ops import quant as Q
from .tokenizer import ChatGLM2Tokenizer

NP_DTYPES = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": ml_dtypes.bfloat16,
}


# ---------------------------------------------------------------------------
# state-dict (reference names) → param tree
# ---------------------------------------------------------------------------

def _linear_from_sd(sd, prefix, quant_type, dtype):
    """Extract one linear layer from reference-named tensors.

    Float checkpoints store torch's (out, in) layout → transpose to K-major.
    int8 stores (out, in) int8 + (out,) scale → transpose weight.
    int4g32 stores (in/2, out) packed + (in/32, out) scale → repack nibbles.
    """
    out = {}
    w = sd.pop(prefix + ".weight")
    if quant_type == "none":
        out["weight"] = np.ascontiguousarray(w.T).astype(dtype)
    elif quant_type == "int8":
        wt = np.ascontiguousarray(w.T)  # (K, N) int8
        Ks = Q.int4_storage_k(wt.shape[0])
        if Ks != wt.shape[0]:  # kernel-alignment zero padding (ops/quant.py)
            wt = np.pad(wt, ((0, Ks - wt.shape[0]), (0, 0)))
        out["weight"] = wt
        out["weight_scale"] = sd.pop(prefix + ".weight_scale").astype(np.float32)
    elif quant_type == "int4g32":
        packed = Q.repack_ref_to_tpu(w)     # (K/2, N) uint8
        # reference checkpoints store f16 (model-dtype) scales; in HBM we
        # keep them in SCALE_DTYPE (bf16 — Mosaic v5e cannot load f16
        # vectors; see ops/quant.py).  The kernels multiply scales in bf16
        # either way, so this conversion is numerically invisible on the
        # bf16-activation path.
        scale = sd.pop(prefix + ".weight_scale")
        if scale.dtype == np.float16:
            scale = scale.astype(np.float32).astype(Q.SCALE_DTYPE)
        K = packed.shape[0] * 2
        Ks = Q.int4_storage_k(K)
        if Ks != K:
            packed = np.pad(packed, ((0, (Ks - K) // 2), (0, 0)))
            scale = np.pad(scale, ((0, (Ks - K) // 32), (0, 0)), constant_values=1.0)
        out["weight"] = packed
        out["weight_scale"] = scale
    else:
        raise NotImplementedError(quant_type)
    bias = sd.pop(prefix + ".bias", None)
    if bias is not None:
        out["bias"] = bias.astype(dtype)
    return out


def _n_axis(key: str, v) -> int:
    """Axis holding the output (N) dimension for a given param tensor:
    bias (N,) and int8 weight_scale (N,) → 0; weights (K, N), packed
    (K/2, N) and int4 scales (G, N) → 1."""
    return 0 if v.ndim == 1 else 1


def _split_cols(p: dict, at: int) -> tuple[dict, dict]:
    """Split a K-major linear param dict along the output (N) dimension."""
    left, right = {}, {}
    for k, v in p.items():
        if _n_axis(k, v) == 0:
            left[k], right[k] = v[:at], v[at:]
        else:
            left[k], right[k] = v[:, :at], v[:, at:]
    return left, right


def expected_state_dict_keys(config: ChatGLM2Config, quant_type: str) -> list:
    """Every tensor name :func:`params_from_state_dict` requires."""
    scale = [".weight_scale"] if quant_type != "none" else []
    keys = [f"word_embedding.weight"] + [
        "word_embedding" + s for s in scale
    ] + ["final_ln.weight"] + ["lm_head.weight"] + ["lm_head" + s for s in scale]
    for i in range(config.num_layers):
        keys += [f"layers.{i}.attn_ln.weight", f"layers.{i}.ffn_ln.weight"]
        for lin in ("attn.qkv_proj", "attn.o_proj", "ffn.w_in", "ffn.w_out"):
            keys.append(f"layers.{i}.{lin}.weight")
            keys += [f"layers.{i}.{lin}" + s for s in scale]
    return keys


def params_from_state_dict(
    sd: dict, config: ChatGLM2Config, quant_type: str, dtype
) -> dict:
    """Assemble the stacked functional param tree from reference-named numpy
    tensors.  Consumes entries from ``sd``; leftovers are the caller's
    "ignored keys" report.

    Unlike the reference loader (loader.py:110), a MISSING tensor is a hard
    error: this package builds the param tree FROM the checkpoint, so there
    is no pre-initialized module weight to fall back to — but all missing
    keys are reported together up-front instead of an opaque KeyError on
    the first one."""
    missing = [k for k in expected_state_dict_keys(config, quant_type)
               if k not in sd]
    if missing:
        raise KeyError(
            f"checkpoint is missing {len(missing)} required tensors "
            f"(quant_type={quant_type}): {missing[:8]}"
            f"{' …' if len(missing) > 8 else ''}")
    L = config.num_layers
    qs = config.q_size
    inner = config.inner_hidden_size

    # embedding
    if quant_type == "none":
        emb = {"weight": sd.pop("word_embedding.weight").astype(dtype)}
    else:
        emb = {
            "weight": sd.pop("word_embedding.weight"),
            "weight_scale": sd.pop("word_embedding.weight_scale").astype(np.float32),
        }

    def layer_parts(i):
        qkv = _linear_from_sd(sd, f"layers.{i}.attn.qkv_proj", quant_type, dtype)
        q_proj, kv_proj = _split_cols(qkv, qs)
        w_in = _linear_from_sd(sd, f"layers.{i}.ffn.w_in", quant_type, dtype)
        w_in_h, w_in_gate = _split_cols(w_in, inner)
        if quant_type != "none":
            # N-pad to the w_out K storage (kernel alignment; exact no-op)
            w_in_h = {k: np.asarray(v) for k, v in Q.pad_linear_n(w_in_h, quant_type).items()}
            w_in_gate = {k: np.asarray(v) for k, v in Q.pad_linear_n(w_in_gate, quant_type).items()}
        return {
            "attn_ln": {"weight": sd.pop(f"layers.{i}.attn_ln.weight").astype(dtype)},
            "ffn_ln": {"weight": sd.pop(f"layers.{i}.ffn_ln.weight").astype(dtype)},
            "q_proj": q_proj,
            "kv_proj": kv_proj,
            "o_proj": _linear_from_sd(sd, f"layers.{i}.attn.o_proj", quant_type, dtype),
            "w_in_h": w_in_h,
            "w_in_gate": w_in_gate,
            "w_out": _linear_from_sd(sd, f"layers.{i}.ffn.w_out", quant_type, dtype),
        }

    per_layer = [layer_parts(i) for i in range(L)]
    layers = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)

    params = {
        "word_embedding": emb,
        "layers": layers,
        "final_ln": {"weight": sd.pop("final_ln.weight").astype(dtype)},
        "lm_head": jax.tree.map(
            np.asarray,
            Q.lmhead_pad(_linear_from_sd(sd, "lm_head", quant_type, dtype),
                         quant_type),
        ),
    }
    return jax.tree.map(jnp.asarray, params)


def _slice_n(d: dict, n_logical: int, quant_type: str) -> dict:
    """Strip the N storage padding from a linear param dict (save path)."""
    return {
        k: (v[..., :n_logical] if _n_axis(k, v) == v.ndim - 1 else v)
        for k, v in d.items()
    }


def params_to_state_dict(params: dict, config: ChatGLM2Config, quant_type: str) -> dict:
    """Inverse of :func:`params_from_state_dict` (reference tensor names and
    layouts, numpy arrays)."""
    p = jax.tree.map(np.asarray, params)
    sd = {}
    qs = config.q_size
    I2 = config.inner_hidden_size

    def put_linear(prefix, d, k_logical):
        # strip the kernel-alignment K padding (storage-only, ops/quant.py)
        if quant_type == "none":
            sd[prefix + ".weight"] = np.ascontiguousarray(d["weight"].T)
        elif quant_type == "int8":
            sd[prefix + ".weight"] = np.ascontiguousarray(d["weight"][:k_logical].T)
            sd[prefix + ".weight_scale"] = d["weight_scale"]
        else:
            sd[prefix + ".weight"] = Q.repack_tpu_to_ref(d["weight"][: k_logical // 2])
            sd[prefix + ".weight_scale"] = d["weight_scale"][: k_logical // 32]
        if "bias" in d:
            sd[prefix + ".bias"] = d["bias"]

    def merge_cols(a, b):
        return {
            k: np.concatenate([a[k], b[k]], axis=_n_axis(k, a[k])) for k in a
        }

    sd["word_embedding.weight"] = p["word_embedding"]["weight"]
    if quant_type != "none":
        sd["word_embedding.weight_scale"] = p["word_embedding"]["weight_scale"]

    L = config.num_layers
    for i in range(L):
        li = jax.tree.map(lambda x: x[i], p["layers"])
        sd[f"layers.{i}.attn_ln.weight"] = li["attn_ln"]["weight"]
        sd[f"layers.{i}.ffn_ln.weight"] = li["ffn_ln"]["weight"]
        put_linear(f"layers.{i}.attn.qkv_proj",
                   merge_cols(li["q_proj"], li["kv_proj"]), config.hidden_size)
        put_linear(f"layers.{i}.attn.o_proj", li["o_proj"], qs)
        put_linear(f"layers.{i}.ffn.w_in",
                   merge_cols(_slice_n(li["w_in_h"], I2, quant_type),
                              _slice_n(li["w_in_gate"], I2, quant_type)),
                   config.hidden_size)
        put_linear(f"layers.{i}.ffn.w_out", li["w_out"], config.inner_hidden_size)

    sd["final_ln.weight"] = p["final_ln"]["weight"]
    put_linear("lm_head", _slice_n(p["lm_head"], config.vocab_size, quant_type),
               config.hidden_size)
    return sd


# ---------------------------------------------------------------------------
# File-level load/save (loader.py:69-159)
# ---------------------------------------------------------------------------

def load_model_and_tokenizer(
    model_path: Union[str, Path],
    dtype_name: Optional[str] = None,
    load_model: bool = True,
    load_tokenizer: bool = True,
):
    """Returns (GLMLoadConfig, params | None, ChatGLM2Tokenizer | None)."""
    from safetensors import safe_open

    model_path = Path(model_path)
    config = GLMLoadConfig.from_json((model_path / "config.json").read_bytes())
    dtype = NP_DTYPES[dtype_name or config.torch_dtype]

    params = None
    if load_model:
        sd = {}
        for file in config.weight_files:
            with safe_open(model_path / file, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        try:
            params = params_from_state_dict(
                sd, config.model_config, config.quant_type, dtype
            )
        except KeyError as e:
            raise KeyError(f"model weight missing from checkpoint: {e}") from e
        if sd:
            print(f'checkpoint keys ignored: {", ".join(sorted(sd))}')

    tokenizer = None
    if load_tokenizer:
        tokenizer = ChatGLM2Tokenizer(model_path / config.tokenizer_file)

    return config, params, tokenizer


def save_model_and_tokenizer(
    path: Union[str, Path],
    config: GLMLoadConfig,
    params: dict,
    tokenizer: Optional[ChatGLM2Tokenizer] = None,
    shard: bool = True,
    max_shard_bytes: int = 2 * 1024**3,
):
    """Greedy ≤max_shard_bytes sharding + config.json + tokenizer copy
    (loader.py:119-159)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    if tokenizer is not None:
        dst = path / config.tokenizer_file
        if isinstance(tokenizer.vocab_file, (str, Path)) and Path(tokenizer.vocab_file) != dst:
            shutil.copy(tokenizer.vocab_file, dst)
        elif isinstance(tokenizer.vocab_file, bytes):
            dst.write_bytes(tokenizer.vocab_file)

    sd = params_to_state_dict(params, config.model_config, config.quant_type)
    # cast float tensors to the configured dtype
    tgt = NP_DTYPES[config.torch_dtype]
    sd = {
        k: (v.astype(tgt) if v.dtype.kind == "f" or v.dtype == ml_dtypes.bfloat16 else v)
        for k, v in sd.items()
    }

    if not shard:
        config.weight_files = ["model_weights.safetensors"]
        save_file(sd, path / config.weight_files[0])
    else:
        mapping = {}
        index, size = 0, 0
        for name, w in sd.items():
            nbytes = w.nbytes
            if size + nbytes > max_shard_bytes:
                index += 1
                size = 0
            size += nbytes
            mapping[name] = f"model_weights_{index}.safetensors"
        config.weight_files = sorted(set(mapping.values()))
        for file in config.weight_files:
            save_file({n: sd[n] for n, f in mapping.items() if f == file}, path / file)

    (path / "config.json").write_text(config.to_json())
