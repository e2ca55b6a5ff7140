"""Layer-pipelined GPTQ calibration driver.

Re-creates the reference GPTQ scripts' pipeline
(/root/reference/examples/quantize_gptq/int4g32.py:41-110) functionally:

  1. quantize the embedding with naive RTN (:41);
  2. embed every calibration batch once (:46-51);
  3. per layer: replay all batches through the FLOAT block collecting the
     activations feeding each linear (functional taps replace forward
     hooks), accumulate the GPTQ Hessians, quantize each linear with its
     Hessian, swap the quantized weights in, and reuse the float block's
     outputs as the next layer's inputs (:56-86) — so later layers are
     calibrated on quantized-upstream activations;
  4. final_ln → lm_head Hessian → quantize lm_head (:91-100).

q_proj/kv_proj share one Hessian (same input — they are the reference's
fused qkv matmul) as do w_in_h/w_in_gate (fused w_in); GPTQ's column sweep
is independent per output row, so quantizing the splits separately is
mathematically identical to quantizing the fused weights.
"""
from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from ..config import ChatGLM2Config, TpuRuntimeConfig
from ..models import chatglm2 as M
from ..ops import quant as Q
from . import gptq as G

_DEFAULT_RT = TpuRuntimeConfig()


def gptq_quantize_model(
    params: dict,
    config: ChatGLM2Config,
    batches: Iterable[tuple],  # (input_ids (B,S), attention_mask (B,S) | None)
    quant_type: str,
    blocksize: int = 128,
    groupsize: int = 32,
    percdamp: float = 0.01,
    dtype=jnp.float32,
    rt: TpuRuntimeConfig = _DEFAULT_RT,
    print_loss: bool = False,
) -> dict:
    assert quant_type in ("int8", "int4g32")
    batches = list(batches)
    L = config.num_layers

    # 1. embedding: naive RTN (int4g32.py:41)
    emb_w = params["word_embedding"]["weight"].astype(jnp.float32)
    emb_q = (
        Q.quantize_embedding_int8(emb_w)
        if quant_type == "int8"
        else Q.quantize_embedding_int4(emb_w)
    )

    # 2. embed all batches once, through the QUANTIZED embedding
    # (+1 table row: cumsum positions are 1-based, so a full-length
    # calibration sequence indexes row max_sequence_length — must match
    # models/chatglm2.forward exactly or the Hessians are computed from
    # activations the calibrated model will never see)
    table = jnp.asarray(
        M.precompute_freqs_cis(config.head_hidden_size,
                               config.max_sequence_length + 1)
    ).astype(dtype)
    prepared = []
    for input_ids, attention_mask in batches:
        B, S = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        mask_bias, pos = M.build_parity_mask_and_positions(attention_mask, S)
        if quant_type == "int8":
            h = Q.embedding_lookup_int8(emb_q, input_ids, dtype)
        else:
            h = Q.embedding_lookup_int4(emb_q, input_ids, dtype)
        prepared.append(
            {"h": h, "freqs": table[pos], "mask5": mask_bias[:, None, None, :, :]}
        )

    def quant_params(w_kn, hessian, bias, pad_n=False, debug_input=None,
                     tag=""):
        Kh = hessian.shape[0]
        if w_kn.shape[0] < Kh:
            # upstream activations are storage-K padded (w_in N padding);
            # pad the float weight rows — GPTQ's dead-column handling zeroes
            # them and they quantize to exact 0
            w_kn = jnp.pad(w_kn, ((0, Kh - w_kn.shape[0]), (0, 0)))
        dbg = debug_input if print_loss else None
        if quant_type == "int8":
            out = G.gptq_linear_params_int8(w_kn, hessian, bias, blocksize,
                                            percdamp, debug_input=dbg)
        else:
            out = G.gptq_linear_params_int4(w_kn, hessian, bias, blocksize,
                                            groupsize, percdamp,
                                            debug_input=dbg)
        if dbg is not None:
            # the reference's pring_loss line per linear
            # (int8/quantizer.py:152-156): quant loss from the sweep, debug
            # MSE on the last calibration batch's activations
            p, quant_losses, debug_loss = out
            print(f"{tag}: {quant_losses=:.8f} {debug_loss=:.8f}", flush=True)
        else:
            p = out
        if pad_n:
            p = Q.pad_linear_n(p, quant_type)
        return p

    tap_block = jax.jit(
        lambda lp, h, f, m: M.block_forward(
            lp, h, f, m, config, "none", rt, kv_write=None, collect_taps=True
        )
    )

    # 3. layer pipeline
    new_layers = []
    for i in range(L):
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        hes = {}
        dbg = {}  # last batch's tap per linear = the reference debug_input
        outs = []
        for b in prepared:
            out, _, taps = tap_block(lp, b["h"], b["freqs"], b["mask5"])
            outs.append(out)
            for name, x in taps.items():
                if name not in hes:
                    hes[name] = G.init_hessian(x.shape[-1])
                hes[name] = G.accumulate_hessian(*hes[name], x)
                dbg[name] = x
        for b, out in zip(prepared, outs):
            b["h"] = out  # float-block outputs feed the next layer (:67-75)

        ql = {
            "attn_ln": lp["attn_ln"],
            "ffn_ln": lp["ffn_ln"],
            "q_proj": quant_params(
                lp["q_proj"]["weight"], hes["qkv_in"][0], lp["q_proj"].get("bias"),
                debug_input=dbg["qkv_in"], tag=f"layer {i} q_proj",
            ),
            "kv_proj": quant_params(
                lp["kv_proj"]["weight"], hes["qkv_in"][0], lp["kv_proj"].get("bias"),
                debug_input=dbg["qkv_in"], tag=f"layer {i} kv_proj",
            ),
            "o_proj": quant_params(
                lp["o_proj"]["weight"], hes["o_in"][0], lp["o_proj"].get("bias"),
                debug_input=dbg["o_in"], tag=f"layer {i} o_proj",
            ),
            "w_in_h": quant_params(
                lp["w_in_h"]["weight"], hes["w_in_in"][0], lp["w_in_h"].get("bias"),
                pad_n=True, debug_input=dbg["w_in_in"],
                tag=f"layer {i} w_in_h",
            ),
            "w_in_gate": quant_params(
                lp["w_in_gate"]["weight"], hes["w_in_in"][0],
                lp["w_in_gate"].get("bias"), pad_n=True,
                debug_input=dbg["w_in_in"], tag=f"layer {i} w_in_gate",
            ),
            "w_out": quant_params(
                lp["w_out"]["weight"], hes["w_out_in"][0], lp["w_out"].get("bias"),
                debug_input=dbg["w_out_in"], tag=f"layer {i} w_out",
            ),
        }
        new_layers.append(ql)

    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *new_layers)

    # 4. lm_head on final_ln outputs (:91-100)
    Hh, n = G.init_hessian(config.hidden_size)
    final = None
    for b in prepared:
        final = M.rms_norm(
            b["h"], params["final_ln"]["weight"], config.layernorm_epsilon
        )
        Hh, n = G.accumulate_hessian(Hh, n, final)
    lm_head = Q.lmhead_pad(
        quant_params(params["lm_head"]["weight"], Hh,
                     params["lm_head"].get("bias"),
                     debug_input=final, tag="lm_head"),
        quant_type,
    )

    return {
        "word_embedding": emb_q,
        "layers": layers,
        "final_ln": params["final_ln"],
        "lm_head": lm_head,
    }
