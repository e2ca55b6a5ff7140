# %%
"""Convert the HF `THUDM/chatglm2-6b` checkpoint to this package's (and the
reference's) safetensors layout.

Re-creates /root/reference/examples/convert_weight.py:19-67: the same
explicit 7-keys-per-layer name map, bf16 config, tokenizer copy.  Output
checkpoints load both here (chatglm_q_tpu.loader) and in the reference.

Requires the HF files locally (or network access for snapshot_download).
"""
import argparse
import json
import shutil
from pathlib import Path

parser = argparse.ArgumentParser()
parser.add_argument("--source", default="THUDM/chatglm2-6b",
                    help="HF repo id or local path with pytorch_model*.bin")
parser.add_argument("--target", default="../models/chatglm2-6b-safe")
args = parser.parse_args()

model_path = Path(args.source)
if not model_path.exists():
    from huggingface_hub import snapshot_download

    model_path = Path(snapshot_download(args.source))

target_path = Path(args.target)
target_path.mkdir(parents=True, exist_ok=True)

# %%
name_mapping = {
    "transformer.embedding.word_embeddings.weight": "word_embedding.weight",
    "transformer.encoder.final_layernorm.weight": "final_ln.weight",
    "transformer.output_layer.weight": "lm_head.weight",
}
for i in range(28):
    name_mapping.update({
        f"transformer.encoder.layers.{i}.input_layernorm.weight": f"layers.{i}.attn_ln.weight",
        f"transformer.encoder.layers.{i}.self_attention.query_key_value.weight": f"layers.{i}.attn.qkv_proj.weight",
        f"transformer.encoder.layers.{i}.self_attention.query_key_value.bias": f"layers.{i}.attn.qkv_proj.bias",
        f"transformer.encoder.layers.{i}.self_attention.dense.weight": f"layers.{i}.attn.o_proj.weight",
        f"transformer.encoder.layers.{i}.post_attention_layernorm.weight": f"layers.{i}.ffn_ln.weight",
        f"transformer.encoder.layers.{i}.mlp.dense_h_to_4h.weight": f"layers.{i}.ffn.w_in.weight",
        f"transformer.encoder.layers.{i}.mlp.dense_4h_to_h.weight": f"layers.{i}.ffn.w_out.weight",
    })

# %%
import torch
from safetensors.torch import save_file
from tqdm.auto import tqdm

from chatglm_q_tpu.config import GLMLoadConfig

indices = json.loads((model_path / "pytorch_model.bin.index.json").read_bytes())
bin_files = sorted(set(indices["weight_map"].values()))

for bin_file in tqdm(bin_files):
    state_dict = torch.load(model_path / bin_file, map_location="cpu", weights_only=True)
    new_state_dict = {}
    for k, v in state_dict.items():
        if k not in name_mapping:
            print(f"skipping '{k}' (no target name — e.g. rotary inv_freq)")
            continue
        new_state_dict[name_mapping[k]] = v
    save_file(new_state_dict, target_path / bin_file.replace(".bin", ".safetensors"))

config = GLMLoadConfig(
    weight_files=[f.replace(".bin", ".safetensors") for f in bin_files],
    torch_dtype="bfloat16",
)
shutil.copy(model_path / "tokenizer.model", target_path / config.tokenizer_file)
(target_path / "config.json").write_text(config.to_json())
print(f"converted → {target_path}")
