"""Full-6B cross-implementation parity: this repo vs the torch reference,
SAME checkpoint loaded by both, on CPU (VERDICT r4 missing #1 / next #2).

No real weights exist in this environment, but parity does not need them:
a random-init checkpoint at the genuine ChatGLM2-6B shapes (28 layers,
4096 hidden, 13696 inner, 65024 vocab) exercises the full numerics
end-to-end — embedding, 28 blocks, final_ln, lm_head, CE loss — through
the on-disk interop contract (reference loader.py:69-159).

Protocol per quant type (none / int8-RTN / int4g32-RTN):
  1. build the checkpoint ONCE from one float tree (this repo's saver,
     reference-format safetensors);
  2. the torch reference loads it (its own loader + quantized module
     classes) and runs forward(input_ids, labels) in fp32;
  3. this repo loads the same files and runs the parity forward in fp32;
  4. report max|dlogit|, relative max, and dloss.

Writes benchmarks/logs/parity_6b.json and prints one line per quant type.

Usage: python benchmarks/parity_6b.py [--small] [--keep]
  --small runs the identical pipeline at tiny shapes (smoke test, ~1 min);
  the real run takes ~30-60 min and ~60 GB RAM on this 4-core box.
"""
import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the tunneled TPU
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference tokenizer module imports sentencepiece at module scope; it
# is not installed here (this package ships its own engine) — shim it, the
# parity run never touches the tokenizer (tests/test_loader.py pattern)
if "sentencepiece" not in sys.modules:
    import importlib.machinery
    import types

    _shim = types.ModuleType("sentencepiece")

    class _SPUnavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("sentencepiece shim")

    _shim.SentencePieceProcessor = _SPUnavailable
    _shim.__spec__ = importlib.machinery.ModuleSpec("sentencepiece", None)
    sys.modules["sentencepiece"] = _shim

from chatglm_q_tpu.config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig
from chatglm_q_tpu import loader as LD
from chatglm_q_tpu.models import chatglm2 as M
from chatglm_q_tpu.quant.rtn import rtn_quantize_model

T0 = time.perf_counter()


def log(msg):
    print(f"[parity6b {time.perf_counter()-T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def build_checkpoints(root: Path, cfg: ChatGLM2Config, quants, seed=0):
    todo = [q for q in quants if not (root / q / "config.json").exists()]
    if not todo:
        return
    log(f"generating float tree ({cfg.num_layers} layers, "
        f"{cfg.hidden_size} hidden)")
    params = M.init_params(jax.random.PRNGKey(seed), cfg, "none", jnp.float32)
    for qt in todo:
        log(f"building {qt} checkpoint")
        p = params if qt == "none" else rtn_quantize_model(params, cfg, qt)
        p = jax.block_until_ready(p)
        LD.save_model_and_tokenizer(
            root / qt,
            GLMLoadConfig(model_config=cfg, quant_type=qt,
                          torch_dtype="float32"),
            p, None)
        if qt != "none":
            del p
        gc.collect()
        log(f"{qt} checkpoint saved")
    del params
    gc.collect()


def torch_forward(ckpt: Path, ids: np.ndarray, labels: np.ndarray):
    import torch
    from chatglm_q import loader as RL

    torch.manual_seed(0)
    _, model, _ = RL.load_model_and_tokenizer(ckpt, torch_dtype=torch.float32,
                                              load_tokenizer=False)
    model.eval()
    with torch.no_grad():
        loss, logits, _ = model(input_ids=torch.tensor(ids),
                                labels=torch.tensor(labels))
    out = (float(loss), logits.float().numpy())
    del model, logits
    gc.collect()
    return out


def jax_forward(ckpt: Path, cfg, qt: str, ids: np.ndarray, labels: np.ndarray):
    _, params, _ = LD.load_model_and_tokenizer(ckpt, load_tokenizer=False)
    rt = TpuRuntimeConfig(use_pallas=False)  # oracle numerics on CPU
    loss, logits = M.forward(params, cfg, jnp.asarray(ids),
                             labels=jnp.asarray(labels), quant_type=qt,
                             dtype=jnp.float32, rt=rt)
    out = (float(loss), np.asarray(logits, np.float32))
    del params, logits
    gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny-shape smoke run of the identical pipeline")
    ap.add_argument("--keep", action="store_true",
                    help="keep the checkpoints on disk")
    ap.add_argument("--out", default=None)
    ap.add_argument("--quants", default="none,int8,int4g32")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seqlen", type=int, default=48)
    args = ap.parse_args()

    if args.small:
        cfg = ChatGLM2Config(
            hidden_size=64, inner_hidden_size=128, head_hidden_size=16,
            num_multi_query_groups=2, num_attention_heads=4, num_layers=2,
            vocab_size=128, max_sequence_length=64)
    else:
        cfg = ChatGLM2Config()  # genuine ChatGLM2-6B hyperparameters

    quants = args.quants.split(",")
    root = Path(args.out or ("/tmp/parity6b_small" if args.small
                             else "/tmp/parity6b"))
    root.mkdir(parents=True, exist_ok=True)
    build_checkpoints(root, cfg, quants, args.seed)

    rng = np.random.RandomState(args.seed + 1)
    ids = rng.randint(0, cfg.vocab_size, (args.batch, args.seqlen)).astype(np.int64)
    labels = ids.copy()
    labels[:, :4] = -100  # reference ppl protocol: mask the prompt head

    results = {}
    for qt in quants:
        ckpt = root / qt
        log(f"[{qt}] torch reference forward")
        loss_ref, logits_ref = torch_forward(ckpt, ids, labels)
        log(f"[{qt}] jax forward")
        loss_ours, logits_ours = jax_forward(ckpt, cfg, qt, ids, labels)
        d = np.abs(logits_ours - logits_ref)
        res = {
            "max_abs_dlogit": float(d.max()),
            "mean_abs_dlogit": float(d.mean()),
            "rel_max": float(d.max() / (np.abs(logits_ref).max() + 1e-9)),
            "loss_ref": loss_ref,
            "loss_ours": loss_ours,
            "dloss": float(loss_ours - loss_ref),
            "logit_absmax_ref": float(np.abs(logits_ref).max()),
        }
        results[qt] = res
        log(f"[{qt}] max|dlogit|={res['max_abs_dlogit']:.3e} "
            f"(rel {res['rel_max']:.3e}) dloss={res['dloss']:+.3e} "
            f"(loss ref {loss_ref:.5f} ours {loss_ours:.5f})")
        del logits_ref, logits_ours
        gc.collect()

    payload = {
        "config": {"layers": cfg.num_layers, "hidden": cfg.hidden_size,
                   "inner": cfg.inner_hidden_size, "vocab": cfg.vocab_size,
                   "batch": args.batch, "seqlen": args.seqlen,
                   "seed": args.seed, "small": args.small},
        "results": results,
    }
    outdir = Path(__file__).parent / "logs"
    outdir.mkdir(exist_ok=True)
    name = "parity_6b_small.json" if args.small else "parity_6b.json"
    (outdir / name).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))

    if not args.keep:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
