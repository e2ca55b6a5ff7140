"""Streaming autoregressive decoder — the reference ``ChatGLMDecoder``
(/root/reference/chatglm_q/decoder.py:30-108) rebuilt around jitted
prefill/decode-step functions and a preallocated KV cache.

Differences from the reference driven by TPU/jit semantics:
  * prompt lengths are padded to power-of-two buckets so prefill compiles a
    bounded set of programs instead of one per prompt length;
  * the KV cache is a fixed-size buffer with per-row lengths (no per-step
    concat realloc, decoder loop hot spot model.py:151-155);
  * sampling runs on-device (`ops/sampling.py`) with an explicit PRNG key.

`time_log` reproduces the reference's report format (decoder.py:99-106).
"""
from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GLMLoadConfig, TpuRuntimeConfig
from ..models import chatglm2 as M
from ..ops.sampling import top_p_sampling, greedy_sampling
from .chat import process_response

_DEFAULT_RT = TpuRuntimeConfig()


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class GLMDecoder:
    def __init__(
        self,
        config: GLMLoadConfig,
        params: dict,
        tokenizer,
        eos_token: str = "</s>",
        max_sequence_length: Optional[int] = None,
        time_log: bool = False,
        rt: TpuRuntimeConfig = _DEFAULT_RT,
        dtype=None,
        kv_dtype=None,
    ):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.eos_token_id = tokenizer[eos_token]
        self.max_sequence_length = max_sequence_length or config.model_config.max_sequence_length
        self.time_log = time_log
        self.rt = rt
        self.dtype = dtype or config.activation_dtype
        self.kv_dtype = kv_dtype or self.dtype
        qt = config.quant_type
        mc = config.model_config

        self._prefill = jax.jit(
            lambda p, ids, lens, cache: M.prefill(p, mc, ids, lens, cache, qt, self.dtype, rt)
        )
        self._decode = jax.jit(
            lambda p, ids, cache: M.decode_step(p, mc, ids, cache, qt, self.dtype, rt)
        )
        # speculative verification: one chunked forward judges all draft
        # positions (compiled on first speculative generate)
        self._verify = jax.jit(
            lambda p, ids, starts, valid, cache: M.prefill_chunk(
                p, mc, ids, starts, valid, cache, qt, self.dtype, rt,
                return_all_logits=True,
            )
        )

    # -- persistence -------------------------------------------------------

    @staticmethod
    def from_pretrained(
        path_or_repo_id: Union[str, Path],
        dtype_name: Optional[str] = None,
        cache_dir=None,
        token=None,
        **kwargs,
    ) -> "GLMDecoder":
        """Local path or HF hub repo id (decoder.py:51-58)."""
        from ..loader import load_model_and_tokenizer

        path = Path(path_or_repo_id)
        if not path.exists() or not path.is_dir():
            from huggingface_hub import snapshot_download

            path = snapshot_download(str(path_or_repo_id), cache_dir=cache_dir, token=token)
        config, params, tokenizer = load_model_and_tokenizer(path, dtype_name)
        return GLMDecoder(config, params, tokenizer, **kwargs)

    def save_pretrained(self, path: Union[str, Path], shard: bool = True):
        from ..loader import save_model_and_tokenizer

        save_model_and_tokenizer(path, self.config, self.params, self.tokenizer, shard=shard)

    # -- generation --------------------------------------------------------

    def generate(
        self,
        prefix_text: str,
        max_generated_tokens: int = 400,
        top_k: int = 100,
        top_p: float = 0.8,
        temperature: float = 1.0,
        seed: Optional[int] = None,
        speculative_k: int = 0,
        speculative_ngram: int = 3,
    ):
        """Streaming generator: yields the re-decoded response after each
        token (suppressing a trailing partial-UTF8 U+FFFD, decoder.py:93-95);
        returns the final processed response.

        ``speculative_k`` > 0 enables prompt-lookup speculative decoding
        for GREEDY generation (temperature == 0): up to k tokens drafted
        from the sequence's own n-gram repetitions are verified per device
        step (serving/speculative.py) — token-for-token identical output,
        fewer weight-streaming passes.  Ignored when sampling."""
        tokenizer = self.tokenizer
        prefix_ids = tokenizer.encode(prefix_text)
        # keep the most recent context when the prompt exceeds the cache
        # (the reference would silently forward an over-long prompt,
        # decoder.py:76-77 only caps generation)
        max_prefix = self.max_sequence_length - max(1, min(max_generated_tokens, 64))
        if len(prefix_ids) > max_prefix:
            prefix_ids = prefix_ids[-max_prefix:]
        rng = jax.random.PRNGKey(np.random.randint(1 << 30) if seed is None else seed)

        # clamp: with a non-power-of-two max_sequence_length the bucket could
        # otherwise exceed the KV cache length and break the prefill update
        bucket = min(_bucket(len(prefix_ids)), self.max_sequence_length)
        prompt = np.zeros((1, bucket), np.int32)
        prompt[0, : len(prefix_ids)] = prefix_ids
        cache = M.init_kv_cache(
            self.config.model_config, 1, self.max_sequence_length, self.kv_dtype
        )

        generated: list[int] = []
        generate_time: list[float] = []
        tp = jnp.float32(top_p)
        temp = jnp.float32(temperature)

        speculate = speculative_k > 0 and temperature == 0.0
        self.spec_stats = {"verify_steps": 0, "decode_steps": 0,
                           "accepted_tokens": 0}

        start = time.perf_counter()
        logits, cache = self._prefill(
            self.params, jnp.asarray(prompt), jnp.asarray([len(prefix_ids)], jnp.int32), cache
        )
        while (
            len(generated) < max_generated_tokens
            and len(generated) + len(prefix_ids) < self.max_sequence_length
        ):
            rng, sub = jax.random.split(rng)
            if temperature == 0.0:
                tok = greedy_sampling(logits)
            else:
                tok = top_p_sampling(sub, logits, top_k, tp, temp)
            next_token = int(tok[0])
            generate_time.append(time.perf_counter() - start)
            start = time.perf_counter()

            generated.append(next_token)
            if next_token == self.eos_token_id:
                break

            response_text = process_response(tokenizer.decode(generated))
            if response_text and response_text[-1] != "�":
                yield response_text

            draft = None
            if speculate:
                from .speculative import find_draft

                # cache currently holds prefix + generated[:-1]
                cur_len = len(prefix_ids) + len(generated) - 1
                room = min(
                    self.max_sequence_length - cur_len - 1,
                    max_generated_tokens - len(generated),
                )
                # the verify step writes a FULL KT-wide KV window at
                # cur_len (ids are padded to KT): near the context end,
                # dynamic_update_slice would clamp the start and silently
                # overwrite valid KV — fall back to plain decode there
                if room >= 1 and cur_len + speculative_k + 1 <= self.max_sequence_length:
                    draft = find_draft(prefix_ids + generated,
                                       speculative_ngram,
                                       min(speculative_k, room))
            if draft:
                KT = speculative_k + 1
                seq = [next_token] + draft
                ids = np.zeros((1, KT), np.int32)
                ids[0, : len(seq)] = seq
                all_logits, cache = self._verify(
                    self.params, jnp.asarray(ids),
                    jnp.asarray([cur_len], jnp.int32),
                    jnp.asarray([len(seq)], jnp.int32), cache,
                )
                self.spec_stats["verify_steps"] += 1
                row_argmax = np.asarray(
                    jnp.argmax(all_logits[0, : len(seq)], axis=-1))
                from .speculative import greedy_accept

                accepted = greedy_accept(draft, [int(r) for r in row_argmax])
                if self.eos_token_id in draft[:accepted]:
                    # nothing after an accepted eos counts
                    accepted = draft[:accepted].index(self.eos_token_id) + 1
                stop = False
                for d in draft[:accepted]:
                    generated.append(d)
                    generate_time.append(time.perf_counter() - start)
                    start = time.perf_counter()
                    if d == self.eos_token_id:
                        stop = True
                        break
                    response_text = process_response(tokenizer.decode(generated))
                    if response_text and response_text[-1] != "�":
                        yield response_text
                self.spec_stats["accepted_tokens"] += accepted
                # keep t0 + accepted drafts; rejected positions' KV sits
                # above the length and is overwritten by later writes
                cache = cache.replace(
                    lengths=jnp.asarray([cur_len + 1 + accepted], jnp.int32))
                if stop:
                    break
                # row `accepted` is the model's distribution after the
                # accepted prefix — exactly the next greedy-decode logits
                logits = all_logits[:, accepted]
            else:
                logits, cache = self._decode(self.params, tok, cache)
                self.spec_stats["decode_steps"] += 1

        if self.time_log and generate_time:
            init_time, *rest_time = generate_time
            print("Decoder:")
            print(f"  len: {len(prefix_ids)}(prefix) + {len(generated)}(gen)")
            print(f" init: {init_time:.6f} s")
            print(f"  sum: {sum(generate_time):.6f} s")
            if rest_time:
                print(f"  gen: {len(rest_time) / sum(rest_time):.6f} tok/s")
            print(f"  avg: {len(generate_time) / sum(generate_time):.6f} tok/s")

        return process_response(tokenizer.decode(generated))
