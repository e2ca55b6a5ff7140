"""ChatGLM2 tokenizer: sentencepiece model + 5 appended special tokens.

Behavioral re-creation of /root/reference/chatglm_q/tokenizer.py:25-144 on
top of the self-contained SpTokenizer core (no ``sentencepiece`` runtime
dependency): the specials ``[MASK] [gMASK] [sMASK] <sop> <eop>`` get ids
after the sp vocab, ``encode`` prepends ``[gMASK] <sop>`` and appends
``</s>`` after a text pair, ``decode`` drops ids ≥ the sp vocab size, and
the batch ``__call__`` supports left (default) / right padding, truncation,
numpy/jax tensors, and −100-masked labels.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Literal, Union

import numpy as np

from .sp_core import SpTokenizer


class BatchEncoding(dict):
    """dict with attribute access (tokenizer.py:8-22); arrays are numpy or
    jax — ``.to(device)`` is replaced by jax.device_put at the call site."""

    def __getattr__(self, item: str):
        try:
            return self[item]
        except KeyError:
            raise AttributeError(item)

    def __setattr__(self, item: str, value: Any):
        self[item] = value


class ChatGLM2Tokenizer:
    def __init__(self, vocab_file: Union[str, Path, bytes]):
        assert vocab_file is not None
        self.vocab_file = vocab_file
        self.special_tokens = ["[MASK]", "[gMASK]", "[sMASK]", "<sop>", "<eop>"]
        self.text_tokenizer = SpTokenizer(vocab_file)
        self.vocab_size = len(self.text_tokenizer) + len(self.special_tokens)
        self.true_vocab_size = len(self.text_tokenizer)

        self.bos_id: int = self.text_tokenizer.bos_id()
        self.eos_id: int = self.text_tokenizer.eos_id()
        self.pad_id: int = self.text_tokenizer.unk_id()

    def __len__(self):
        return self.vocab_size

    def __getitem__(self, key: str) -> int:
        if key in self.special_tokens:
            return self.true_vocab_size + self.special_tokens.index(key)
        return self.text_tokenizer[key]

    def encode(self, text: str, text_pair: str = None, add_special_tokens=True) -> list[int]:
        """[gMASK] <sop> prefix; </s> after text_pair (tokenizer.py:46-64)."""
        tokens = self.text_tokenizer.encode(text)
        if add_special_tokens:
            tokens = [self["[gMASK]"], self["<sop>"]] + tokens
        if text_pair is not None:
            tokens += self.text_tokenizer.encode(text_pair)
            if add_special_tokens:
                tokens += [self.eos_id]
        return tokens

    def decode(self, text_ids: list[int]) -> str:
        text_ids = [x for x in text_ids if x < self.true_vocab_size]
        return self.text_tokenizer.decode(text_ids)

    def __call__(
        self,
        text: Union[str, list[str]],
        text_pair: Union[str, list[str]] = None,
        add_special_tokens=True,
        padding: Literal[True, False, "left", "right"] = False,
        max_length: int = None,
        return_tensors: Literal[False, "np", "jax"] = False,
        return_labels=False,
    ) -> BatchEncoding:
        if isinstance(text, str):
            text = [text]
        if isinstance(text_pair, str):
            text_pair = [text_pair]
        if text_pair is None:
            text_pair = [None] * len(text)
        assert len(text) == len(text_pair)

        input_ids = [self.encode(t, tp, add_special_tokens) for t, tp in zip(text, text_pair)]
        attention_mask = [[1] * len(ids) for ids in input_ids]
        position_ids = [list(range(len(ids))) for ids in input_ids]

        if max_length:
            for i in range(len(input_ids)):
                input_ids[i] = input_ids[i][:max_length]
                attention_mask[i] = attention_mask[i][:max_length]
                position_ids[i] = position_ids[i][:max_length]

        max_seq_length = max(len(ids) for ids in input_ids)
        if padding == "right":
            for i in range(len(input_ids)):
                pad = max_seq_length - len(input_ids[i])
                input_ids[i] = input_ids[i] + pad * [self.pad_id]
                attention_mask[i] = attention_mask[i] + pad * [0]
                position_ids[i] = position_ids[i] + pad * [0]
        elif padding == "left" or padding is True:
            for i in range(len(input_ids)):
                pad = max_seq_length - len(input_ids[i])
                input_ids[i] = pad * [self.pad_id] + input_ids[i]
                attention_mask[i] = pad * [0] + attention_mask[i]
                position_ids[i] = pad * [0] + position_ids[i]
        else:
            assert not return_tensors, "set padding=True when return_tensors"

        if return_tensors:
            input_ids = np.asarray(input_ids, dtype=np.int64)
            attention_mask = np.asarray(attention_mask, dtype=np.int64)
            position_ids = np.asarray(position_ids, dtype=np.int64)
            if return_tensors == "jax":
                import jax.numpy as jnp

                input_ids = jnp.asarray(input_ids)
                attention_mask = jnp.asarray(attention_mask)
                position_ids = jnp.asarray(position_ids)

        inputs = BatchEncoding(
            input_ids=input_ids,
            attention_mask=attention_mask,
            position_ids=position_ids,
        )
        if return_labels:
            assert return_tensors, "'return_labels' requires return_tensors"
            labels = np.where(np.asarray(attention_mask).astype(bool),
                              np.asarray(input_ids), -100)
            if return_tensors == "jax":
                import jax.numpy as jnp

                labels = jnp.asarray(labels)
            inputs["labels"] = labels
        return inputs
