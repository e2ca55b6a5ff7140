"""Native (C++) tokenizer core vs the pure-Python oracle — exact id parity.

Skipped unless native/sptok/libsptok.so is built (make -C native/sptok).
"""
import random

import pytest

from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer, WS
from chatglm_q_tpu.tokenizer.build import build_unigram_model, build_bpe_model
from chatglm_q_tpu.tokenizer.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libsptok.so not built"
)


def _vocab():
    words = ["hello", "world", "tok", "en", "iz", "er", "中文", "分词", "测试"]
    vocab = {}
    for i, w in enumerate(words):
        vocab[WS + w] = -1.0 - i * 0.1
        vocab[w] = -2.0 - i * 0.1
    for c in "abcdefghijklmnopqrstuvwxyz中文分词测试":
        vocab[c] = -8.0
    vocab[WS] = -9.0
    return vocab, words


def test_unigram_exact_parity_fuzz():
    vocab, words = _vocab()
    model = build_unigram_model(vocab)
    py = SpTokenizer(model, use_native=False)
    nat = SpTokenizer(model, use_native=True)
    assert nat._native is not None
    rng = random.Random(0)
    for _ in range(200):
        t = " ".join(
            rng.choice(words + ["xyzzy", "日本", "é€", ""])
            for _ in range(rng.randint(1, 10))
        )
        assert py.encode(t) == nat.encode(t), repr(t)


def test_bpe_exact_parity():
    bpe = build_bpe_model(
        [WS + "hel", WS + "hell", WS + "hello", "lo", "ll"],
        alphabet=list("helo wxyz") + [WS],
    )
    py = SpTokenizer(bpe, use_native=False)
    nat = SpTokenizer(bpe, use_native=True)
    for t in ["hello hell", "hhheeello", "wxyz hello", "llll hello", "é"]:
        assert py.encode(t) == nat.encode(t), repr(t)
