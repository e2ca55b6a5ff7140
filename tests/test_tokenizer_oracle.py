"""From-scratch tokenizer vs an INDEPENDENT implementation (VERDICT r2 #6).

The real chatglm2 ``sentencepiece.model`` and the sentencepiece C++ library
are both absent in this environment, so golden-id equivalence is proven
against the next-best independent oracle that IS available: HuggingFace
``tokenizers`` (Rust) —

* ``tokenizers.models.Unigram`` — an independent spm-compatible Viterbi
  segmenter (byte fallback included), fed the same vocab/scores;
* ``tokenizers.normalizers.Precompiled`` — an independent implementation
  (the ``spm_precompiled`` crate) of sentencepiece's precompiled-charsmap
  binary format, fed OUR builder's blob.

Pipeline mirroring (spm → tokenizers): sentencepiece normalizes with the
charsmap, applies ``remove_extra_whitespaces`` (strip + collapse U+0020
runs), prepends the dummy prefix, and escapes spaces to U+2581 before the
Unigram Viterbi (reference tokenizer.py:29-44 relies on all of these via
the spm defaults baked into the chatglm2 model).  On the tokenizers side
that is a normalizer Sequence ending in ``Prepend("▁"), Replace(" ", "▁")``.

Known oracle divergence (verified, documented in the spm_precompiled
README): the Rust crate iterates grapheme clusters and DROPS a combining
mark whose base character has a charsmap transformation ('㈧̉' → '(八)'
instead of '(八)̉').  Real sentencepiece — like our implementation — does
pure byte-trie longest-match at each position, which equals true NFKC
(cross-checked against ``unicodedata.normalize`` as a third source in
``test_charsmap_grapheme_quirk_ours_matches_true_nfkc``).  The fuzz
comparisons therefore exclude combining marks from the pool; the quirk
test pins the divergence so an oracle upgrade that fixes it is noticed.
"""
import random
import sys
import unicodedata

import pytest

from chatglm_q_tpu.tokenizer.build import build_unigram_model
from chatglm_q_tpu.tokenizer.charsmap import (PrecompiledCharsmap,
                                              build_charsmap, nfkc_mapping)
from chatglm_q_tpu.tokenizer.native import native_available
from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer, WS
from chatglm_q_tpu.tokenizer.sp_proto import parse_model

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Regex, Tokenizer  # noqa: E402
from tokenizers import normalizers as TN  # noqa: E402
from tokenizers.models import Unigram  # noqa: E402

WORDS = [
    "hello", "world", "the", "quick", "brown", "fox", "中文", "分词",
    "测试", "日本語", "トーク", "ナイザ", "русский", "текст", "مرحبا",
    "에요", "하세요", "tok", "en", "iz", "er", "问", "答", "你好",
]


def _vocab():
    vocab = {}
    for i, w in enumerate(WORDS):
        vocab[WS + w] = -1.0 - i * 0.05
        vocab[w] = -2.0 - i * 0.05
    for c in set("".join(WORDS)) | set("abcdefghijklmnopqrstuvwxyz[]()1:\n"):
        vocab[c] = -8.0
        vocab[WS + c] = -8.5
    vocab[WS] = -9.0
    return vocab


def _hf_from_proto(model_bytes: bytes, charsmap_blob: bytes = None):
    """Build the tokenizers-side equivalent of an spm unigram model."""
    proto = parse_model(model_bytes)
    hf = Tokenizer(Unigram([(p.piece, p.score) for p in proto.pieces],
                           proto.unk_id, proto.byte_fallback))
    steps = []
    if charsmap_blob:
        steps.append(TN.Precompiled(charsmap_blob))
    if proto.remove_extra_whitespaces:
        steps += [TN.Replace(Regex(" {2,}"), " "),
                  TN.Replace(Regex("^ "), ""),
                  TN.Replace(Regex(" $"), "")]
    if proto.add_dummy_prefix:
        steps.append(TN.Prepend(WS))
    steps.append(TN.Replace(" ", WS))
    hf.normalizer = TN.Sequence(steps)
    return hf


def _fuzz_texts(rng, n):
    pool = WORDS + ["xyzzy", "É€", "¤", "👍", "\t", "ab中", " ", "[Round 1]"]
    texts = [
        "hello world", "中文分词测试", "héllo wörld", "مرحبا हिन्दी",
        "  double  spaces ", "emoji 🎉 bytes", "русский текст 日本語",
        "[Round 1]\n\n问：你好\n\n答：",
    ]
    for _ in range(n):
        texts.append("".join(rng.choice(pool)
                             for _ in range(rng.randint(0, 12))))
    return texts


def _assert_ids_match(ours, hf, texts):
    ws_id = ours.piece_to_id(WS)
    for t in texts:
        norm = hf.normalizer.normalize_str(t)
        if norm in ("", WS):
            # all-whitespace input: spm emits nothing or the bare prefix
            assert ours.encode(t) in ([], [ws_id]), repr(t)
            continue
        a = ours.encode(t)
        b = hf.encode(t).ids
        assert a == b, (
            f"{t!r}\nours: {[ours.id_to_piece(i) for i in a]}\n"
            f"hf:   {[hf.id_to_token(i) for i in b]}")


def test_unigram_ids_match_hf_rust_oracle():
    model = build_unigram_model(_vocab())
    ours = SpTokenizer(model, use_native=False)
    hf = _hf_from_proto(model)
    _assert_ids_match(ours, hf, _fuzz_texts(random.Random(42), 400))


@pytest.mark.skipif(not native_available(), reason="libsptok.so not built")
def test_unigram_native_ids_match_hf_rust_oracle():
    model = build_unigram_model(_vocab())
    ours = SpTokenizer(model, use_native=True)
    assert ours._native is not None
    hf = _hf_from_proto(model)
    _assert_ids_match(ours, hf, _fuzz_texts(random.Random(43), 400))


def test_pinned_golden_ids():
    """Frozen expected segmentations: guard BOTH our encoder and the oracle
    recipe against silent drift."""
    model = build_unigram_model(_vocab())
    ours = SpTokenizer(model, use_native=False)

    def pieces(text):
        return [ours.id_to_piece(i) for i in ours.encode(text)]

    assert pieces("hello world") == [WS + "hello", WS + "world"]
    assert pieces("中文分词测试") == [WS + "中文", "分词", "测试"]
    assert pieces("the quick brown fox") == [
        WS + "the", WS + "quick", WS + "brown", WS + "fox"]
    # é is unseen → utf-8 byte fallback
    assert pieces("é") == [WS, "<0xC3>", "<0xA9>"]
    # extra whitespace removal: leading/trailing/runs of U+0020 vanish
    assert ours.encode("  hello   world ") == ours.encode("hello world")


# --- charsmap vs the independent Rust Precompiled implementation ----------

@pytest.fixture(scope="module")
def nfkc_blob():
    return build_charsmap(nfkc_mapping(0xFFFF))


def test_charsmap_every_bmp_char_matches_rust(nfkc_blob):
    """Exhaustive single-codepoint BMP sweep: our trie walker and the Rust
    crate agree on every standalone character."""
    ours = PrecompiledCharsmap(nfkc_blob)
    hf = TN.Precompiled(nfkc_blob)
    bad = []
    for cp in range(0x20, 0x10000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        if ours.normalize(ch) != hf.normalize_str(ch):
            bad.append(cp)
    assert not bad, [hex(c) for c in bad[:20]]


def test_charsmap_multichar_fuzz_matches_rust(nfkc_blob):
    ours = PrecompiledCharsmap(nfkc_blob)
    hf = TN.Precompiled(nfkc_blob)
    rng = random.Random(7)
    pool = []
    while len(pool) < 4000:
        cp = rng.randrange(0x20, 0xFFF0)
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        if unicodedata.combining(ch):
            continue  # known oracle grapheme quirk — see module docstring
        pool.append(ch)
    for _ in range(2000):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 24)))
        assert ours.normalize(s) == hf.normalize_str(s), repr(s)


def test_charsmap_grapheme_quirk_ours_matches_true_nfkc(nfkc_blob):
    """Where the Rust oracle diverges (combining mark after a mapped base),
    OUR output is the correct one — it equals unicodedata NFKC, which is
    what real sentencepiece's byte-trie longest-match also produces."""
    ours = PrecompiledCharsmap(nfkc_blob)
    hf = TN.Precompiled(nfkc_blob)
    for s, want in [("㈧̉", "(八)̉"),
                    ("ℤٕ", "Zٕ"),
                    ("ａֵ", "aֵ")]:
        assert ours.normalize(s) == unicodedata.normalize("NFKC", s) == want
        assert hf.normalize_str(s) == want.rstrip(
            "ֵٕ̉")  # oracle drops the mark (known quirk)


# --- the full chatglm2-featured pipeline -----------------------------------

def test_full_pipeline_with_charsmap_matches_hf(nfkc_blob):
    """Unigram + byte fallback + dummy prefix + extra-whitespace removal +
    NFKC precompiled charsmap — every spm feature the chatglm2 model uses
    (reference tokenizer.py:29-44) — in ONE model, cross-checked end to end."""
    model = build_unigram_model(_vocab(), charsmap=nfkc_mapping(0xFFFF))
    ours = SpTokenizer(model, use_native=False)
    hf = _hf_from_proto(model, charsmap_blob=nfkc_blob)
    texts = _fuzz_texts(random.Random(44), 200) + [
        "ＦＵＬＬｗｉｄｔｈ　ｔｅｘｔ…",   # NFKC folds width + ideographic space
        "①②③ Ⅷ ㎞ ㈱",
        "ﬁﬂ ǅ ŉ",
    ]
    _assert_ids_match(ours, hf, texts)


@pytest.mark.skipif(not native_available(), reason="libsptok.so not built")
def test_full_pipeline_native_matches_hf(nfkc_blob):
    """The C++ core through the same full chatglm2-featured pipeline
    (NFKC charsmap + unigram + byte fallback + dummy prefix + whitespace
    removal) — exact ids vs the Rust oracle."""
    model = build_unigram_model(_vocab(), charsmap=nfkc_mapping(0xFFFF))
    ours = SpTokenizer(model, use_native=True)
    assert ours._native is not None
    hf = _hf_from_proto(model, charsmap_blob=nfkc_blob)
    _assert_ids_match(ours, hf, _fuzz_texts(random.Random(45), 200) + [
        "ＦＵＬＬｗｉｄｔｈ　ｔｅｘｔ…", "①②③ Ⅷ ㎞ ㈱", "ﬁﬂ ǅ ŉ",
    ])
