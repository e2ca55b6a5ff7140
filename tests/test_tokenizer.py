"""Tokenizer tests: protobuf round-trip, unigram/BPE encoding, ChatGLM2
special-token behavior, batch padding/labels.

The reference's tokenizer tests require the real 6B sentencepiece model on
disk (/root/reference/tests/test_tokenizer.py:7-9); here small models are
built hermetically (tokenizer/build.py) and, when the ``sentencepiece``
library is installed, cross-checked against it.
"""
import numpy as np
import pytest

from chatglm_q_tpu.tokenizer.sp_proto import parse_model, serialize_model
from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer, WS
from chatglm_q_tpu.tokenizer.build import build_unigram_model, build_bpe_model
from chatglm_q_tpu.tokenizer import ChatGLM2Tokenizer


@pytest.fixture(scope="module")
def uni_model():
    vocab = {
        WS + "hello": -1.0,
        WS + "world": -1.5,
        WS + "hell": -3.0,
        "o": -4.0,
        "l": -4.5,
        "he": -5.0,
        WS: -6.0,
        "h": -7.0, "e": -7.0, "w": -7.0, "r": -7.0, "d": -7.0,
    }
    return build_unigram_model(vocab)


def test_proto_roundtrip(uni_model):
    m = parse_model(uni_model)
    data2 = serialize_model(m)
    m2 = parse_model(data2)
    assert [p.piece for p in m.pieces] == [p.piece for p in m2.pieces]
    assert [p.score for p in m.pieces] == [p.score for p in m2.pieces]
    assert m2.model_type == m.model_type
    assert m2.byte_fallback == m.byte_fallback


def test_unigram_viterbi_picks_best_path(uni_model):
    tok = SpTokenizer(uni_model)
    ids = tok.encode("hello world")
    pieces = [tok.id_to_piece(i) for i in ids]
    assert pieces == [WS + "hello", WS + "world"]
    # "hell" + "o" scores -3 + -4 = -7 < -1 for "hello": viterbi prefers whole


def test_unigram_byte_fallback(uni_model):
    tok = SpTokenizer(uni_model)
    ids = tok.encode("hello é")  # é not in vocab → utf-8 bytes 0xC3 0xA9
    pieces = [tok.id_to_piece(i) for i in ids]
    assert "<0xC3>" in pieces and "<0xA9>" in pieces
    assert tok.decode(ids) == "hello é"


def test_unigram_decode_roundtrip(uni_model):
    tok = SpTokenizer(uni_model)
    for text in ["hello world", "hello hell world", "world  world"]:
        out = tok.decode(tok.encode(text))
        # remove_extra_whitespaces collapses double spaces
        assert out == " ".join(text.split())


def test_bpe_merge_order():
    # merges: "ab" then "abc": encoding "abc" → single piece "abc"
    model = build_bpe_model(["ab", "abc"], alphabet=list("abc") + [WS], add_dummy_prefix=False)
    tok = SpTokenizer(model)
    ids = tok.encode("abc")
    assert [tok.id_to_piece(i) for i in ids] == ["abc"]
    ids = tok.encode("acab")
    assert [tok.id_to_piece(i) for i in ids] == ["a", "c", "ab"]


def test_bpe_ws_handling():
    model = build_bpe_model(
        [WS + "ab", "ab"], alphabet=list("ab") + [WS], add_dummy_prefix=True
    )
    tok = SpTokenizer(model)
    ids = tok.encode("ab ab")
    assert [tok.id_to_piece(i) for i in ids] == [WS + "ab", WS + "ab"]


@pytest.fixture(scope="module")
def glm_tok(uni_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("tok") / "sentencepiece.model"
    path.write_bytes(uni_model)
    return ChatGLM2Tokenizer(path)


class TestChatGLM2Tokenizer:
    def test_special_token_ids(self, glm_tok):
        base = glm_tok.true_vocab_size
        assert glm_tok["[MASK]"] == base
        assert glm_tok["[gMASK]"] == base + 1
        assert glm_tok["<sop>"] == base + 3
        assert len(glm_tok) == base + 5

    def test_encode_prepends_gmask_sop(self, glm_tok):
        ids = glm_tok.encode("hello")
        assert ids[:2] == [glm_tok["[gMASK]"], glm_tok["<sop>"]]

    def test_encode_pair_appends_eos(self, glm_tok):
        ids = glm_tok.encode("hello", "world")
        assert ids[-1] == glm_tok.eos_id

    def test_decode_filters_specials(self, glm_tok):
        ids = glm_tok.encode("hello world")
        assert glm_tok.decode(ids) == "hello world"

    def test_batch_left_padding(self, glm_tok):
        batch = glm_tok(["hello", "hello world"], padding=True, return_tensors="np")
        assert batch.input_ids.shape == batch.attention_mask.shape
        # left padding: first row starts with pad
        row0_pads = (batch.attention_mask[0] == 0).sum()
        assert row0_pads > 0
        assert batch.attention_mask[0][0] == 0  # padded on the left
        assert batch.attention_mask[1].all()

    def test_batch_right_padding_and_labels(self, glm_tok):
        batch = glm_tok(
            ["hello", "hello world"], padding="right",
            return_tensors="np", return_labels=True,
        )
        assert batch.attention_mask[0][-1] == 0
        assert (batch.labels[batch.attention_mask == 0] == -100).all()
        assert (batch.labels[batch.attention_mask == 1] >= 0).all()

    def test_max_length_truncation(self, glm_tok):
        batch = glm_tok(["hello world hello world"], padding=True,
                        max_length=3, return_tensors="np")
        assert batch.input_ids.shape[1] == 3


def _real_sentencepiece():
    try:
        import sentencepiece as spm

        return None if getattr(spm, "_is_shim", False) else spm
    except ImportError:
        return None


@pytest.mark.skipif(_real_sentencepiece() is None, reason="sentencepiece not installed")
def test_cross_check_against_sentencepiece(uni_model, tmp_path):
    spm = _real_sentencepiece()

    path = tmp_path / "m.model"
    path.write_bytes(uni_model)
    sp = spm.SentencePieceProcessor(str(path))
    ours = SpTokenizer(uni_model)
    for text in ["hello world", "hello hell", "é hello"]:
        assert ours.encode(text) == sp.encode(text), text


def test_bpe_control_piece_not_injectable():
    """Raw text spelling a CONTROL piece must NOT produce its reserved id
    (sentencepiece restricts matching to NORMAL/USER_DEFINED/UNUSED)."""
    from chatglm_q_tpu.tokenizer.sp_proto import (
        SentencePieceEntry, SpModelProto, PIECE_CONTROL, MODEL_BPE)
    from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer

    pieces = [SentencePieceEntry("<unk>", 0.0, 2),
              SentencePieceEntry("</s>", 0.0, PIECE_CONTROL)]
    for ch in "</s>":
        if not any(p.piece == ch for p in pieces):
            pieces.append(SentencePieceEntry(ch, -1.0))
    m = SpModelProto(pieces=pieces, model_type=MODEL_BPE, unk_id=0,
                     bos_id=-1, eos_id=1, pad_id=-1,
                     add_dummy_prefix=False, escape_whitespaces=False)
    tok = SpTokenizer(m, use_native=False)
    eos = tok.piece_to_id("</s>")
    ids = tok.encode("</s>")
    assert eos not in ids, (ids, eos)
    assert tok.decode(ids) == "</s>"


def test_bpe_unused_piece_resegments():
    """A merged symbol whose piece is UNUSED must resegment into its merge
    constituents (spm bpe_model semantics), not single characters."""
    from chatglm_q_tpu.tokenizer.sp_proto import (
        SentencePieceEntry, SpModelProto, PIECE_UNUSED, MODEL_BPE)
    from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer

    pieces = [SentencePieceEntry("<unk>", 0.0, 2),
              SentencePieceEntry("ab", -1.0),
              SentencePieceEntry("abc", -0.5, PIECE_UNUSED),  # best merge
              SentencePieceEntry("a", -10.0),
              SentencePieceEntry("b", -10.0),
              SentencePieceEntry("c", -10.0)]
    m = SpModelProto(pieces=pieces, model_type=MODEL_BPE, unk_id=0,
                     bos_id=-1, eos_id=-1, pad_id=-1,
                     add_dummy_prefix=False, escape_whitespaces=False)
    tok = SpTokenizer(m, use_native=False)
    # merges: ab+c -> abc (unused) -> resegment to its constituents [ab, c]
    assert tok.encode("abc") == [tok.piece_to_id("ab"), tok.piece_to_id("c")]
    # decode of an UNUSED id keeps its surface (spm only excludes it from
    # encoding)
    assert tok.decode([2]) == "abc"


def test_charsmap_no_false_trie_descent():
    """Builder regression: nodes sharing a double-array base made traversal
    descend into unrelated subtrees (falsely matching unmapped inputs)."""
    from chatglm_q_tpu.tokenizer.charsmap import (
        build_charsmap, PrecompiledCharsmap, nfkc_mapping)

    mp = nfkc_mapping(0x33FF)  # wide enough to force base contention
    cm = PrecompiledCharsmap(build_charsmap(mp))
    bad = [cp for cp in range(0x20, 0x3400)
           if not (0xD800 <= cp <= 0xDFFF)
           and cm.normalize(chr(cp)) != mp.get(chr(cp), chr(cp))]
    assert not bad, [hex(b) for b in bad[:10]]
