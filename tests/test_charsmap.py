"""Precompiled-charsmap normalization: builder↔parser round-trip, longest
match semantics, integration with the tokenizer pipeline, protoc varint
compatibility — and golden parity vs the real ``sentencepiece`` library /
ChatGLM2 model file whenever those are present (reference test style:
/root/reference/tests/test_tokenizer.py:7-43).
"""
import struct
from pathlib import Path

import pytest

from chatglm_q_tpu.tokenizer.charsmap import (
    PrecompiledCharsmap,
    build_charsmap,
    nfkc_mapping,
)
from chatglm_q_tpu.tokenizer.build import build_unigram_model
from chatglm_q_tpu.tokenizer.sp_core import SpTokenizer
from chatglm_q_tpu.tokenizer.sp_proto import parse_model, serialize_model


class TestCharsmapCore:
    def test_round_trip_simple(self):
        cm = PrecompiledCharsmap(build_charsmap({"Ａ": "A", "ｂ": "b", "…": "..."}))
        assert cm.normalize("Ａｂ…x") == "Ab...x"

    def test_longest_match_wins(self):
        cm = PrecompiledCharsmap(build_charsmap({"a": "Y", "ab": "X"}))
        assert cm.normalize("abc") == "Xc"
        assert cm.normalize("ac") == "Yc"
        assert cm.normalize("aab") == "YX"

    def test_no_match_passthrough(self):
        cm = PrecompiledCharsmap(build_charsmap({"q": "Q"}))
        assert cm.normalize("héllo 世界") == "héllo 世界"

    def test_replacement_to_empty(self):
        cm = PrecompiledCharsmap(build_charsmap({"­": ""}))  # soft hyphen
        assert cm.normalize("co­op") == "coop"

    def test_multibyte_source_sequences(self):
        # decomposed ガ (U+30AB + U+3099) → composed ガ (U+30AC)
        cm = PrecompiledCharsmap(build_charsmap({"ガ": "ガ"}))
        assert cm.normalize("ガキ") == "ガキ"
        assert cm.normalize("カキ") == "カキ"  # prefix alone untouched

    def test_shared_replacement_pool(self):
        blob = build_charsmap({"x": "same", "y": "same", "z": "other"})
        cm = PrecompiledCharsmap(blob)
        assert cm.normalize("xyz") == "samesameother"

    def test_large_mapping(self):
        # realistic size: full-width block + assorted NFKC folds
        mapping = nfkc_mapping(max_codepoint=0xFFFF)
        assert len(mapping) > 1000
        cm = PrecompiledCharsmap(build_charsmap(mapping))
        assert cm.normalize("Ｈｅｌｌｏ！　ﬁｎｅ²") == "Hello! fine2"

    def test_corrupt_blob_rejected(self):
        with pytest.raises(ValueError):
            PrecompiledCharsmap(b"\x01")
        with pytest.raises(ValueError):
            PrecompiledCharsmap(struct.pack("<I", 999) + b"abc")


class TestTokenizerIntegration:
    def test_normalize_applies_charsmap(self):
        model = build_unigram_model(
            ["hello", "world", WS_H := "▁hello"],
            charsmap={"Ｈ": "h", "ｅ": "e"},
        )
        tok = SpTokenizer(model)
        assert tok.normalize("Ｈｅllo") == tok.normalize("hello")
        assert tok.encode("Ｈｅllo") == tok.encode("hello")

    def test_charsmap_survives_serialization(self):
        model = build_unigram_model(["abc"], charsmap={"Ｘ": "x"})
        proto = parse_model(model)
        assert proto.precompiled_charsmap
        again = parse_model(serialize_model(proto))
        assert again.precompiled_charsmap == proto.precompiled_charsmap
        assert again.normalizer_name == proto.normalizer_name


class TestProtocVarintCompat:
    def test_protoc_negative_int32_parses(self):
        """protoc encodes pad_id=-1 as a 10-byte sign-extended varint."""
        def varint(v):
            v &= (1 << 64) - 1
            out = bytearray()
            while True:
                b = v & 0x7F
                v >>= 7
                out.append(b | (0x80 if v else 0))
                if not v:
                    return bytes(out)

        trainer = b"\x18" + varint(1)  # field 3 model_type=1
        trainer += varint(43 << 3) + varint(-1)  # field 43 pad_id=-1
        blob = bytes([0x12, len(trainer)]) + trainer  # field 2 TrainerSpec
        proto = parse_model(blob)
        assert proto.pad_id == -1

    def test_serialize_negative_round_trip(self):
        model = build_unigram_model(["x"])
        proto = parse_model(model)
        assert proto.pad_id == -1
        assert parse_model(serialize_model(proto)).pad_id == -1


# -- golden parity (auto-runs when the real library / model is available) ---

_REAL_MODELS = [
    p for p in [
        Path("/root/repo/models/chatglm2-6b/sentencepiece.model"),
        Path.home() / "models/chatglm2-6b/sentencepiece.model",
    ] if p.exists()
]

class TestGoldenVsSentencepiece:
    TEXTS = [
        "Hello, world!",
        "你好，世界。这是一个测试。",
        " leading and   internal   spaces ",
        "ＦＵＬＬｗｉｄｔｈ ｔｅｘｔ…",
        "mixed 中英文 with bytes \x07 and emoji 🎉",
        "[Round 1]\n\n问：你好\n\n答：",
    ]

    @pytest.fixture(params=_REAL_MODELS or [None])
    def model_path(self, request):
        if request.param is None:
            pytest.skip("no real sentencepiece.model on disk")
        return request.param

    @pytest.fixture
    def spm(self):
        return pytest.importorskip(
            "sentencepiece", reason="sentencepiece not installed"
        )

    def test_golden_ids(self, model_path, spm):
        sp = spm.SentencePieceProcessor()
        sp.Load(str(model_path))
        ours = SpTokenizer(model_path)
        for text in self.TEXTS:
            assert ours.encode(text) == sp.EncodeAsIds(text), text

    def test_whitespace_fidelity(self, model_path, spm):
        sp = spm.SentencePieceProcessor()
        sp.Load(str(model_path))
        ours = SpTokenizer(model_path)
        for text in ["a  b", "\tx", "a \n b"]:
            assert ours.decode(ours.encode(text)) == sp.DecodeIds(sp.EncodeAsIds(text))
