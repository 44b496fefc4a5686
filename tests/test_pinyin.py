"""Bundled pinyin frontend (text/pinyin.py + text/pinyin_data.json).

The reference converts raw Chinese via ``pypinyin.lazy_pinyin(text,
Style.TONE3, neutral_tone_with_five=True)`` (api.py:21).  pypinyin is not
installable here, so the bundled table must carry the flagship zh path on
its own; when pypinyin IS present (other environments), the parity test
compares against it directly.
"""
import pytest

from detail_tts_tpu.text import pinyin as P

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below


GOLDENS = [
    # the reference's own demo sentence (api.py:14)
    ("大家好，今天来点大家想看的东西",
     "da4 jia1 hao3 ， jin1 tian1 lai2 dian3 da4 jia1 xiang3 kan4 de5 "
     "dong1 xi5"),
    # reference api.py:15 (place names)
    ("霞浦县衙城镇乌旗瓦窑村水位猛涨",
     "xia2 pu3 xian4 ya2 cheng2 zhen4 wu1 qi2 wa3 yao2 cun1 shui3 wei4 "
     "meng3 zhang3"),
    # reference api.py:17 (tongue twister: numbers)
    ("四是四，十是十，十四是十四，四十是四十",
     "si4 shi4 si4 ， shi2 shi4 shi2 ， shi2 si4 shi4 shi2 si4 ， si4 shi2 "
     "shi4 si4 shi2"),
    # polyphones: 长/重/乐/行/还
    ("校长在长城听音乐，银行还在行动",
     "xiao4 zhang3 zai4 chang2 cheng2 ting1 yin1 yue4 ， yin2 hang2 hai2 "
     "zai4 xing2 dong4"),
    # neutral tones
    ("我们的孩子喜欢漂亮的月亮",
     "wo3 men5 de5 hai2 zi5 xi3 huan5 piao4 liang5 de5 yue4 liang5"),
    # mixed CJK + latin + digits: non-CJK runs stay verbatim as one item
    ("今天是2024年的test日",
     "jin1 tian1 shi4 2024 nian2 de5 test ri4"),
]


def test_bundled_goldens():
    for text, expect in GOLDENS:
        got = " ".join(P.bundled_lazy_pinyin(text))
        assert got == expect, (text, got)


def test_to_pinyin_wraps_spaces_and_passes_noncjk():
    out = P.to_pinyin("ni3 hao3")
    assert out == " ni3 hao3 "
    if not P._HAVE_PYPINYIN:
        assert P.to_pinyin("你好") == " ni3 hao3 "


def test_unknown_hanzi_passes_through():
    # an intentionally obscure char absent from the table passes verbatim
    # (BPEs to [UNK]) instead of raising
    items = P.bundled_lazy_pinyin("好㐀好")
    assert items[0] == "hao3" and items[-1] == "hao3"
    assert len(items) == 3


def test_table_size_and_wellformedness():
    chars, phrases, max_len = P._load_table()
    import re

    assert len(chars) > 6000, len(chars)
    assert len(phrases) > 300
    for ch, py in list(chars.items())[:2000]:
        assert re.fullmatch(r"[a-z]+[1-5]", py) or P._CJK_RE.match(py) is None
    for w, pys in phrases.items():
        assert len(w) == len(pys)
        for py in pys:
            assert re.fullmatch(r"[a-z]+[1-5]", py), (w, py)
    assert max_len >= 3  # 3-char phrases (e.g. 为什么) present


def test_phrase_longest_match_wins():
    # 只 primary is zhi1, but 只有 -> zhi3 you3 via the phrase table
    assert P.bundled_lazy_pinyin("只有") == ["zhi3", "you3"]
    assert P.bundled_lazy_pinyin("一只") == ["yi4", "zhi1"]


@pytest.mark.skipif(not P._HAVE_PYPINYIN, reason="pypinyin not installed")
def test_parity_vs_pypinyin():
    from pypinyin import Style, lazy_pinyin

    agree = total = 0
    for text, _ in GOLDENS:
        ref = lazy_pinyin(text, style=Style.TONE3,
                          neutral_tone_with_five=True)
        got = P.bundled_lazy_pinyin(text)
        total += len(ref)
        agree += sum(a == b for a, b in zip(ref, got))
    assert agree / total >= 0.97, (agree, total)


@pytest.mark.slow  # ~2-4 min: builds a serving engine / jits the extraction program
def test_engine_synthesizes_raw_chinese():
    """The flagship use case end-to-end in THIS environment: raw Chinese
    text (no pypinyin available) through the serving engine."""
    import jax
    import numpy as np

    from detail_tts_tpu.config import small_test_config
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    eng = random_engine(small_test_config(), engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(32,), prompt_buckets=(32,),
        code_buckets=(8,)), fast=True)
    prompt = np.random.default_rng(0).uniform(-0.3, 0.3, 24000).astype(
        np.float32)
    wav = eng.synthesize_vq_batch(["大家好，今天来点大家想看的东西"], [prompt],
                                  rng=jax.random.PRNGKey(0))[0]
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()


def test_tokenizer_roundtrip_on_pinyin_output():
    """The flagship zh path: raw Chinese -> bundled pinyin -> reference zh
    BPE vocab encodes without falling apart."""
    from detail_tts_tpu.text.tokenizer import make_tokenizer

    tok = make_tokenizer("zh")
    ids = tok.encode(P.to_pinyin("大家好，今天来点大家想看的东西"))
    assert len(ids) > 10
    decoded = tok.decode(ids)
    assert "jin1" in decoded.replace("[SPACE]", " ")
