"""Chinese text -> pinyin romanisation (host-side text frontend).

The reference converts Chinese text to TONE3 pinyin with neutral tone "5"
before BPE encoding (api.py:21, vqvae/dataset_24k.py:117):

    ' '.join(lazy_pinyin(text, style=Style.TONE3, neutral_tone_with_five=True))

``pypinyin`` is an optional dependency here: when present we call it with the
exact reference arguments; otherwise non-CJK text passes through unchanged
and CJK input raises a clear error telling the user to install pypinyin.
"""
from __future__ import annotations

import re

try:  # optional dependency
    from pypinyin import Style, lazy_pinyin  # type: ignore

    _HAVE_PYPINYIN = True
except Exception:  # pragma: no cover - environment without pypinyin
    _HAVE_PYPINYIN = False

_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def has_cjk(text: str) -> bool:
    return _CJK_RE.search(text) is not None


def to_pinyin(text: str) -> str:
    """Romanise ``text`` the way the reference does, with surrounding spaces."""
    if _HAVE_PYPINYIN:
        text = " ".join(lazy_pinyin(text, style=Style.TONE3, neutral_tone_with_five=True))
    elif has_cjk(text):
        raise RuntimeError(
            "Input contains CJK characters but pypinyin is not installed; "
            "install pypinyin or supply pre-romanised (TONE3 pinyin) text."
        )
    return " " + text + " "
