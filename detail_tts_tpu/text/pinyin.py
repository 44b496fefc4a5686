"""Chinese text -> pinyin romanisation (host-side text frontend).

The reference converts Chinese text to TONE3 pinyin with neutral tone "5"
before BPE encoding (api.py:21, vqvae/dataset_24k.py:117):

    ' '.join(lazy_pinyin(text, style=Style.TONE3, neutral_tone_with_five=True))

When ``pypinyin`` is importable we call it with the exact reference
arguments.  Otherwise a BUNDLED table (text/pinyin_data.json, built by
scripts/build_pinyin_table.py: curated primaries + CLDR collation-order
propagation, ~7k chars + phrase overrides) reproduces the same behaviour:

* longest-match phrase lookup first (pypinyin PHRASES_DICT semantics),
  then per-char primary readings;
* runs of non-CJK characters stay verbatim as single items
  (pypinyin ``errors='default'``);
* CJK chars absent from the table also pass through verbatim (they BPE to
  [UNK], the same fate unknown symbols meet in the reference tokenizer).
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

try:  # optional dependency — exact reference behaviour when present
    from pypinyin import Style, lazy_pinyin  # type: ignore

    _HAVE_PYPINYIN = True
except Exception:  # pragma: no cover - environment without pypinyin
    _HAVE_PYPINYIN = False

_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")
_DATA_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "pinyin_data.json")
_TABLE: Optional[Tuple[Dict[str, str], Dict[str, list], int]] = None


def has_cjk(text: str) -> bool:
    return _CJK_RE.search(text) is not None


def _load_table() -> Tuple[Dict[str, str], Dict[str, list], int]:
    global _TABLE
    if _TABLE is None:
        with open(_DATA_PATH, encoding="utf-8") as f:
            data = json.load(f)
        phrases = data["phrases"]
        max_len = max((len(w) for w in phrases), default=1)
        _TABLE = (data["chars"], phrases, max_len)
    return _TABLE


def bundled_lazy_pinyin(text: str) -> List[str]:
    """``lazy_pinyin(text, TONE3, neutral_tone_with_five=True)`` from the
    bundled table: one item per hanzi (or per phrase syllable), one item
    per contiguous non-hanzi run."""
    chars, phrases, max_len = _load_table()
    out: List[str] = []
    other = []  # pending non-CJK run

    def flush():
        if other:
            out.append("".join(other))
            other.clear()

    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if not _CJK_RE.match(ch):
            other.append(ch)
            i += 1
            continue
        flush()
        matched = False
        for l in range(min(max_len, n - i), 1, -1):  # longest phrase first
            word = text[i : i + l]
            if word in phrases:
                out.extend(phrases[word])
                i += l
                matched = True
                break
        if not matched:
            out.append(chars.get(ch, ch))  # unknown hanzi passes through
            i += 1
    flush()
    return out


def to_pinyin(text: str) -> str:
    """Romanise ``text`` the way the reference does, with surrounding spaces."""
    if _HAVE_PYPINYIN:
        text = " ".join(lazy_pinyin(text, style=Style.TONE3,
                                    neutral_tone_with_five=True))
    elif has_cjk(text):
        text = " ".join(bundled_lazy_pinyin(text))
    return " " + text + " "


def coverage(text: str) -> Tuple[int, List[str]]:
    """(n_cjk_chars, unknown_chars) — diagnostic for the bundled table."""
    chars, phrases, _ = _load_table()
    cjk = [c for c in text if _CJK_RE.match(c)]
    in_phrase = set("".join(w for w in phrases))
    unknown = [c for c in cjk if c not in chars and c not in in_phrase]
    return len(cjk), unknown
