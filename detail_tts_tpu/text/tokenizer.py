"""Text frontend: BPE tokenizer + pinyin romanisation.

Behavioural equivalent of the reference tokenizer
(bpe_tokenizers/voice_tokenizer.py:31-55): punctuation normalisation, spaces
mapped to the ``[SPACE]`` special token, HF ``tokenizers`` BPE vocab with
specials ``[STOP]/[UNK]/[SPACE]`` and vocab size 255.

Vocab files are *data assets* supplied by the user (the reference ships
en/jp/kr/zh vocabs); pass their path, or use :class:`CharTokenizer` (a
self-contained fallback covering the pinyin alphabet) when no vocab file is
available.
"""
from __future__ import annotations

import re
from typing import List, Sequence

_REPLACEMENTS = {
    "{": "(", "}": ")", "[": "(", "]": ")",
    "`": "'", "—": "-", "ʼ": "'",
}
_REPLACE_RE = re.compile("|".join(re.escape(k) for k in sorted(_REPLACEMENTS, key=len, reverse=True)), flags=re.DOTALL)
_EXTRANEOUS_RE = re.compile(r"^[@#%_=\$\^&\*\+\\]$")


def normalize_punctuation(txt: str) -> str:
    """Reference ``remove_extraneous_punctuation`` (voice_tokenizer.py:15-28)."""
    txt = _REPLACE_RE.sub(lambda m: _REPLACEMENTS[m.group(0)], txt)
    return _EXTRANEOUS_RE.sub("", txt)


class VoiceBpeTokenizer:
    """BPE tokenizer over a HF ``tokenizers`` vocab file."""

    def __init__(self, vocab_file: str):
        from tokenizers import Tokenizer  # lazy: host-side only

        self.tokenizer = Tokenizer.from_file(vocab_file)

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size()

    def encode(self, txt: str) -> List[int]:
        txt = normalize_punctuation(txt)
        txt = txt.replace(" ", "[SPACE]")
        return self.tokenizer.encode(txt).ids

    def decode(self, ids: Sequence[int]) -> str:
        txt = self.tokenizer.decode(list(ids), skip_special_tokens=False).replace(" ", "")
        for special in ("[STOP]", "[UNK]"):
            txt = txt.replace(special, "")
        return txt.replace("[SPACE]", " ")


class CharTokenizer:
    """Self-contained char-level fallback with the same special-token layout.

    IDs: 0=[STOP], 1=[UNK], 2=[SPACE]; then printable ASCII letters/digits/
    punctuation used by pinyin text.  Stays within the 256-token text
    embedding of the GPT (config_24k.json:70).
    """

    _ALPHABET = (
        "abcdefghijklmnopqrstuvwxyz0123456789"
        "!:~;.\"/,-()'?。，？：；’‘”“、！"
    )

    def __init__(self):
        self.stoi = {"[STOP]": 0, "[UNK]": 1, "[SPACE]": 2}
        for ch in self._ALPHABET:
            if ch not in self.stoi:
                self.stoi[ch] = len(self.stoi)
        self.itos = {v: k for k, v in self.stoi.items()}

    @property
    def vocab_size(self) -> int:
        return len(self.stoi)

    def encode(self, txt: str) -> List[int]:
        txt = normalize_punctuation(txt.lower())
        out = []
        for ch in txt:
            if ch == " ":
                out.append(2)
            else:
                out.append(self.stoi.get(ch, 1))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        parts = []
        for i in ids:
            tok = self.itos.get(int(i), "")
            if tok == "[SPACE]":
                parts.append(" ")
            elif tok in ("[STOP]", "[UNK]"):
                continue
            else:
                parts.append(tok)
        return "".join(parts)


def train_bpe(lines: Sequence[str], save_path: str, vocab_size: int = 255) -> None:
    """Train a compatible BPE vocab (reference ``train()``, voice_tokenizer.py:57)."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    trainer = BpeTrainer(special_tokens=["[STOP]", "[UNK]", "[SPACE]"], vocab_size=vocab_size)
    tokenizer = Tokenizer(BPE(unk_token="[UNK]"))
    tokenizer.pre_tokenizer = Whitespace()

    def iterator(batch: int = 1000):
        for i in range(0, len(lines), batch):
            yield [normalize_punctuation(t.lower()) for t in lines[i : i + batch]]

    tokenizer.train_from_iterator(iterator(), trainer, length=len(lines))
    tokenizer.save(save_path)
