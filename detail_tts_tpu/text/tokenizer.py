"""Text frontend: BPE tokenizer + pinyin romanisation.

Behavioural equivalent of the reference tokenizer
(bpe_tokenizers/voice_tokenizer.py:31-55): punctuation normalisation, spaces
mapped to the ``[SPACE]`` special token, HF ``tokenizers`` BPE vocab with
specials ``[STOP]/[UNK]/[SPACE]`` and vocab size 255.

The four reference vocabs (zh/en/jp/kr, ~8 KB JSON data tables like the
config) are bundled under ``detail_tts_tpu/text/vocabs/`` and resolved by
:func:`resolve_vocab`, so tokenization matches the reference out of the box.
:class:`CharTokenizer` is an explicit opt-in fallback (``vocab="char"``) —
it is a *different* text frontend and is never substituted silently.
"""
from __future__ import annotations

import os
import re
from typing import List, Sequence

_VOCAB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vocabs")
BUNDLED_VOCABS = ("zh", "en", "jp", "kr")


def resolve_vocab(path: str) -> str:
    """Resolve a tokenizer vocab spec to a real file path.

    Accepts (in priority order): an existing file path; a bundled language
    code (``"zh"``/``"en"``/``"jp"``/``"kr"``); any path whose basename
    matches a bundled vocab (so the reference config's
    ``bpe_tokenizers/zh_tokenizer.json`` resolves without the reference
    checkout).  Raises ``FileNotFoundError`` otherwise — never silently
    substitutes a different tokenizer.
    """
    if os.path.isfile(path):
        return path
    if path in BUNDLED_VOCABS:
        return os.path.join(_VOCAB_DIR, f"{path}_tokenizer.json")
    bundled = os.path.join(_VOCAB_DIR, os.path.basename(path))
    if os.path.isfile(bundled):
        return bundled
    raise FileNotFoundError(
        f"tokenizer vocab {path!r} not found (bundled: {BUNDLED_VOCABS}; "
        f"pass 'char' for the explicit CharTokenizer fallback)")


def make_tokenizer(spec: str):
    """Build the tokenizer for a config ``tokenizer_vocab`` spec.

    ``"char"`` explicitly selects :class:`CharTokenizer`; anything else goes
    through :func:`resolve_vocab` and must resolve to a real vocab file.
    """
    if spec == "char":
        return CharTokenizer()
    return VoiceBpeTokenizer(resolve_vocab(spec))

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
