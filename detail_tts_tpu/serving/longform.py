"""Long-form synthesis: sentence chunking with prompt reuse.

The reference bounds context instead of scaling it (SURVEY.md §5: GPT ctx
2402 tokens, generation cap 600 codes ~= 25.6 s) and never implements
long-form synthesis.  This module provides the application-level answer the
bounded-context design implies: split text at sentence punctuation, batch
the chunks through the engine with the SAME voice prompt (zero-shot prompt
reuse keeps the speaker consistent), and concatenate with short crossfades.
"""
from __future__ import annotations

import re
from typing import List, Optional, Sequence

import numpy as np

_SENT_SPLIT = re.compile(r"(?<=[。！？!?；;.])\s*")


def split_sentences(text: str, max_chars: int = 120) -> List[str]:
    """Split on sentence punctuation; re-chunk over-long pieces on commas."""
    parts = [p.strip() for p in _SENT_SPLIT.split(text) if p.strip()]
    out: List[str] = []
    for p in parts:
        while len(p) > max_chars:
            cut = max((p.rfind(c, 0, max_chars) for c in "，,、 "),
                      default=-1)
            if cut <= 0:
                cut = max_chars
            out.append(p[:cut].strip())
            p = p[cut:].lstrip("，,、 ").strip()
        if p:
            out.append(p)
    return out


def crossfade_concat(wavs: Sequence[np.ndarray], sr: int,
                     fade_ms: float = 20.0) -> np.ndarray:
    """Concatenate with equal-power crossfades."""
    fade = max(int(sr * fade_ms / 1000.0), 1)
    out = np.asarray(wavs[0], np.float32)
    for w in wavs[1:]:
        w = np.asarray(w, np.float32)
        n = min(fade, len(out), len(w))
        if n > 0:
            t = np.linspace(0.0, np.pi / 2, n, dtype=np.float32)
            out_tail = out[-n:] * np.cos(t) ** 2 + w[:n] * np.sin(t) ** 2
            out = np.concatenate([out[:-n], out_tail, w[n:]])
        else:
            out = np.concatenate([out, w])
    return out


def synthesize_long(engine, text: str, prompt_wav: np.ndarray,
                    rng=None, batch_size: int = 8,
                    max_chars: int = 120, fade_ms: float = 20.0,
                    vq_only: bool = False) -> np.ndarray:
    """Synthesize arbitrarily long text through the bounded-context engine."""
    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    chunks = split_sentences(text, max_chars=max_chars)
    if not chunks:
        return np.zeros((0,), np.float32)
    wavs: List[np.ndarray] = []
    for i in range(0, len(chunks), batch_size):
        group = chunks[i : i + batch_size]
        rng, key = jax.random.split(rng)
        fn = engine.synthesize_vq_batch if vq_only else engine.synthesize_batch
        wavs.extend(fn(group, [prompt_wav] * len(group), rng=key))
    return crossfade_concat(wavs, engine.cfg.data.sampling_rate,
                            fade_ms=fade_ms)


def synthesize_long_stream(engine, text: str, prompt_wav: np.ndarray,
                           rng=None, batch_size: int = 8,
                           max_chars: int = 120, fade_ms: float = 20.0,
                           vq_only: bool = False):
    """Streaming long-form synthesis: yields playable segments as each
    chunk batch completes (time-to-first-audio = one batch instead of the
    whole text).

    Segments are emitted with the crossfade already applied at each join:
    every yielded array's tail is faded INTO the next segment's head, so
    plain concatenation of the yields is sample-identical to
    :func:`synthesize_long` with the same arguments and rng.
    """
    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    chunks = split_sentences(text, max_chars=max_chars)
    if not chunks:
        return
    sr = engine.cfg.data.sampling_rate
    fade = max(int(sr * fade_ms / 1000.0), 1)
    pending: Optional[np.ndarray] = None  # audio whose tail may still fade
    for i in range(0, len(chunks), batch_size):
        group = chunks[i : i + batch_size]
        rng, key = jax.random.split(rng)
        fn = engine.synthesize_vq_batch if vq_only else engine.synthesize_batch
        wavs = fn(group, [prompt_wav] * len(group), rng=key)
        merged = crossfade_concat(
            wavs if pending is None else [pending] + list(wavs), sr,
            fade_ms=fade_ms)
        if i + batch_size < len(chunks):
            # hold back one fade window: it must blend with the next batch
            hold = min(fade, len(merged))
            if len(merged) > hold:
                yield merged[:-hold]
            pending = merged[-hold:]
        else:
            yield merged
            pending = None
    if pending is not None and len(pending):  # pragma: no cover — safety
        yield pending
