"""Microbatching TTS server tests (serving/server.py)."""
import threading
import time

import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine
from detail_tts_tpu.serving.server import TTSServer

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _engine():
    cfg = small_test_config()
    return random_engine(cfg, engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(16,), prompt_buckets=(32,),
        code_buckets=(8,)), fast=True)


def _prompt(seed):
    return np.random.default_rng(seed).uniform(-0.3, 0.3, 24000).astype(
        np.float32)


def test_server_batches_concurrent_requests():
    eng = _engine()
    with TTSServer(eng, max_batch=4, max_wait_ms=3000.0) as server:
        # warm the jit cache first so straggler collection isn't racing
        # against a multi-minute compile
        server.synthesize("ni3 hao3", _prompt(0), timeout=600)
        futs = [server.submit(t, _prompt(i), seed=i, vq_only=(i == 3))
                for i, t in enumerate(["yi1", "er4", "san1", "si4"])]
        outs = [f.result(timeout=600) for f in futs]
    for w in outs:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
    # 1 warmup batch + 1 grouped batch + 1 vq_only group
    assert server.requests_served == 5
    assert server.batches_dispatched <= 3


def test_server_rejects_before_start_and_survives_errors():
    eng = _engine()
    server = TTSServer(eng, max_batch=2, max_wait_ms=1.0)
    with pytest.raises(RuntimeError):
        server.submit("a", _prompt(0))
    server.start()
    try:
        # hostile requests are rejected AT SUBMIT (per-request isolation:
        # they must never reach a batched engine call where the raised
        # exception would fan out to every grouped future)
        with pytest.raises(ValueError):
            server.submit("yi1", np.zeros((0,), np.float32))  # empty
        with pytest.raises(ValueError):
            server.submit("yi1", _prompt(0)[:100])  # sub-hop prompt
        with pytest.raises(ValueError):
            server.submit("yi1", _prompt(0).reshape(2, -1))  # not mono
        with pytest.raises(ValueError):
            server.submit("   ", _prompt(0))  # blank text
        with pytest.raises(ValueError):
            bad = _prompt(0).copy()
            bad[7] = np.nan
            server.submit("yi1", bad)  # non-finite
        ok = server.synthesize("yi1 ju4", _prompt(1), timeout=600)
        assert np.isfinite(ok).all() and len(ok) > 0
    finally:
        server.stop()
    assert server._thread is None


def test_server_bad_submit_does_not_poison_concurrent_batch():
    """A malformed request arriving alongside good ones 400s alone; the
    good requests in the same dispatch window still succeed."""
    eng = _engine()
    with TTSServer(eng, max_batch=4, max_wait_ms=2000.0) as server:
        server.synthesize("ni3 hao3", _prompt(0), timeout=600)  # warm jit
        futs = [server.submit("yi1", _prompt(1)),
                server.submit("er4", _prompt(2))]
        with pytest.raises(ValueError):
            server.submit("san1", _prompt(3)[:10])  # would poison the batch
        outs = [f.result(timeout=600) for f in futs]
    for w in outs:
        assert np.isfinite(w).all() and len(w) > 0


def test_dispatch_finalize_pipelining_matches_synthesize_batch():
    """The double-buffer primitive: dispatch batch i+1 before finalizing
    batch i must produce bit-identical wavs to the serial path."""
    import jax

    eng = _engine()
    texts = ["yi1 er4", "san1 si4"]
    prompts = [_prompt(1), _prompt(2)]
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]

    serial = [eng.synthesize_batch(texts, prompts, rng=r) for r in rngs]

    pipelined, prev = [], None
    for r in rngs:
        h = eng.dispatch_batch(texts, prompts, rng=r)
        if prev is not None:
            pipelined.append(eng.finalize_batch(prev))
        prev = h
    pipelined.append(eng.finalize_batch(prev))

    for outs_s, outs_p in zip(serial, pipelined):
        for a, b in zip(outs_s, outs_p):
            np.testing.assert_array_equal(a, b)


def test_server_back_to_back_batches_all_resolve():
    """Sequential waves exercise the inflight double-buffer in _loop."""
    eng = _engine()
    with TTSServer(eng, max_batch=2, max_wait_ms=200.0) as server:
        server.synthesize("ni3 hao3", _prompt(0), timeout=600)  # warm jits
        all_futs = []
        for wave in range(3):
            futs = [server.submit("yi1 er4", _prompt(wave), seed=wave)
                    for _ in range(2)]
            all_futs.extend(futs)
            time.sleep(0.05)  # let waves land as separate batches
        outs = [f.result(timeout=600) for f in all_futs]
    for w in outs:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
    assert server.requests_served == 7
