"""Microbatching TTS server tests (serving/server.py)."""
import threading
import time

import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine
from detail_tts_tpu.serving.server import TTSServer


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
        # a hostile request (empty prompt) fails its future, not the server
        bad = server.submit("yi1", np.zeros((0,), np.float32))
        with pytest.raises(Exception):
            bad.result(timeout=600)
        ok = server.synthesize("yi1 ju4", _prompt(1), timeout=600)
        assert np.isfinite(ok).all() and len(ok) > 0
    finally:
        server.stop()
    assert server._thread is None
