"""HTTP endpoint tests: stdlib client against serving/http_api.py."""
import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.serving.http_api import (_decode_wav_bytes,
                                             _encode_wav_bytes, serve)
from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine


def test_wav_codec_roundtrip():
    wav = np.random.default_rng(0).uniform(-0.5, 0.5, 2400).astype(np.float32)
    data = _encode_wav_bytes(wav, 24000)
    back = _decode_wav_bytes(data, 24000)
    # 2 LSB: int16 truncation + the standard 32767-encode/32768-decode scale
    np.testing.assert_allclose(back, wav, atol=2.0 / 32768)
    # resample path
    back12 = _decode_wav_bytes(data, 12000)
    assert back12.shape[0] == 1200


@pytest.fixture(scope="module")
def http_server():
    eng = random_engine(small_test_config(), engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(16,), prompt_buckets=(32,),
        code_buckets=(8,)), fast=True)
    box = {}
    t = threading.Thread(target=serve,
                         kwargs=dict(engine=eng, port=0, max_batch=2,
                                     max_wait_ms=5.0, httpd_box=box),
                         daemon=True)
    t.start()
    while "httpd" not in box:
        pass
    host, port = box["httpd"].server_address
    yield f"http://{host}:{port}"
    box["httpd"].shutdown()


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_http_synthesize_and_health(http_server):
    prompt = np.random.default_rng(1).uniform(-0.3, 0.3, 24000).astype(
        np.float32)
    wav_b64 = base64.b64encode(_encode_wav_bytes(prompt, 24000)).decode()
    resp = _post(http_server, {"text": "ni3 hao3", "prompt_wav_b64": wav_b64,
                               "vq_only": True})
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "audio/wav"
    out = _decode_wav_bytes(resp.read(), 24000)
    assert len(out) > 0 and np.isfinite(out).all()

    with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["requests_served"] >= 1


def test_http_raw_pcm_prompt(http_server):
    pcm = (np.random.default_rng(2).uniform(-0.3, 0.3, 12000)
           * 32767).astype(np.int16)
    resp = _post(http_server, {
        "text": "shi4 jie4", "vq_only": True,
        "prompt_pcm16_b64": base64.b64encode(pcm.tobytes()).decode(),
        "prompt_sr": 12000})
    assert resp.status == 200
    assert len(resp.read()) > 44  # RIFF header + payload


def test_http_bad_request(http_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server, {"text": "no prompt"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(http_server + "/nope", timeout=30)
    assert e.value.code == 404
