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

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


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
    # two text buckets so concurrent mixed-length batches exercise bucket
    # selection inside one dispatched engine call
    eng = random_engine(small_test_config(), engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(8, 16), prompt_buckets=(32,),
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


def test_http_short_prompt_is_400_not_500(http_server):
    """Per-request validation at submit(): a sub-hop prompt is a client
    error, rejected before it can reach (and poison) a dispatched batch."""
    tiny = np.zeros(16, np.float32)  # < one hop (256)
    wav_b64 = base64.b64encode(_encode_wav_bytes(tiny, 24000)).decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server, {"text": "yi1", "prompt_wav_b64": wav_b64})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server, {"text": "   ", "prompt_wav_b64": wav_b64})
    assert e.value.code == 400


def test_decode_wav_dtype_scaling():
    """int16/int32/uint8/float32 wavs all decode to the same [-1, 1] signal;
    unsupported formats raise (mapped to a 400 upstream)."""
    import io

    from scipy.io import wavfile

    ref = np.sin(np.linspace(0, 40 * np.pi, 2400)).astype(np.float32) * 0.5

    def rt(arr):
        buf = io.BytesIO()
        wavfile.write(buf, 24000, arr)
        return _decode_wav_bytes(buf.getvalue(), 24000)

    np.testing.assert_allclose(rt((ref * 32767).astype(np.int16)), ref,
                               atol=2.0 / 32768)
    np.testing.assert_allclose(rt((ref * 2147483647).astype(np.int32)), ref,
                               atol=2.0 / 32768)
    u8 = (np.clip(ref, -1, 1) * 127 + 128).astype(np.uint8)
    np.testing.assert_allclose(rt(u8), ref, atol=2.0 / 127)
    np.testing.assert_allclose(rt(ref.astype(np.float32)), ref, atol=1e-6)
    with pytest.raises(Exception):
        rt(ref.astype(np.float16))  # scipy rejects or we do — either way


def test_http_concurrent_clients_mixed_lengths(http_server):
    """Concurrent POSTs with different text/prompt lengths ride the
    microbatcher together and all succeed."""
    results = {}
    errors = {}

    def client(i, text, prompt_len):
        try:
            prompt = np.random.default_rng(10 + i).uniform(
                -0.3, 0.3, prompt_len).astype(np.float32)
            wav_b64 = base64.b64encode(
                _encode_wav_bytes(prompt, 24000)).decode()
            resp = _post(http_server, {"text": text, "vq_only": True,
                                       "prompt_wav_b64": wav_b64,
                                       "seed": i})
            results[i] = _decode_wav_bytes(resp.read(), 24000)
        except Exception as e:  # noqa: BLE001
            errors[i] = e

    specs = [("yi1", 24000), ("er4 san1 si4 wu3", 8000),
             ("liu4 qi1", 16000), ("ba1 jiu3 shi2 yi1 er4 san1", 24000)]
    threads = [threading.Thread(target=client, args=(i, t, n))
               for i, (t, n) in enumerate(specs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert set(results) == {0, 1, 2, 3}
    for w in results.values():
        assert len(w) > 0 and np.isfinite(w).all()
