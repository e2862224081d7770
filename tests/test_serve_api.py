"""Live explain API: micro-batching service + HTTP round trip.

The reference's interactive surface is Streamlit recomputing the pipeline in
the web process (`streamlit_controlled_study.py:156-228`); the rebuild serves
through a fixed-shape batched jitted program (`serve/api.py`). These tests
pin the serving contracts: coalescing, padded-row isolation, wire format.
"""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest
import scipy.io.wavfile as wavfile

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
from xai_audio_deepfakes_tpu.serve.api import ExplainService, start_api_server


@pytest.fixture(scope="module")
def service():
    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    svc = ExplainService(pipe, params, batch_size=4, linger_ms=30.0).start()
    yield svc
    svc.stop()


def _clip(pipe, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(pipe.cfg.audio.num_samples).astype(np.float32) * 0.1


def test_submit_returns_full_result(service):
    res = service.submit(_clip(service.pipe))
    for k in ("pred_original", "pred_relevant", "pred_irrelevant",
              "mask_mean", "mask_energy_kept"):
        assert np.isfinite(res[k]), k
    assert 0.0 <= res["pred_original"] <= 1.0
    assert res["relevant_wav"].shape == (service.pipe.cfg.audio.num_samples,)
    assert 0.0 <= res["mask_energy_kept"] <= 1.0 + 1e-5


def test_concurrent_requests_coalesce(service):
    """Concurrent submits must share device dispatches (micro-batching), and
    each caller must get ITS OWN row back, not a padded neighbor's."""
    b0 = dict(service.stats)
    clips = [_clip(service.pipe, seed=i) for i in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = service.submit(clips[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None for r in results)
    new_batches = service.stats["batches"] - b0["batches"]
    assert new_batches < 4, "4 concurrent requests should coalesce"
    # distinct inputs -> distinct per-row outputs (row routing is correct)
    preds = {round(r["pred_original"], 6) for r in results}
    assert len(preds) >= 2
    # a row scored inside a full batch == the same clip scored alone in a
    # zero-padded partial batch (no cross-row leakage; UNet norm is frozen
    # batch statistics at inference, so rows are independent)
    solo = service.submit(clips[0])
    assert solo["pred_original"] == pytest.approx(
        results[0]["pred_original"], abs=1e-5
    )
    np.testing.assert_allclose(
        solo["relevant_wav"], results[0]["relevant_wav"], atol=1e-5
    )


@pytest.fixture(scope="module")
def http_server():
    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    server, svc = start_api_server(pipe, params, port=0, batch_size=2,
                                   linger_ms=1.0)
    yield server, svc, pipe
    server.shutdown()
    svc.stop()


def _wav_bytes(pipe, seed=3, sr=None):
    sr = sr or pipe.cfg.audio.sample_rate
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
    return buf.getvalue()


def test_http_healthz(http_server):
    server, svc, pipe = http_server
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["batch_size"] == 2


def test_http_explain_roundtrip(http_server):
    server, svc, pipe = http_server
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/explain",
        data=_wav_bytes(pipe),
        headers={"Content-Type": "audio/wav"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert 0.0 <= body["pred_original"] <= 1.0
    # audio payload decodes back to a clip-length 16 kHz wav
    raw = base64.b64decode(body["relevant_wav_b64"])
    sr, arr = wavfile.read(io.BytesIO(raw))
    assert sr == pipe.cfg.audio.sample_rate
    assert arr.shape[0] == pipe.cfg.audio.num_samples


def test_http_explain_no_audio_and_bad_payload(http_server):
    server, svc, pipe = http_server
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/explain?audio=0",
        data=_wav_bytes(pipe), method="POST",
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert "relevant_wav_b64" not in body
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/explain", data=b"not a wav", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400


def test_load_audio_bytes_resamples():
    """8 kHz input is resampled to the 16 kHz / 5 s contract in memory."""
    from xai_audio_deepfakes_tpu.data.io import load_audio_bytes

    rng = np.random.default_rng(0)
    wav8k = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, 8000, (wav8k * 32767).astype(np.int16))
    out, sr = load_audio_bytes(buf.getvalue())
    assert sr == 16000 and out.shape == (80000,)
    assert np.abs(out[:16000]).mean() > 0.01  # first second has signal
    assert np.abs(out[40000:]).max() == 0.0   # zero-padded tail


def test_http_request_size_cap(http_server, monkeypatch):
    """POST bodies over MAX_REQUEST_BYTES are rejected with 413 before being
    buffered (serve/api.py do_POST guard)."""
    from xai_audio_deepfakes_tpu.serve import api

    server, svc, pipe = http_server
    port = server.server_address[1]
    monkeypatch.setattr(api, "MAX_REQUEST_BYTES", 1000)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/explain", data=_wav_bytes(pipe),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 413
    # normal-size requests still work after restoring the cap
    monkeypatch.setattr(api, "MAX_REQUEST_BYTES", 32 * 1024 * 1024)
    with urllib.request.urlopen(req) as r:
        assert 0.0 <= json.loads(r.read())["pred_original"] <= 1.0
