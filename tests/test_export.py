"""AOT serving artifacts (`serve/export.py`): jax.export roundtrip parity,
weight hot-swap, shape contract, and serving the live API from an artifact.

The reference has no deployment story (Streamlit re-traces torch modules per
process, `streamlit_controlled_study.py:156-228`); the rebuild's production
path serializes the compiled explain graph once and serves it anywhere.
"""

import json
import os
import urllib.request

import jax
import numpy as np
import pytest

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
from xai_audio_deepfakes_tpu.serve.export import (
    flatten_params,
    load_exported,
    save_exported,
    unflatten_params,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    d = str(tmp_path_factory.mktemp("exported"))
    save_exported(d, pipe, params, batch_size=2, platforms=("cpu",))
    return pipe, params, d


def _wavs(pipe, b, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (b, pipe.cfg.audio.num_samples)
    ).astype(np.float32) * 0.1


def test_flatten_roundtrip(rng):
    tree = {"a": {"b": rng.standard_normal(3), "c": {"d": rng.standard_normal(2)}},
            "e": rng.standard_normal(1)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_params(flat)
    jax.tree.map(np.testing.assert_array_equal, back, tree)


def test_artifact_files_and_meta(artifact):
    pipe, _, d = artifact
    assert sorted(os.listdir(d)) == ["explain.jaxexport", "meta.json", "params.npz"]
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta["batch_size"] == 2
    assert meta["num_samples"] == pipe.cfg.audio.num_samples
    assert meta["masking"] == "log1p"  # pipeline default baked in
    assert meta["platforms"] == ["cpu"]


def test_exported_matches_jit(artifact):
    """The deserialized graph must reproduce the live jitted pipeline exactly
    (same lowering, no re-trace drift)."""
    pipe, params, d = artifact
    loaded = load_exported(d)
    wav = _wavs(pipe, 2)
    out = loaded(wav)
    direct = pipe.jit_explain()(params, wav)
    assert type(out).__name__ == "ExplainOutput"  # pytree class survives
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_exported_is_fixed_shape(artifact):
    pipe, _, d = artifact
    loaded = load_exported(d)
    with pytest.raises(ValueError, match="fixed-shape"):
        loaded(_wavs(pipe, 3))


def test_param_hot_swap(artifact):
    """Weights live OUTSIDE the graph: swapping the decoder params changes
    the mask without touching the serialized HLO (the checkpoint-upgrade
    path, `LMAC_metrics.py:21` naming contract)."""
    pipe, params, d = artifact
    loaded = load_exported(d)
    wav = _wavs(pipe, 2)
    base = loaded(wav)
    params2 = jax.tree.map(np.asarray, params)
    params2["unet"] = jax.tree.map(
        lambda a: np.asarray(a) + 0.05, params2["unet"]
    )
    swapped = loaded.with_params(params2)(wav)
    assert not np.allclose(np.asarray(base.mask), np.asarray(swapped.mask))
    # untouched stages identical
    np.testing.assert_array_equal(
        np.asarray(base.magnitude), np.asarray(swapped.magnitude)
    )


def test_serve_api_from_artifact(artifact):
    """The live API serves from the artifact with no model apply code: HTTP
    explain round trip against the deserialized graph."""
    from xai_audio_deepfakes_tpu.data.io import wav_to_bytes
    from xai_audio_deepfakes_tpu.serve.api import start_api_server

    pipe, _, d = artifact
    art = load_exported(d)
    server, service = start_api_server(
        pipe,
        art.params,
        batch_size=art.batch_size,
        linger_ms=5.0,
        explain_fn=lambda p, w: art._exported.call(p, w),
    )
    try:
        port = server.server_address[1]
        wav = _wavs(pipe, 1)[0]
        body = wav_to_bytes(wav, pipe.cfg.audio.sample_rate)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/explain?audio=0", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            payload = json.loads(resp.read())
        assert 0.0 <= payload["pred_original"] <= 1.0
        assert np.isfinite(payload["mask_mean"])
    finally:
        server.shutdown()
        service.stop()
