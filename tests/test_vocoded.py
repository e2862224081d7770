"""Vocoded-dataset generator + profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.data.io import write_wav
from xai_audio_deepfakes_tpu.data.vocoded import (
    generate_vocoded_dataset,
    hann_splice_config,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline


def test_generate_vocoded_dataset(tmp_path, rng):
    """End-to-end datagen with an identity 'vocoder': 8 band wavs per input,
    each reconstructing the original (self-splice), correct names."""
    wav_dir = tmp_path / "wavs"
    out_dir = tmp_path / "out"
    wav_dir.mkdir()
    names = []
    for i in range(2):
        name = f"clip{i}.wav"
        write_wav(str(wav_dir / name), rng.uniform(-0.3, 0.3, 16000).astype(np.float32))
        names.append(name)

    logs = []
    n = generate_vocoded_dataset(
        names, str(wav_dir), str(out_dir),
        vocode_fn=lambda w: w,  # identity vocoder
        clip_seconds=1.0, log_fn=logs.append,
    )
    assert n == 16
    files = sorted(os.listdir(out_dir))
    assert len(files) == 16
    assert "clip0.wav_vocoded_0-1000.wav" in files
    assert "clip1.wav_vocoded_7000-8000.wav" in files
    # identity vocoding => zero leakage, no warnings
    assert not any("warning" in r for r in logs)


def test_vocoder_fn_with_tiny_hifigan(rng):
    from xai_audio_deepfakes_tpu.data.vocoded import make_vocoder_fn

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0), with_hifigan=True)
    fn = make_vocoder_fn(pipe, params)
    wav = jnp.asarray(rng.uniform(-0.3, 0.3, (1, 8000)).astype(np.float32))
    out = fn(wav)
    assert out.ndim == 2 and np.all(np.isfinite(np.asarray(out)))


def test_stage_timer():
    from xai_audio_deepfakes_tpu.utils.profiling import StageTimer, sync

    timer = StageTimer()
    x = jnp.ones((64, 64))
    with timer.stage("matmul", outputs=None):
        y = sync(x @ x)
    fn = timer.timed("again", lambda a: a @ a)
    fn(x)
    s = timer.summary()
    assert set(s) == {"matmul", "again"}
    assert s["again"]["calls"] == 1
