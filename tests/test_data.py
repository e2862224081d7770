"""Data layer: IO (incl. native C++ decoder), resampling, scanners, batching,
band-splice generation, xcorr alignment."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.data.bandswap import band_masks, band_spliced_waveforms
from xai_audio_deepfakes_tpu.data.datasets import (
    AudioBatcher,
    extract_wavs,
    find_all_wav_files_per_system,
    find_wavs_per_language_and_speaker,
)
from xai_audio_deepfakes_tpu.data.io import load_audio, read_wav, write_wav
from xai_audio_deepfakes_tpu.ops.align import align_waveforms, xcorr_shift
from xai_audio_deepfakes_tpu.ops.resample import resample_poly_np


def test_wav_roundtrip(tmp_path, rng):
    wav = (rng.uniform(-0.5, 0.5, 16000)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    back, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1.0 / 16000)


def test_native_decoder_matches_python(tmp_path, rng):
    from xai_audio_deepfakes_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib not built")
    wav = (rng.uniform(-0.5, 0.5, 12345)).astype(np.float32)
    path = str(tmp_path / "n.wav")
    write_wav(path, wav, 22050)
    got = native_io.read_wav_native(path)
    assert got is not None
    data, sr = got
    assert sr == 22050
    import scipy.io.wavfile as wavfile

    sr2, ref = wavfile.read(path)
    np.testing.assert_allclose(data, ref.astype(np.float32) / 32768.0, atol=1e-6)


def test_native_writer_bit_identical_to_python(tmp_path, rng):
    """encode_wav_pcm16 must produce the exact bytes the scipy fallback
    writes (same clip + truncate-toward-zero int16 conversion and RIFF
    header), so artifacts are reproducible regardless of which path ran."""
    from xai_audio_deepfakes_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib not built")
    wav = rng.uniform(-1.3, 1.3, 23456).astype(np.float32)  # exercises clip
    p_native = str(tmp_path / "nat.wav")
    p_python = str(tmp_path / "py.wav")
    assert native_io.write_wav_native(p_native, wav, 16000)
    import scipy.io.wavfile as wavfile

    wavfile.write(
        p_python, 16000, (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    )
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read()

    # and the native decoder round-trips the native writer
    data, sr = native_io.read_wav_native(p_native)
    assert sr == 16000
    # truncation (1 LSB) + the 32767-encode/32768-decode scale skew (|x|
    # LSB) bound the roundtrip error at 2 LSB
    np.testing.assert_allclose(
        data, np.clip(wav, -1, 1), atol=2.0 / 32768.0
    )


def test_load_audio_contract(tmp_path, rng):
    """load_audio: mono, resampled, exactly 80000 samples
    (`audioprocessor.py:49-63`)."""
    wav = (rng.uniform(-0.5, 0.5, 22050 * 3)).astype(np.float32)  # 3 s @ 22.05k
    path = str(tmp_path / "r.wav")
    write_wav(path, wav, 22050)
    out, sr = load_audio(path)
    assert sr == 16000 and out.shape == (80000,)
    assert np.all(out[48200:] == 0)  # zero-padded tail (3 s -> 48000 samples)


def test_resample_pure_tone():
    """A 440 Hz tone resampled 48k -> 16k stays a 440 Hz tone."""
    sr0, sr1 = 48000, 16000
    t0 = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t0).astype(np.float32)
    y = resample_poly_np(x, sr0, sr1)
    assert abs(y.shape[0] - sr1) <= 1
    t1 = np.arange(y.shape[0]) / sr1
    ref = np.sin(2 * np.pi * 440 * t1).astype(np.float32)
    # ignore filter edge transients
    sl = slice(200, -200)
    assert np.max(np.abs(y[sl] - ref[sl])) < 5e-3


def test_resample_matches_scipy_closely():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000).astype(np.float32)
    y = resample_poly_np(x, 22050, 16000)
    ref = resample_poly(x, 16000 // 50, 22050 // 50).astype(np.float32)
    n = min(len(y), len(ref))
    # different anti-alias filters -> compare energy correlation, not samples
    c = np.corrcoef(y[200 : n - 200], ref[200 : n - 200])[0, 1]
    assert c > 0.98, c


def test_extract_wavs(tmp_path):
    meta = tmp_path / "m.txt"
    meta.write_text("a.wav,foo\nb.wav\n\nc.wav,x,y\n")
    assert extract_wavs(str(meta)) == ["a.wav", "b.wav", "c.wav"]


def test_scanners(tmp_path):
    # MLAAD-style tree
    for lang, system, name in [("en", "sysA", "1"), ("en", "sysA", "2"), ("de", "sysB", "3")]:
        d = tmp_path / "mlaad" / "fake" / lang / system
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"{name}.wav"), np.zeros(100, np.float32))
    got = find_all_wav_files_per_system(str(tmp_path / "mlaad"), samples_per_system=1, seed=0)
    assert len(got) == 2  # one per system
    assert {g[1] for g in got} == {"sysA", "sysB"}

    # m-ailabs-style tree
    d = tmp_path / "mailabs" / "en_US" / "en_US" / "by_book" / "female" / "spk" / "book" / "wavs"
    d.mkdir(parents=True)
    write_wav(str(d / "a.wav"), np.zeros(100, np.float32))
    got2 = find_wavs_per_language_and_speaker(str(tmp_path / "mailabs"), 5, 3, seed=0)
    assert len(got2) == 1 and got2[0][1] == "spk" and got2[0][2] == "en_US"


def test_audio_batcher(tmp_path, rng):
    for i in range(5):
        write_wav(
            str(tmp_path / f"{i}.wav"),
            rng.uniform(-0.1, 0.1, 8000).astype(np.float32), 16000,
        )
    batcher = AudioBatcher(
        [f"{i}.wav" for i in range(5)], batch_size=2, root=str(tmp_path),
        clip_seconds=0.5, shuffle=True, seed=1,
    )
    batches = list(batcher)
    assert len(batches) == 2  # drop_remainder
    assert all(b.shape == (2, 8000) and b.dtype == np.float32 for b in batches)
    # threaded decode is order-preserving: same seed + workers=1 -> same data
    serial = list(
        AudioBatcher(
            [f"{i}.wav" for i in range(5)], batch_size=2, root=str(tmp_path),
            clip_seconds=0.5, shuffle=True, seed=1, num_workers=1,
        )
    )
    for a, b in zip(batches, serial):
        np.testing.assert_array_equal(a, b)


def test_load_audio_chunks(tmp_path, rng):
    from xai_audio_deepfakes_tpu.data.io import load_audio_chunks

    # 2.3 s file at 16 kHz, 1 s windows -> 3 chunks at 0/1/2 s
    wav = rng.uniform(-0.5, 0.5, 36800).astype(np.float32)
    p = str(tmp_path / "long.wav")
    write_wav(p, wav, 16000)
    chunks, starts = load_audio_chunks(p, clip_seconds=1.0)
    assert chunks.shape == (3, 16000)
    np.testing.assert_array_equal(starts, [0, 16000, 32000])
    np.testing.assert_allclose(chunks[0], wav[:16000], atol=2e-4)
    # last chunk zero-padded past the end of the signal
    np.testing.assert_allclose(chunks[2, :4800], wav[32000:], atol=2e-4)
    assert np.abs(chunks[2, 4800:]).max() == 0.0
    # overlapping hop
    chunks2, starts2 = load_audio_chunks(p, clip_seconds=1.0, hop_seconds=0.5)
    np.testing.assert_array_equal(starts2[:3], [0, 8000, 16000])
    # short file -> exactly one chunk
    write_wav(str(tmp_path / "s.wav"), wav[:4000], 16000)
    c3, s3 = load_audio_chunks(str(tmp_path / "s.wav"), clip_seconds=1.0)
    assert c3.shape == (1, 16000) and s3.tolist() == [0]


def test_audio_batcher_host_sharding(tmp_path, rng):
    """Multi-host corpus sharding: shards partition the file list."""
    for i in range(6):
        write_wav(
            str(tmp_path / f"{i}.wav"),
            np.full(8000, (i + 1) / 10, np.float32), 16000,
        )
    paths = [f"{i}.wav" for i in range(6)]
    seen = []
    for shard in range(2):
        b = AudioBatcher(
            paths, batch_size=1, root=str(tmp_path), clip_seconds=0.5,
            shuffle=False, shard_index=shard, num_shards=2,
        )
        assert len(b) == 3
        seen += [round(float(x[0, 0]), 2) for x in b]
    assert sorted(seen) == [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]


def test_prefetch_pipeline():
    from xai_audio_deepfakes_tpu.data.prefetch import (
        parallel_map,
        prefetch,
        prefetch_to_device,
    )

    items = [np.full((4,), i, np.float32) for i in range(10)]
    got = list(prefetch(iter(items), size=2))
    for a, b in zip(got, items):
        np.testing.assert_array_equal(a, b)

    # device staging preserves order/values and lands on a jax device
    dev = list(prefetch_to_device(iter(items[:3]), size=2))
    assert all(hasattr(d, "devices") for d in dev)
    for a, b in zip(dev, items):
        np.testing.assert_array_equal(np.asarray(a), b)

    assert parallel_map(lambda x: x * 2, [1, 2, 3], num_workers=4) == [2, 4, 6]

    # exceptions inside the producer surface at the consumer
    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch(boom(), size=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_band_masks_partition():
    masks = band_masks(513, 16000, 1000, 8000)
    assert masks.shape == (8, 513)
    # bands tile [0, 8000) exactly once; only the top bin (8000 Hz) is uncovered
    cover = masks.sum(axis=0)
    assert np.all(cover[:-1] == 1) and cover[-1] == 0


def test_band_spliced_waveforms(rng):
    cfg = STFTConfig()
    real = jnp.asarray(rng.standard_normal(16000).astype(np.float32) * 0.1)
    voc = jnp.asarray(rng.standard_normal(16000).astype(np.float32) * 0.1)
    waves, leakage = band_spliced_waveforms(real, voc, cfg, length=16000)
    assert waves.shape == (8, 16000)
    # splicing identical signals returns the original and zero leakage
    waves_same, leak_same = band_spliced_waveforms(real, real, cfg, length=16000)
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(waves_same[i]), np.asarray(real), atol=1e-4
        )
    assert float(jnp.max(leak_same)) < 1e-10
    # out-of-band leakage of a true splice is tiny relative to signal energy
    assert float(jnp.max(leakage)) < 1e-6


def test_xcorr_alignment(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    shift = 123
    delayed = np.concatenate([np.zeros(shift, np.float32), x])[:4000]
    assert int(xcorr_shift(jnp.asarray(x), jnp.asarray(delayed))) == -shift
    ref_a, deg_a = align_waveforms(x, delayed)
    assert ref_a.shape == deg_a.shape
    np.testing.assert_allclose(ref_a, deg_a, atol=1e-5)


def test_write_wav_fallback_multichannel_matches_native_convention(
    tmp_path, rng, monkeypatch
):
    """write_wav's scipy fallback must treat 2-D input as [C, L]
    channels-first — the layout load_audio/read_wav_native return and the
    native encoder interleaves — not scipy's [frames, channels]."""
    from xai_audio_deepfakes_tpu.data import native_io
    from xai_audio_deepfakes_tpu.data.io import read_wav, write_wav

    stereo = np.clip(
        (rng.standard_normal((2, 500)) * 0.3).astype(np.float32), -0.99, 0.99
    )
    monkeypatch.setattr(native_io, "write_wav_native", lambda *a: False)
    p = str(tmp_path / "st.wav")
    write_wav(p, stereo, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    assert back.shape == (2, 500)
    # int16 truncation + the encode x32767 / decode /32768 scale mismatch
    np.testing.assert_allclose(back, stereo, rtol=0, atol=2e-4)
