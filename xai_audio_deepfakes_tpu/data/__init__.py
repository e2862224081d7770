from xai_audio_deepfakes_tpu.data.io import load_audio, read_wav, write_wav
from xai_audio_deepfakes_tpu.data.datasets import (
    AudioBatcher,
    extract_wavs,
    find_all_wav_files_per_system,
    find_wavs_per_language_and_speaker,
)
