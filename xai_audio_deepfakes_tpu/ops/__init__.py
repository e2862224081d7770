"""Signal-processing ops: the TPU-native equivalent of the reference's
implicit native layer (torch.stft/cuFFT, torchaudio transforms).

Everything here is pure-functional jnp with static shapes, differentiable end
to end (the LMAC loss backprops through iSTFT into the mask decoder,
`loss_function.py:46-53`), and MXU-friendly: the DFT is expressed as two
matmuls against precomputed cosine/sine bases instead of an FFT call, which
XLA tiles straight onto the systolic array for the (frames x 1024) x
(1024 x 513) shapes this pipeline uses.
"""

from xai_audio_deepfakes_tpu.ops.window import torch_style_window
from xai_audio_deepfakes_tpu.ops.stft import (
    stft,
    istft,
    stft_magnitude_phase,
    frame_signal,
)
from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm
from xai_audio_deepfakes_tpu.ops.masking import (
    apply_mask,
    remask_complex,
    crop_spec,
    pad_mask_to_spec,
)
from xai_audio_deepfakes_tpu.ops.mel import mel_filterbank, mel_spectrogram
from xai_audio_deepfakes_tpu.ops.pad import pad_or_crop
