"""Model zoo: the capabilities of the reference's model layer, rebuilt in flax.

  * wav2vec2   — truncated XLS-R SSL embedder (`classifier_embedder.py:13-18`)
  * logreg     — frozen LogisticRegression detector head
                 (`classifier_embedder.py:21-38`)
  * unet       — spectrogram-magnitude mask decoder (`addvisor.py:27-84`)
  * feat_decoder — legacy feature-input mask decoder (the `ADDvisor` class
                 consumed by `LMAC_metrics.py:133` / `streamlit...py:167`)
  * hifigan    — HiFi-GAN V1 generator for listenable synthesis
                 (`hifigan.py:106-110`)
"""

from xai_audio_deepfakes_tpu.models.logreg import LogReg, logreg_params_from_joblib
from xai_audio_deepfakes_tpu.models.unet import UNetMaskDecoder
from xai_audio_deepfakes_tpu.models.feat_decoder import FeatureMaskDecoder
from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder
from xai_audio_deepfakes_tpu.models.hifigan import HiFiGANGenerator
