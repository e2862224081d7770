from xai_audio_deepfakes_tpu.metrics.lmac_metrics import (
    compute_AD,
    compute_AG,
    compute_AI,
    compute_faithfulness,
    compute_fidelity,
    get_score_for_predicted_class,
    summarize,
)
from xai_audio_deepfakes_tpu.metrics.eer import compute_eer, roc_curve
