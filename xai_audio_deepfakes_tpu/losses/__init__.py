from xai_audio_deepfakes_tpu.losses.lmac import (
    LMACLossState,
    bce_with_logits,
    lmac_loss,
    renormalize_w,
    softplus_weights,
)
