from xai_audio_deepfakes_tpu.attrib.methods import (
    attribution_mask,
    gradient_shap,
    input_x_gradient,
    integrated_gradients,
    saliency,
    smoothgrad,
    waveform_explanation,
)
