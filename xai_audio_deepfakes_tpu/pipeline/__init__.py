from xai_audio_deepfakes_tpu.pipeline.core import (
    ADDvisorPipeline,
    ExplainOutput,
)
