from xai_audio_deepfakes_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from xai_audio_deepfakes_tpu.parallel.pipeline import (
    encoder_layer_fn,
    pipeline_apply,
    pipelined_encoder_apply,
    stack_to_stages,
)
from xai_audio_deepfakes_tpu.parallel.sharding import (
    embedder_param_specs,
    shard_params,
)
