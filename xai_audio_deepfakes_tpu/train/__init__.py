from xai_audio_deepfakes_tpu.train.train_addvisor import (
    AddvisorTrainState,
    make_train_step,
    train_addvisor,
)
