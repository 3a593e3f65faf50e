from maavss_tpu.train.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from maavss_tpu.train.steps import (  # noqa: F401
    make_audio_ae_eval,
    make_audio_ae_step,
    make_frames_step,
    make_fusion_eval,
    make_fusion_middle_step,
    make_fusion_step,
    make_visual_ae_eval,
    make_visual_ae_step,
)
from maavss_tpu.train.trainer import Trainer  # noqa: F401
from maavss_tpu.train.infer import make_separator  # noqa: F401
