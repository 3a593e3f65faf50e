from maavss_tpu.ops.windows import hamming_window, hann_window  # noqa: F401
from maavss_tpu.ops.stft import (  # noqa: F401
    frame_signal,
    istft,
    istft_features,
    stft,
    stft_features,
)
from maavss_tpu.ops.phasegram import video_phasegram  # noqa: F401
from maavss_tpu.ops.metrics import sdr, si_sdr  # noqa: F401
from maavss_tpu.ops.flow import clip_flow, flow_magnitude, lucas_kanade_dense  # noqa: F401
from maavss_tpu.ops.pallas_kernels import (  # noqa: F401
    complex_mask_apply,
    magphase,
    polar_to_rect,
)
