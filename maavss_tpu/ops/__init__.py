from maavss_tpu.ops.windows import hamming_window, hann_window  # noqa: F401
from maavss_tpu.ops.stft import (  # noqa: F401
    frame_signal,
    istft,
    istft_features,
    stft,
    stft_features,
)
