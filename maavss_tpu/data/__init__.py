from maavss_tpu.data.synthetic import (  # noqa: F401
    moving_blob_frames,
    sine_sweep_audio,
    synthetic_av_batch,
)
