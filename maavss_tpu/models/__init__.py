from maavss_tpu.models.fusion import AVFusionModel  # noqa: F401
from maavss_tpu.models.fusion_frames import AVFusionFramesModel  # noqa: F401
from maavss_tpu.models.legacy import AVSEModel, AVModelSTFT  # noqa: F401
from maavss_tpu.models.fusion_conv import AVFusionModelConv  # noqa: F401
