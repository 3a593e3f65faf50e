from maavss_tpu.utils.hop import calc_hop_size  # noqa: F401
from maavss_tpu.utils.files import (  # noqa: F401
    get_all_files,
    latest_file,
    load_cache_obj,
    load_json,
    save_cache_obj,
    save_json,
    verify_files,
)
