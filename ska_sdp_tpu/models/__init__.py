from .dataset import (
    aw_gridding,
    get_akernels,
    get_wkernels,
    load_vis_data,
    w_gridding,
)
from .imaging import (
    ImagingResult,
    aw_imaging,
    aw_imaging_old,
    conv_imaging,
    do_imaging,
    simple_imaging,
    w_cache_imaging,
    wproj_imaging_from_bank,
)
