from .distributed import initialize, make_host_vis_mesh
from .fft import fft2_centered_sharded, make_sharded_ifft2
from .mesh import VIS_AXIS, make_mesh, pad_to_multiple, replicated, vis_sharding
from .sharded import (
    make_sharded_idg_aw_step,
    make_sharded_idg_step,
    make_sharded_predict_step,
    make_sharded_spectral_idg_step,
    make_sharded_wproj_step,
    make_sharded_wproj_step_gridfft,
    make_sharded_wproj_step_gridscatter,
    sharded_wproj_grid,
    sharded_wproj_image,
)
