from .distributed import initialize, make_host_vis_mesh
from .mesh import VIS_AXIS, make_mesh, pad_to_multiple, replicated, vis_sharding
from .sharded import (
    make_sharded_wproj_step,
    sharded_wproj_grid,
    sharded_wproj_image,
)
