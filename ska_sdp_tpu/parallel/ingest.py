"""Multi-host sharded ingest: each process reads only its visibility slice.

SURVEY §7 step 6: "multi-host ingest sharding".  The reference loads whole
datasets in one process (``ImageDataset.hs:36-41``).  Here every process
reads its own contiguous visibility range with sliced HDF5 reads
(``io.h5.read_dataset_slice``) and the global sharded arrays are assembled
with ``jax.make_array_from_process_local_data`` — no process ever
materializes the full dataset, and the bytes each host reads scale as 1/P.

The returned arrays are sharded over the mesh's visibility axes and feed
``parallel.sharded.make_sharded_wproj_step`` directly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io import h5, schema


def _vis_axes(mesh: Mesh) -> Tuple[str, ...]:
    return tuple(mesh.axis_names)


def load_vis_sharded(datfile: str, mesh: Mesh, n: int | None = None):
    """Read this process's visibility slice; return global sharded arrays.

    Returns (uvw [n,3], vis [n] complex, freq float) with uvw/vis sharded
    over all mesh axes (visibility-parallel).  ``n`` is truncated to a
    multiple of the mesh size.
    """
    from ..models.dataset import vis_record_geometry

    n_total, nbl, nch = vis_record_geometry(datfile)
    ndev = mesh.devices.size
    n = min(n, n_total) if n is not None else n_total
    n -= n % ndev                       # equal shards
    per_proc = n // jax.process_count()
    pid = jax.process_index()
    s0 = pid * per_proc

    uvw_local = h5.read_dataset_slice(datfile, schema.VIS_UVW, s0, per_proc)
    t0 = s0 // nbl
    t1 = (s0 + per_proc - 1) // nbl + 1
    block = np.asarray(
        h5.read_dataset_slice(datfile, schema.VIS_VIS, t0, t1 - t0)
    ).reshape(-1, nch)[:, 0]
    off = s0 - t0 * nbl
    vis_local = block[off:off + per_proc]
    freq = float(
        np.asarray(h5.read_dataset(datfile, schema.VIS_FREQUENCY)).ravel()[0]
    )

    spec = P(_vis_axes(mesh))
    sharding = NamedSharding(mesh, spec)
    uvw = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(uvw_local), (n, 3)
    )
    vis = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(vis_local), (n,)
    )
    return uvw, vis, freq
