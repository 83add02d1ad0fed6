"""Checkpoint/resume for long gridding runs.

The reference is a single-shot batch job with no persistence beyond the
final image (SURVEY §5 "Checkpoint / resume: None").  Real SKA-scale runs
grid billions of visibilities; this module adds slab-granular
checkpointing: after each visibility slab the partial uv-grid and the
next-slab index are written to an HDF5 checkpoint (atomically, via a tmp
file + rename), and an interrupted run resumes from the last completed
slab.

Layout: ``/ckpt/grid_re``, ``/ckpt/grid_im`` (float64 [n, n]),
``/ckpt/next`` (float64 [1] — visibilities already gridded),
``/ckpt/total`` (float64 [1] — sanity check against the dataset).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..io import h5

def _norm(path: str) -> str:
    """The io façade appends .h5 to extension-less names (reference
    fix_ext semantics); normalize once so save/load/exists agree."""
    return path if path.endswith(".h5") else path + ".h5"


GRID_RE = "/ckpt/grid_re"
GRID_IM = "/ckpt/grid_im"
NEXT = "/ckpt/next"
TOTAL = "/ckpt/total"


def save(path: str, grid_re: np.ndarray, grid_im: np.ndarray, next_vis: int,
         total: int) -> None:
    """Atomically write a gridding checkpoint."""
    path = _norm(path)
    tmp = path + ".tmp.h5"
    h5.create_file(tmp)
    h5.write_dataset(tmp, GRID_RE, np.asarray(grid_re, np.float64))
    h5.write_dataset(tmp, GRID_IM, np.asarray(grid_im, np.float64))
    h5.write_dataset(tmp, NEXT, np.asarray([float(next_vis)]))
    h5.write_dataset(tmp, TOTAL, np.asarray([float(total)]))
    os.replace(tmp, path)


def load(path: str, n_grid: int,
         total: int) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Load a checkpoint; None if absent or inconsistent with the run."""
    path = _norm(path)
    if not os.path.exists(path):
        return None
    try:
        tot = int(np.asarray(h5.read_dataset(path, TOTAL))[0])
        if tot != total:
            return None
        gre = np.asarray(h5.read_dataset(path, GRID_RE))
        gim = np.asarray(h5.read_dataset(path, GRID_IM))
        if gre.shape != (n_grid, n_grid):
            return None
        nxt = int(np.asarray(h5.read_dataset(path, NEXT))[0])
        return gre, gim, nxt
    except Exception:
        return None


def remove(path: str) -> None:
    path = _norm(path)
    if os.path.exists(path):
        os.remove(path)
