"""HDF5 dataset-tree schema of the SKA1_Low bundles.

Encodes the group layouts the reference reads/writes (SURVEY §3.4,
``/root/reference/src/ImageDataset.hs:86-148``):

  visibility file:
    /vis/vis        [ntime, nbl, nch] complex  (n = ntime·nbl records)
    /vis/uvw        [n, 3]      float64    (metres)
    /vis/antenna1   [n]         int64
    /vis/antenna2   [n]         int64
    /vis/time       [n]         float64    (MJD UTC)
    /vis/frequency  [nch]       float64    (Hz)

  The reference consumes only channel 0 (``ImageDataset.hs:99-106``);
  the single-channel drivers here keep that semantics.  The
  multi-channel drivers (``channels=`` / CLI ``--channels``) image every
  channel at its own frequency — per-channel uvw·f/c scaling, per-channel
  uniform weighting — amortizing record binning across a channel group.

  image output (single-channel; reference parity):
    /img            [n, n] float64
  multi-channel runs additionally write the spectral cube:
    /img_cube       [nch, n, n] float64   (/img is the channel mean)

  w-kernel file:
    /wkern/<theta>/<w>/kern     [qpx, qpx, s, s] complex
      — one group per w-plane center, group name = the w value as text;
        readers list the group, parse names as floats and sort numerically.

  A-kernel file:
    /akern/<theta>/<ant>/<time>/<freq>/kern   [s, s] complex
      — readers pick the closest <time> and <freq> to the observation and
        stack kernels over all antennas (sorted numerically).

Complex values are stored as the {r, i} float64 compound type — identical to
the reference's memory layout (``hdf5/hdf5.cc`` complextype) and to h5py's
native complex mapping, so files interoperate.
"""

from __future__ import annotations

VIS_GROUP = "/vis"
VIS_VIS = "/vis/vis"
VIS_UVW = "/vis/uvw"
VIS_ANTENNA1 = "/vis/antenna1"
VIS_ANTENNA2 = "/vis/antenna2"
VIS_TIME = "/vis/time"
VIS_FREQUENCY = "/vis/frequency"
IMG_DATASET = "/img"
IMG_CUBE_DATASET = "/img_cube"


def fmt_float(x: float) -> str:
    """Shortest clean decimal text for a float group name (e.g. '0.008')."""
    s = repr(float(x))
    return s[:-2] if s.endswith(".0") else s


def wkern_group(theta: float) -> str:
    return f"/wkern/{fmt_float(theta)}"


def wkern_dataset(theta: float, w_name: str) -> str:
    return f"{wkern_group(theta)}/{w_name}/kern"


def akern_group(theta: float) -> str:
    return f"/akern/{fmt_float(theta)}"


def akern_dataset(theta: float, ant: str, time: str, freq: str) -> str:
    return f"{akern_group(theta)}/{ant}/{time}/{freq}/kern"


def parse_sorted(names) -> list[tuple[float, str]]:
    """Parse group-member names as floats and sort numerically.

    Analog of the reference's ``convertAndSort``
    (``src/ImageDataset.hs:174-178``).
    """
    return sorted(((float(n), n) for n in names), key=lambda t: t[0])
