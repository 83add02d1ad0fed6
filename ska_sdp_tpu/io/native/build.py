"""Build the native HDF5 shared library.

Compiles ``hdf5_native.cc`` against the system HDF5 *runtime* (the image
has no dev package, so we link by exact soname with ``-l:``).  Invoked
lazily by ``io.native_backend`` on first use; artifacts are cached next to
the sources in ``build/``.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_DIR, "build", "libskah5.so")

_HDF5_SONAMES = ["libhdf5_serial.so.103", "libhdf5.so.103", "libhdf5_serial.so", "libhdf5.so"]


def _find_hdf5() -> str:
    import ctypes.util

    for so in _HDF5_SONAMES:
        for libdir in ("/lib/x86_64-linux-gnu", "/usr/lib/x86_64-linux-gnu", "/usr/lib"):
            if os.path.exists(os.path.join(libdir, so)):
                return so
    found = ctypes.util.find_library("hdf5_serial") or ctypes.util.find_library("hdf5")
    if found:
        return found
    raise FileNotFoundError("no HDF5 runtime library found")


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "hdf5_native.cc")
    if not force and os.path.exists(LIB_PATH) and os.path.getmtime(
        LIB_PATH
    ) >= os.path.getmtime(src):
        return LIB_PATH
    os.makedirs(os.path.dirname(LIB_PATH), exist_ok=True)
    soname = _find_hdf5()
    cmd = [
        "g++",
        "-std=c++17",
        "-O2",
        "-shared",
        "-fPIC",
        src,
        "-o",
        LIB_PATH,
        "-L/lib/x86_64-linux-gnu",
        "-L/usr/lib/x86_64-linux-gnu",
        f"-l:{soname}" if soname.endswith((".so", ".103")) else f"-l{soname}",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
