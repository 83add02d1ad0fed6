from .coords import frac_coord, frac_coords, mirror_uvw, to_grid_cell, uvw_lambda
from . import lowprec
from .convolution import (
    akernel_spectra,
    aw_kernel,
    convolve2d,
    convolve2d_cheap,
    make_aw_kernels_batched,
    wkernel_tap_spectra,
)
from .fourier import (
    extract_mid,
    fft_centered,
    fft_pow2,
    ifft_centered,
    ifft_pow2,
    next_pow2,
    pad_mid,
)
from .gridding import (
    convgrid,
    convgrid_aw,
    convgrid_wproj,
    degrid_wproj,
    gather_patches,
    grid_nearest,
    scatter_patches,
)
from .hermitian import make_grid_hermitian
from .search import find_closest
from .weighting import doweight
from .wkernel import (
    extract_oversampled,
    kernel_coordinates,
    w_kernel,
    w_kernel_bank,
    w_kernel_function,
)

__all__ = [
    "akernel_spectra",
    "aw_kernel",
    "convgrid",
    "convgrid_aw",
    "convgrid_wproj",
    "convolve2d",
    "convolve2d_cheap",
    "degrid_wproj",
    "doweight",
    "extract_mid",
    "extract_oversampled",
    "fft_centered",
    "fft_pow2",
    "find_closest",
    "frac_coord",
    "frac_coords",
    "gather_patches",
    "grid_nearest",
    "ifft_centered",
    "ifft_pow2",
    "kernel_coordinates",
    "lowprec",
    "make_aw_kernels_batched",
    "make_grid_hermitian",
    "mirror_uvw",
    "next_pow2",
    "pad_mid",
    "scatter_patches",
    "to_grid_cell",
    "uvw_lambda",
    "w_kernel",
    "w_kernel_bank",
    "w_kernel_function",
    "wkernel_tap_spectra",
]
