"""Kernel synthesis and convolution tests.

Validates against analytic properties + the independent numpy oracle
(SmallTest-style deterministic fixtures — SURVEY §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_tpu import KernelOptions, ops
from ska_sdp_tpu.utils import oracle


class TestConvolve2d:
    @pytest.mark.parametrize("n", [7, 8, 15, 16])
    def test_matches_direct_convolution(self, rng, n):
        a1 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        a2 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        got = np.asarray(ops.convolve2d(jnp.asarray(a1), jnp.asarray(a2)))
        want = oracle.convolve2d_direct(a1, a2)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_matches_oracle_fft_impl(self, rng):
        n = 15
        a1 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        a2 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        got = np.asarray(ops.convolve2d(jnp.asarray(a1), jnp.asarray(a2)))
        np.testing.assert_allclose(got, oracle.convolve2d(a1, a2), atol=1e-10)

    def test_delta_identity(self):
        # convolving with a centered delta reproduces the input
        n = 15
        delta = np.zeros((n, n), dtype=np.complex128)
        delta[n // 2, n // 2] = 1.0
        a = np.arange(n * n, dtype=np.complex128).reshape(n, n)
        got = np.asarray(ops.convolve2d(jnp.asarray(a), jnp.asarray(delta)))
        np.testing.assert_allclose(got, a, atol=1e-10)

    def test_batched_leading_axes(self, rng):
        a = rng.standard_normal((3, 9, 9)) * (1 + 0j)
        b = rng.standard_normal((9, 9)) * (1 + 0j)
        got = np.asarray(ops.convolve2d(jnp.asarray(a), jnp.asarray(b)))
        for k in range(3):
            np.testing.assert_allclose(
                got[k], oracle.convolve2d_direct(a[k], b), atol=1e-10
            )


class TestWKernel:
    def test_matches_oracle(self):
        opts = KernelOptions(qpx=2, npix_ff=32, npix_kern=7)
        got = np.asarray(ops.w_kernel(0.1, 100.0, opts))
        want = oracle.w_kernel(0.1, 100.0, qpx=2, npix_ff=32, npix_kern=7)
        assert got.shape == (2, 2, 7, 7)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_zero_w_is_delta_like(self):
        # w=0 phase screen is all-ones; its transform concentrates at the
        # zero tap: the (0,0)-offset kernel's center dominates.
        opts = KernelOptions(qpx=2, npix_ff=64, npix_kern=9)
        k = np.asarray(ops.w_kernel(0.05, 0.0, opts))
        center = abs(k[0, 0, 4, 4])
        rest = np.abs(k[0, 0]).sum() - center
        assert center > 10 * rest

    def test_kernel_sums_preserve_flux(self):
        # Σ taps of the (0,0) sub-kernel ≈ Σ far-field / (npix_ff²) · qpx²-ish:
        # flux conservation within a tolerance (truncation to npix_kern).
        opts = KernelOptions(qpx=4, npix_ff=64, npix_kern=15)
        k = np.asarray(ops.w_kernel(0.05, 50.0, opts))
        # each oversampled sub-kernel should carry ~the same total flux
        sums = np.abs(k.sum(axis=(-2, -1)))
        assert sums.std() / sums.mean() < 0.05

    def test_batched_w_vector(self):
        opts = KernelOptions(qpx=2, npix_ff=32, npix_kern=7)
        ws = jnp.asarray([0.0, 50.0, 100.0])
        bank = np.asarray(ops.w_kernel(0.1, ws, opts))
        assert bank.shape == (3, 2, 2, 7, 7)
        single = np.asarray(ops.w_kernel(0.1, 50.0, opts))
        np.testing.assert_allclose(bank[1], single, atol=1e-12)

    def test_bank_is_conjugated(self):
        opts = KernelOptions(qpx=2, npix_ff=32, npix_kern=7)
        bank = np.asarray(ops.w_kernel_bank(0.1, jnp.asarray([100.0]), opts))
        single = np.asarray(ops.w_kernel(0.1, 100.0, opts))
        np.testing.assert_allclose(bank[0], np.conj(single), atol=1e-12)


class TestAWKernels:
    def _fixtures(self, rng, s=15, nant=3, nw=2, qpx=2):
        ak = rng.standard_normal((nant, s, s)) + 1j * rng.standard_normal(
            (nant, s, s)
        )
        wk = rng.standard_normal((nw, qpx, qpx, s, s)) + 1j * rng.standard_normal(
            (nw, qpx, qpx, s, s)
        )
        return jnp.asarray(ak), jnp.asarray(wk)

    def test_batched_matches_composed(self, rng):
        ak, wk = self._fixtures(rng)
        a_spec = ops.akernel_spectra(ak)
        w_spec = ops.wkernel_tap_spectra(wk)
        build = ops.make_aw_kernels_batched(15)
        a1 = jnp.asarray([0, 1, 2, 0])
        a2 = jnp.asarray([1, 2, 0, 0])
        wbin = jnp.asarray([0, 1, 0, 1])
        yf = jnp.asarray([0, 1, 0, 1])
        xf = jnp.asarray([1, 0, 0, 1])
        got = np.asarray(build(a_spec, w_spec, a1, a2, wbin, yf, xf))
        for k in range(4):
            want = np.conj(
                np.asarray(
                    ops.aw_kernel(
                        ak[int(a1[k])],
                        ak[int(a2[k])],
                        wk[int(wbin[k]), int(yf[k]), int(xf[k])],
                    )
                )
            )
            np.testing.assert_allclose(got[k], want, atol=1e-9)

    def test_aw_kernel_against_direct(self, rng):
        # aw = trunc(conv(trunc(conv(a1,a2)), w)) — verify both stages
        # against the O(n⁴) direct convolution.
        s = 9
        a1 = rng.standard_normal((s, s)) * (1 + 0j)
        a2 = rng.standard_normal((s, s)) * (1 + 0j)
        w = rng.standard_normal((s, s)) * (1 + 0j)
        inner = oracle.convolve2d_direct(a1, a2)
        want = oracle.convolve2d_direct(inner, w)
        got = np.asarray(
            ops.aw_kernel(jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(w))
        )
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestVariants:
    def test_fft_pow2_equals_direct_on_pow2_sizes(self, rng):
        from ska_sdp_tpu.ops import fft_centered, fft_pow2

        import jax.numpy as jnp
        a = jnp.asarray(rng.standard_normal((32, 32)) * (1 + 1j))
        np.testing.assert_allclose(
            np.asarray(fft_pow2(a)), np.asarray(fft_centered(a)), atol=1e-12
        )

    def test_convolve2d_cheap_matches_exact_for_compact_kernels(self, rng):
        # kernels concentrated near the center don't wrap: the cheap
        # (circular) variant agrees with the exact linear convolution
        from ska_sdp_tpu.ops import convolve2d, convolve2d_cheap

        import jax.numpy as jnp
        n = 16
        a = np.zeros((n, n), np.complex128)
        b = np.zeros((n, n), np.complex128)
        a[6:10, 6:10] = rng.standard_normal((4, 4))
        b[7:9, 7:9] = rng.standard_normal((2, 2))
        got = np.asarray(convolve2d_cheap(jnp.asarray(a), jnp.asarray(b)))
        want = np.asarray(convolve2d(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_kernel_coordinate_pattern_options(self):
        # pattern shift / 2x2 transform hooks (ref kernel_coordinates opts)
        from ska_sdp_tpu import KernelOptions
        from ska_sdp_tpu.ops import kernel_coordinates

        base_l, base_m = kernel_coordinates(8, 0.1, KernelOptions())
        l2, m2 = kernel_coordinates(
            8, 0.1, KernelOptions(pat_hor_shift=3, pat_ver_shift=-2)
        )
        np.testing.assert_allclose(np.asarray(l2 - base_l), 3.0)
        np.testing.assert_allclose(np.asarray(m2 - base_m), -2.0)
        # transform matrix [[0,1],[1,0]] swaps l and m
        l3, m3 = kernel_coordinates(
            8, 0.1, KernelOptions(pat_trans_mat=(0.0, 1.0, 1.0, 0.0))
        )
        np.testing.assert_allclose(np.asarray(l3), np.asarray(base_m))
        np.testing.assert_allclose(np.asarray(m3), np.asarray(base_l))


class TestSincosFast:
    """The streamed kernels' polynomial sin/cos (VERDICT r4 #6): at the
    f32 phase-representation floor over the kernels' full phase range."""

    def test_matches_f64_at_input_floor(self):
        from ska_sdp_tpu.kernels.idg_aw_stream_pallas import _sincos_fast

        rng = np.random.default_rng(3)
        # |ph| <= 110: |q*2pi*dy/S| <= 32*pi plus the quadratic w term
        ph64 = rng.uniform(-110, 110, 200_000)
        ph = jnp.asarray(ph64, jnp.float32)
        s, c = _sincos_fast(ph)
        # the error budget: polynomial error must not exceed ~1.2x the
        # error already embedded in representing the phase in f32
        repr_err = np.abs(np.sin(np.float32(ph64).astype(np.float64))
                          - np.sin(ph64)).max()
        assert np.abs(np.asarray(s) - np.sin(ph64)).max() < 1.5 * repr_err
        assert np.abs(np.asarray(c) - np.cos(ph64)).max() < 1.5 * repr_err

    def test_stream_kernel_fast_vs_exact_trig(self, rng):
        """The full streamed gridder with trig=fast stays within the
        split3 envelope of the trig=exact run (identical inputs)."""
        import os

        from ska_sdp_tpu.kernels.idg_aw_stream_pallas import (
            idg_aw_gridder_stream)
        from ska_sdp_tpu.ops.idg_aw import aw_screens_host

        N = 256
        nant, ntime, nbl = 4, 48, 6
        u0 = rng.uniform(-0.35, 0.35, (nbl, 2))
        du = rng.uniform(-20.0 / N, 20.0 / N, (nbl, 2))
        ft = (np.arange(ntime) / ntime)[:, None]
        uv = np.stack([u0[None, :, 0] + du[None, :, 0] * ft,
                       u0[None, :, 1] + du[None, :, 1] * ft], -1)
        n = nbl * ntime
        p = np.zeros((n, 3), np.float32)
        p[:, :2] = uv.reshape(n, 2)
        w = rng.uniform(-200, 200, n).astype(np.float32)
        ii, jj = np.triu_indices(nant, k=1)
        sel = rng.integers(0, ii.size, nbl)
        a1 = np.broadcast_to(ii[sel][None, :], (ntime, nbl)).ravel()
        a2 = np.broadcast_to(jj[sel][None, :], (ntime, nbl)).ravel()
        vis = (rng.standard_normal(n)
               + 1j * rng.standard_normal(n)).astype(np.complex64)
        ak = np.zeros((nant, 9, 9), np.complex64)
        ak[:, 4, 4] = 1.0
        scr = jnp.asarray(aw_screens_host(ak, 64).astype(np.complex64))
        mr = 8 * nbl + n // 128 + 64
        outs = {}
        for trig in ("exact", "fast"):
            os.environ["SKA_SDP_TPU_IDG_AW_TRIG"] = trig
            try:
                g, nd = idg_aw_gridder_stream(
                    (N, N), jnp.asarray(p), jnp.asarray(a1, jnp.int32),
                    jnp.asarray(a2, jnp.int32), jnp.asarray(w),
                    jnp.asarray(vis), scr, theta=0.05, subgrid=64,
                    max_runs=mr, interpret=True)
            finally:
                os.environ.pop("SKA_SDP_TPU_IDG_AW_TRIG", None)
            assert int(nd) == 0
            outs[trig] = np.asarray(g)
        d = (np.linalg.norm(outs["fast"] - outs["exact"])
             / np.linalg.norm(outs["exact"]))
        assert d < 2e-5, d
