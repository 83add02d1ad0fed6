"""Unit tests for the numerics core: coords, FFT, hermitian, weighting.

Mirrors the reference's micro-fixture strategy (SURVEY §4: fftshift ramps,
padding, scatter bounds) but as *asserted* tests against the numpy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_tpu import ops
from ska_sdp_tpu.utils import oracle


class TestFracCoord:
    def test_matches_oracle(self, rng):
        p = rng.uniform(-0.5, 0.5, size=200)
        for qpx in (1, 2, 4, 8):
            cell, frac = ops.frac_coord(100, qpx, jnp.asarray(p))
            ocell, ofrac = oracle.frac_coord(100, qpx, p)
            np.testing.assert_array_equal(np.asarray(cell), ocell)
            np.testing.assert_array_equal(np.asarray(frac), ofrac)

    def test_frac_in_range(self, rng):
        p = rng.uniform(-0.5, 0.5, size=1000)
        for qpx in (2, 8):
            _, frac = ops.frac_coord(256, qpx, jnp.asarray(p))
            assert int(frac.min()) >= 0 and int(frac.max()) < qpx

    def test_known_values(self):
        # x = 50 + 0.25*100 = 75.0 exactly; cell floor(75 + .0625)=75, frac 0
        cell, frac = ops.frac_coord(100, 8, jnp.asarray([0.25]))
        assert int(cell[0]) == 75 and int(frac[0]) == 0
        # p=0.253 -> x=75.3, cell=75, frac=round(0.3*8)=2
        cell, frac = ops.frac_coord(100, 8, jnp.asarray([0.253]))
        assert int(cell[0]) == 75 and int(frac[0]) == 2


class TestFourier:
    def test_pad_extract_roundtrip(self, rng):
        a = rng.standard_normal((10, 10)) + 1j * rng.standard_normal((10, 10))
        for n in (16, 17, 32):
            padded = ops.pad_mid(jnp.asarray(a), n)
            back = ops.extract_mid(padded, 10)
            np.testing.assert_allclose(np.asarray(back), a)

    def test_pad_matches_oracle(self, rng):
        for n0, n in [(8, 16), (9, 16), (8, 15), (9, 15)]:
            a = rng.standard_normal((n0, n0)) * (1 + 0j)
            np.testing.assert_allclose(
                np.asarray(ops.pad_mid(jnp.asarray(a), n)), oracle.pad_mid(a, n)
            )

    def test_centered_fft_roundtrip(self, rng):
        a = rng.standard_normal((24, 24)) + 1j * rng.standard_normal((24, 24))
        rt = ops.fft_centered(ops.ifft_centered(jnp.asarray(a)))
        np.testing.assert_allclose(np.asarray(rt), a, atol=1e-12)

    def test_matches_oracle(self, rng):
        a = rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
        np.testing.assert_allclose(
            np.asarray(ops.ifft_centered(jnp.asarray(a))),
            oracle.ifft_centered(a),
            atol=1e-13,
        )


class TestHermitian:
    @pytest.mark.parametrize("n", [8, 9, 16, 17])
    def test_matches_oracle(self, rng, n):
        g = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        np.testing.assert_allclose(
            np.asarray(ops.make_grid_hermitian(jnp.asarray(g))),
            oracle.make_grid_hermitian(g),
            atol=1e-13,
        )

    def test_ifft_of_hermitian_grid_is_real(self, rng):
        # A grid built by gridding mirrored visibilities then hermitian-
        # completed must inverse-transform to a (numerically) real image.
        n = 32
        g = jnp.zeros((n, n), dtype=jnp.complex128)
        pts = rng.uniform(-0.4, 0.4, size=(20, 3))
        vis = rng.standard_normal(20) + 1j * rng.standard_normal(20)
        uvw, vism = ops.mirror_uvw(jnp.asarray(pts), jnp.asarray(vis))
        g = ops.grid_nearest(g, uvw / 1.0, vism)
        h = ops.make_grid_hermitian(g)
        img = ops.ifft_centered(h)
        assert float(jnp.max(jnp.abs(img.imag))) < 1e-10 * float(
            jnp.max(jnp.abs(img.real)) + 1e-30
        )


class TestMirrorWeight:
    def test_mirror_matches_oracle(self, rng):
        uvw = rng.uniform(-1, 1, size=(50, 3))
        vis = rng.standard_normal(50) + 1j * rng.standard_normal(50)
        ju, jv = ops.mirror_uvw(jnp.asarray(uvw), jnp.asarray(vis))
        ou, ov = oracle.mirror_uvw(uvw, vis)
        np.testing.assert_allclose(np.asarray(ju), ou)
        np.testing.assert_allclose(np.asarray(jv), ov)

    def test_doweight_matches_oracle(self, rng):
        theta, lam = 0.1, 180
        uvw = rng.uniform(-0.4 * lam, 0.4 * lam, size=(80, 3))
        vis = np.ones(80, dtype=np.complex128)
        got = ops.doweight(theta, lam, jnp.asarray(uvw), jnp.asarray(vis))
        want = oracle.doweight(theta, lam, uvw, vis)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)

    def test_uvw_lambda(self):
        uvw = jnp.asarray([[299792458.0, 0.0, -299792458.0]])
        out = ops.uvw_lambda(2.0, uvw)
        np.testing.assert_allclose(np.asarray(out), [[2.0, 0.0, -2.0]])


class TestFindClosest:
    def test_matches_oracle(self, rng):
        bins = np.sort(rng.uniform(-1000, 1000, size=17))
        w = rng.uniform(-1200, 1200, size=300)
        got = ops.find_closest(jnp.asarray(bins), jnp.asarray(w))
        want = oracle.find_closest(bins, w)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_tie_breaks_high(self):
        bins = jnp.asarray([0.0, 2.0])
        assert int(ops.find_closest(bins, jnp.asarray([1.0]))[0]) == 1

    def test_exact_hit(self):
        bins = jnp.asarray([-5.0, 0.0, 5.0])
        got = ops.find_closest(bins, jnp.asarray([-5.0, 0.0, 5.0]))
        np.testing.assert_array_equal(np.asarray(got), [0, 1, 2])
