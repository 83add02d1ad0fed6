"""Gridder family tests: scatter vs numpy oracle, OOB policy, adjointness.

Fixture scale mirrors the reference's SmallTest module (tiny deterministic
kernels, a 10×10 grid, a couple of visibilities — SURVEY §4) plus randomized
larger cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_tpu import ops
from ska_sdp_tpu.utils import oracle


def _rand_cplx(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


class TestGridNearest:
    def test_matches_oracle(self, rng):
        n = 64
        p = rng.uniform(-0.45, 0.45, size=(100, 3))
        vis = _rand_cplx(rng, 100)
        got = np.asarray(
            ops.grid_nearest(
                jnp.zeros((n, n), jnp.complex128), jnp.asarray(p), jnp.asarray(vis)
            )
        )
        want = oracle.grid_nearest(np.zeros((n, n), np.complex128), p, vis)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_collisions_accumulate(self):
        n = 16
        p = np.zeros((5, 3))
        vis = np.ones(5, dtype=np.complex128)
        got = np.asarray(
            ops.grid_nearest(
                jnp.zeros((n, n), jnp.complex128), jnp.asarray(p), jnp.asarray(vis)
            )
        )
        assert got[8, 8] == 5.0 and got.sum() == 5.0


class TestConvgrid:
    def test_matches_oracle(self, rng):
        n, qpx, gs = 48, 2, 7
        gcf = _rand_cplx(rng, (qpx, qpx, gs, gs))
        p = rng.uniform(-0.35, 0.35, size=(60, 3))
        vis = _rand_cplx(rng, 60)
        got = np.asarray(
            ops.convgrid(
                jnp.asarray(gcf),
                jnp.zeros((n, n), jnp.complex128),
                jnp.asarray(p),
                jnp.asarray(vis),
                chunk=16,
            )
        )
        want = oracle.convgrid(gcf, np.zeros((n, n), np.complex128), p, vis)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_oob_dropped(self, rng):
        # p near ±0.5 pushes patches over the edge; OOB elements vanish
        n, qpx, gs = 32, 2, 9
        gcf = np.ones((qpx, qpx, gs, gs), dtype=np.complex128)
        p = np.array([[0.49, 0.49, 0.0], [-0.49, -0.49, 0.0], [0.0, 0.49, 0.0]])
        vis = np.ones(3, dtype=np.complex128)
        got = np.asarray(
            ops.convgrid(
                jnp.asarray(gcf),
                jnp.zeros((n, n), jnp.complex128),
                jnp.asarray(p),
                jnp.asarray(vis),
                chunk=2,
            )
        )
        want = oracle.convgrid(gcf, np.zeros((n, n), np.complex128), p, vis)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert np.abs(got).sum() < 3 * gs * gs  # some taps actually dropped


class TestConvgridWproj:
    def test_matches_oracle(self, rng):
        n, nw, qpx, gs = 48, 3, 2, 7
        bank = _rand_cplx(rng, (nw, qpx, qpx, gs, gs))
        p = rng.uniform(-0.35, 0.35, size=(50, 3))
        wbin = rng.integers(0, nw, size=50)
        vis = _rand_cplx(rng, 50)
        got = np.asarray(
            ops.convgrid_wproj(
                jnp.asarray(bank),
                jnp.zeros((n, n), jnp.complex128),
                jnp.asarray(p),
                jnp.asarray(wbin),
                jnp.asarray(vis),
                chunk=16,
            )
        )
        want = oracle.convgrid_wproj(
            bank, np.zeros((n, n), np.complex128), p, wbin, vis
        )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_chunk_padding_invariance(self, rng):
        # result must not depend on the chunk size (padding correctness)
        n, nw, qpx, gs = 32, 2, 2, 5
        bank = _rand_cplx(rng, (nw, qpx, qpx, gs, gs))
        p = rng.uniform(-0.3, 0.3, size=(13, 3))
        wbin = rng.integers(0, nw, size=13)
        vis = _rand_cplx(rng, 13)
        outs = [
            np.asarray(
                ops.convgrid_wproj(
                    jnp.asarray(bank),
                    jnp.zeros((n, n), jnp.complex128),
                    jnp.asarray(p),
                    jnp.asarray(wbin),
                    jnp.asarray(vis),
                    chunk=c,
                )
            )
            for c in (1, 4, 13, 64)
        ]
        for o in outs[1:]:
            np.testing.assert_allclose(o, outs[0], atol=1e-12)


class TestConvgridAW:
    def test_matches_composed_oracle(self, rng):
        # AW gridding == w-proj gridding with per-vis precomputed conj(AW)
        n, nw, qpx, s, nant = 40, 2, 2, 9, 3
        ak = _rand_cplx(rng, (nant, s, s)) * 0.3
        wk = _rand_cplx(rng, (nw, qpx, qpx, s, s)) * 0.3
        b = 12
        p = rng.uniform(-0.3, 0.3, size=(b, 3))
        wbin = rng.integers(0, nw, size=b)
        a1 = rng.integers(0, nant, size=b)
        a2 = rng.integers(0, nant, size=b)
        vis = _rand_cplx(rng, b)

        got = np.asarray(
            ops.convgrid_aw(
                jnp.asarray(wk),
                jnp.asarray(ak),
                jnp.zeros((n, n), jnp.complex128),
                jnp.asarray(p),
                jnp.asarray(wbin),
                jnp.asarray(a1),
                jnp.asarray(a2),
                jnp.asarray(vis),
                chunk=5,
            )
        )

        # oracle: build conj(AW) per vis with the direct convolution, then
        # scatter with the plain oracle gridder
        x, xf, y, yf = oracle.frac_coords((n, n), qpx, p)
        want = np.zeros((n, n), np.complex128)
        for k in range(b):
            inner = oracle.convolve2d_direct(np.asarray(ak[a1[k]]), np.asarray(ak[a2[k]]))
            awk = np.conj(
                oracle.convolve2d_direct(inner, np.asarray(wk[wbin[k], yf[k], xf[k]]))
            )
            oracle._scatter_patch(
                want, int(y[k]) - s // 2, int(x[k]) - s // 2, vis[k] * awk
            )
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestDegrid:
    def test_adjoint_dot_product(self, rng):
        # <scatter(v), G> == <v, degrid(G)> — exact linear adjointness
        n, nw, qpx, gs = 40, 3, 2, 7
        bank = jnp.asarray(_rand_cplx(rng, (nw, qpx, qpx, gs, gs)))
        b = 25
        p = jnp.asarray(rng.uniform(-0.35, 0.35, size=(b, 3)))
        wbin = jnp.asarray(rng.integers(0, nw, size=b))
        vis = jnp.asarray(_rand_cplx(rng, b))
        G = jnp.asarray(_rand_cplx(rng, (n, n)))

        Av = ops.convgrid_wproj(
            bank, jnp.zeros((n, n), jnp.complex128), p, wbin, vis, chunk=8
        )
        AtG = ops.degrid_wproj(bank, G, p, wbin, chunk=8)

        lhs = jnp.vdot(G, Av)      # <G, A v>
        rhs = jnp.vdot(AtG, vis)   # <A† G, v>
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-11)

    def test_roundtrip_recovers_smooth_signal(self, rng):
        # degrid(grid(v)) with a normalized kernel approximately preserves
        # a constant visibility set when points are well separated.
        n, qpx, gs = 64, 2, 7
        kern = np.zeros((qpx, qpx, gs, gs))
        kern[:, :, gs // 2, gs // 2] = 1.0  # delta kernel
        bank = jnp.asarray(kern[None].astype(np.complex128))
        b = 10
        # distinct, well-separated cells
        p = jnp.asarray(
            np.stack(
                [
                    np.linspace(-0.3, 0.3, b),
                    np.linspace(-0.25, 0.35, b),
                    np.zeros(b),
                ],
                axis=1,
            )
        )
        wbin = jnp.zeros((b,), jnp.int32)
        vis = jnp.asarray(_rand_cplx(rng, b))
        G = ops.convgrid_wproj(
            bank, jnp.zeros((n, n), jnp.complex128), p, wbin, vis
        )
        back = ops.degrid_wproj(bank, G, p, wbin)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vis), atol=1e-12)


class TestScatterGatherHelpers:
    def test_scatter_then_gather(self, rng):
        H = W = 32
        patches = jnp.asarray(_rand_cplx(rng, (4, 5, 5)))
        y0 = jnp.asarray([0, 10, 27, -2])   # includes OOB top-left
        x0 = jnp.asarray([3, 20, 29, 31])
        g = ops.scatter_patches(
            jnp.zeros((H, W), jnp.complex128), y0, x0, patches, chunk=2
        )
        # total mass equals sum of in-bounds patch elements
        mask_sum = 0
        pn = np.asarray(patches)
        for k in range(4):
            for i in range(5):
                for j in range(5):
                    y, x = int(y0[k]) + i, int(x0[k]) + j
                    if 0 <= y < H and 0 <= x < W:
                        mask_sum += pn[k, i, j]
        np.testing.assert_allclose(complex(g.sum()), complex(mask_sum), atol=1e-12)

        # gather reads back what was written for non-overlapping patches
        got = ops.gather_patches(g, y0[:2], x0[:2], 5, 5, chunk=2)
        np.testing.assert_allclose(np.asarray(got), pn[:2], atol=1e-12)
