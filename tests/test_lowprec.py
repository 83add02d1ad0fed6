"""Reduced-precision experiment tests (reference C14 analog).

The exhaustive 65,536-pattern posit16 round-trip mirrors the reference's
``test/POSIT.hs`` ``exhaustive`` check (SURVEY §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_tpu.ops import lowprec


class TestPosit16:
    def test_exhaustive_roundtrip(self):
        # decode every 16-bit pattern, encode back: must be the identity
        # (every posit16 value is exactly representable in float32)
        pats = jnp.arange(65536, dtype=jnp.int32)
        vals = lowprec.p16_to_f32(pats)
        back = lowprec.f32_to_p16(vals)
        np.testing.assert_array_equal(np.asarray(back) & 0xFFFF, np.asarray(pats))

    def test_known_values(self):
        # posit(16,1): 0x4000 = 1.0; 0x7FFF = maxpos = 2^28; 0x0001 = 2^-28
        vals = np.asarray(
            lowprec.p16_to_f32(jnp.asarray([0x0000, 0x4000, 0x7FFF, 0x0001]))
        )
        assert vals[0] == 0.0
        assert vals[1] == 1.0
        assert vals[2] == 2.0**28
        assert vals[3] == 2.0**-28

    def test_nar(self):
        assert np.isnan(np.asarray(lowprec.p16_to_f32(jnp.asarray([0x8000])))[0])
        assert int(lowprec.f32_to_p16(jnp.asarray([np.nan]))[0]) == 0x8000
        assert int(lowprec.f32_to_p16(jnp.asarray([np.inf]))[0]) == 0x8000

    def test_negatives_twos_complement(self):
        p = lowprec.f32_to_p16(jnp.asarray([-1.0]))
        assert int(p[0]) & 0xFFFF == 0xC000  # two's complement of 0x4000
        v = lowprec.p16_to_f32(p)
        assert float(v[0]) == -1.0

    def test_never_rounds_to_zero_or_nar(self):
        tiny = jnp.asarray([1e-30, -1e-30], jnp.float32)
        huge = jnp.asarray([1e30, -1e30], jnp.float32)
        pt = np.asarray(lowprec.f32_to_p16(tiny)) & 0xFFFF
        ph = np.asarray(lowprec.f32_to_p16(huge)) & 0xFFFF
        assert pt[0] == 0x0001 and pt[1] == 0xFFFF  # ±minpos
        assert ph[0] == 0x7FFF and ph[1] == 0x8001  # ±maxpos

    def test_round_nearest_even(self):
        # 1.0 + tiny epsilon rounds back to 1.0's encoding
        v = jnp.asarray([1.0 + 2.0**-14], jnp.float32)
        assert int(lowprec.f32_to_p16(v)[0]) == 0x4000

    def test_random_roundtrip_accuracy(self, rng):
        # encode→decode of random values: relative error bounded by the
        # local posit precision (12 fraction bits near 1)
        x = jnp.asarray(rng.uniform(0.5, 2.0, 1000), jnp.float32)
        y = lowprec.p16_to_f32(lowprec.f32_to_p16(x))
        rel = np.abs(np.asarray(y) - np.asarray(x)) / np.asarray(x)
        assert rel.max() < 2.0**-12


class TestQuantizers:
    def test_bf16_complex(self, rng):
        c = jnp.asarray(
            (rng.standard_normal(50) + 1j * rng.standard_normal(50)).astype(
                np.complex64
            )
        )
        q = lowprec.quantize_bf16(c)
        rel = np.abs(np.asarray(q - c)) / np.abs(np.asarray(c))
        assert rel.max() < 2.0**-7

    def test_error_study_ordering(self, rng):
        nw, qpx, s, b, n = 2, 2, 7, 64, 64
        bank = (
            rng.standard_normal((nw, qpx, qpx, s, s))
            + 1j * rng.standard_normal((nw, qpx, qpx, s, s))
        ).astype(np.complex64)
        p = jnp.asarray(rng.uniform(-0.3, 0.3, (b, 3)).astype(np.float32))
        wbin = jnp.asarray(rng.integers(0, nw, b), jnp.int32)
        vis = jnp.asarray(
            (rng.standard_normal(b) + 1j * rng.standard_normal(b)).astype(
                np.complex64
            )
        )
        errs = lowprec.gridding_quantization_error(
            bank, p, wbin, vis, (n, n), formats=["bf16", "posit16"]
        )
        # posit16 (12 frac bits near 1) beats bf16 (8) on unit-scale data
        assert errs["posit16"] < errs["bf16"] < 0.02
