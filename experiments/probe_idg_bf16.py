"""Round-2 probe: bf16 phase matrices in the IDG Pallas kernel.

NEGATIVE result, and the explanation (BENCH.md r2): casting E_y/E_x to
bf16 made the kernel SLOWER (19.4 -> 18.3 M vis/s) because Mosaic's
DEFAULT f32 dot is ALREADY a single bf16 pass — measured directly:
a (64,256)x(256,64) Pallas dot at DEFAULT precision has 2.6e-3 max
relative error vs 1.3e-7 at precision=HIGHEST.  (Pallas sin/cos are
f32-accurate, ~1e-7.)  Consequences applied in round 2:

- IDG kernel + XLA DFT sandwiches: precision=HIGHEST (exact f32;
  IDG 19.4 -> 17.5 M — matmuls are only ~10%% of its time).
- fused-AW kernel: matmul-bound, HIGHEST costs 6.0 -> 3.4 M and a
  3-pass bf16 hi/lo split was worse (2.7 M, 410 s Mosaic compile);
  stays at the fast default (2.5e-3, the test tolerance) with
  SKA_SDP_TPU_AW_EXACT=1 opting into exact matmuls.
- Mosaic rejects precision=HIGH (bf16x3) — only DEFAULT/HIGHEST lower.
"""
print(__doc__)
