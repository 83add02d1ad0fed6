"""Round-2 probe: bf16 phase matrices in the IDG Pallas kernel.

NEGATIVE result (BENCH.md r2): casting the E_y/E_x phase matrices to
bf16 for the four per-chunk MXU contractions (f32 accumulation) made the
kernel SLOWER (19.4 -> 18.3 M vis/s at the bench shape).  The chunk loop
is not matmul-bound — the 4 sin/cos (64,256) transcendental evaluations
+ issue overhead dominate; the bf16 casts add VPU work without relieving
the bottleneck.  Kept as a record; see the round-2 session for the
monkeypatched kernel variant used.
"""
print(__doc__)
