"""v5e single-chip roofline constants shared by the bench harnesses.

Nominal public-spec ceilings for one TPU v5e chip, used by both
``benchmarks/suite.py`` (fit-level MFU columns) and
``benchmarks/large_n_trace.py`` (per-call GEMM rooflines) so a
recalibration cannot desynchronize the two reports.

The MXU executes a bf16 dot in 1 pass, a split-bf16 (bf16x3) dot in
3, and an f32 Precision.HIGHEST dot in 6 — GEMM work is expressed in
bf16-pass equivalents before dividing by ``PEAK_BF16``.
"""

PEAK_BF16 = 197e12            # bf16 MXU peak, FLOP/s
PEAK_HIGHEST = PEAK_BF16 / 6.0
HBM_BYTES_PER_S = 8.19e11     # HBM bandwidth, B/s
MXU_PASSES = {"bf16": 1, "bf16x3": 3, "f32": 6, "f64": 6}
