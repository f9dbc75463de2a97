"""Engine-wide score-rounding convention.

Every serving path rounds similarity scores to ``round_to`` (default 4)
decimals before the top-k tie-break, so the convention IS part of the
answer: a k-boundary doc can enter or leave the result set on a 1-ulp
rounding difference. The engine pins ONE convention — decimal rounding
half-away-from-zero on the scaled value:

    round_half_up(x, nd) = sign(x) * floor(|x| * 10^nd + 0.5) / 10^nd

Why this one:
  - It is bit-identical to DuckDB's ``ROUND(DOUBLE, n)`` (the oracle the
    correctness gate hash-compares against), which computes
    ``std::round(x * 10^n) / 10^n`` — verified by fuzz over 700k doubles
    including 200k adversarial near-midpoint products
    (tests/test_sparse_wand.py::test_rounding_convention_matches_duckdb).
  - It agrees with Spark's ``F.round`` (BigDecimal HALF_UP) and Python's
    ``round`` on the observed midpoint class, e.g. the round-10 falsifier
    ``0.25 * 0.001 = 0.000250000000000000005…`` → 0.0003 under all three.
  - ``np.round`` does NOT: it half-even-rounds the scaled value, losing
    the 1-ulp excess (→ 0.0002 on the falsifier). That divergence was
    caught by Hypothesis in round 10 (test_wand_kernel_hypothesis_exact);
    numpy kernels must therefore never use ``np.round`` on score outputs.

This applies to SCORE rounding only. Pixel-domain rounding in the codec
stack (operators/multimodal.py) and the SQ8 codebook quantizer keep their
own conventions — those are internal representations, not oracle-compared
decimal scores.
"""

from __future__ import annotations

import numpy as np


def round_half_up(a, nd: int):
    """Decimal rounding, half away from zero on the scaled value —
    bit-identical to DuckDB ROUND(DOUBLE, nd). Accepts scalars or numpy
    arrays; returns the same shape as float64."""
    p = 10.0 ** nd
    x = np.asarray(a, dtype=np.float64)
    out = np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p
    return float(out) if np.isscalar(a) or out.ndim == 0 else out
