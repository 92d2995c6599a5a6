"""Shared fixed-point quantizer: ``round(expr · m)`` as a long, in pure
primitive arithmetic.

``F.round`` on a double codegens to ``BigDecimal.valueOf(x)`` (a
``Double.toString`` + object allocation per value); on quantization-heavy
paths that is ~2× the cost of the surrounding scan+project (measured
0.205 → 0.091 s on a 600k-row money column, and ~4× per element inside
array transforms). ``qlong`` computes exact round-half-away-from-zero on
the binary double — i.e. exactly DuckDB ``ROUND``'s value (std::round on
the binary product; strictly closer to the oracle than F.round's
shortest-decimal-repr reading, see plans/util.py CAVEAT) — via a
floor(+0.5) candidate plus a one-compare overshoot correction:

- ``c = floor(|d| + 0.5)`` never undershoots (for |d| < 2^52 every
  integer in range is representable, and nearest-rounding of a sum
  ≥ n+1 cannot land below the representable n+1), but can overshoot by
  one in the ulp/2-wide window just below each .5 boundary where the
  +0.5 add rounds up (e.g. |d| = 0.49999999999999994 → fl(|d|+0.5) = 1).
- The correction compares ``|d| - (c-1) < 0.5``: the subtraction of an
  integer ≤ |d|+1 from a double < 2^53 is exact (both are multiples of
  ulp(|d|) and the difference is smaller in magnitude), so the compare
  decides the true boundary and demotes an overshot candidate. When
  c = 0 (|d| < 0.5 with no bump) the condition is vacuously false
  (|d| + 1 ≥ 1 > 0.5 even after rounding), so the candidate stands.

Exact .5 doubles round away from zero under both this form and
BigDecimal HALF_UP; NULL propagates; NaN/±inf behave as through
F.round + cast (ANSI: error on the long cast). Beyond 2^52 doubles are
integral and spacing exceeds 1 — outside every integer-micros contract
in this repo (the long-sum aggregates bound |sum|, not just the value);
use the decimal path there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qlong(expr: Column, m: int | float = 1) -> Column:
    """``round(expr · m)`` as bigint — exact binary half-away-from-zero
    (= DuckDB ROUND; = F.round everywhere off the shortest-decimal-repr
    tie window) for |expr·m| < 2^52, ~2-4× cheaper per value than
    F.round (module docstring has the proof)."""
    d = expr * F.lit(m) if m != 1 else expr
    a = F.abs(d)
    c = F.floor(a + F.lit(0.5))  # bigint candidate; may overshoot by 1
    mag = F.when(a - (c - F.lit(1)) < F.lit(0.5), c - F.lit(1)).otherwise(c)
    return F.when(d < 0, -mag).otherwise(mag)


def qlong_np(v, m: int | float = 1):
    """Numpy twin of :func:`qlong` — identical candidate/overshoot
    arithmetic (module docstring proof) on a float64 ndarray; returns
    int64. The ONE quantizer for Arrow-kernel operators, so the Python
    and JVM paths cannot drift (streaming/ops.quantize_micros delegates
    here with m=1e6). Caller contract on non-finite values matches
    quantize_micros: NaN/±inf must be handled upstream (astype('int64')
    would map them to INT64_MIN silently)."""
    import numpy as np

    a = np.asarray(v, dtype="float64")
    d = a * m if m != 1 else a
    ad = np.abs(d)
    c = np.floor(ad + 0.5)  # candidate; may overshoot by 1 (see proof)
    mag = np.where(ad - (c - 1.0) < 0.5, c - 1.0, c)
    return np.where(d < 0, -mag, mag).astype("int64")
