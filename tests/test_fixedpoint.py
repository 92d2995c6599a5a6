"""Focused tests for the shared fixed-point quantizer (r9 optimization:
functions/fixedpoint.qlong replaced ``F.round(x·m).cast("long")`` on the
dsum/davg path and the hot operator sites; streaming/ops.quantize_micros
is its numpy twin). The contract: exact round-half-away-from-zero on the
BINARY double value (= DuckDB ROUND = F.round for |x·m| < 2^52),
including the adversarial ulp/2 window just below each .5 boundary where
a naive floor(|d|+0.5) overshoots."""

from __future__ import annotations

import decimal
import math

import pytest
from pyspark.sql import functions as F

from oeem_etl_spark.functions.fixedpoint import qlong
from oeem_etl_spark.streaming.ops import quantize_micros


def _ref_half_away(d: float) -> int:
    """True round-half-away-from-zero of the exact binary double value
    (Decimal(float) is exact; ROUND_HALF_UP on decimals = half away)."""
    q = decimal.Decimal(d).to_integral_value(rounding=decimal.ROUND_HALF_UP)
    return int(q)


# The adversarial grid: exact .5 ties (representable below 2^51), the
# floor(+0.5) overshoot window (largest double BELOW n.5), just-above
# values, zeros, and large magnitudes approaching 2^52.
ADVERSARIAL = [
    0.0,
    -0.0,
    0.5,
    -0.5,
    1.5,
    2.5,
    -2.5,
    3.49999999999999999,
    math.nextafter(0.5, 0.0),  # 0.49999999999999994 — the classic bug
    -math.nextafter(0.5, 0.0),
    math.nextafter(2.5, 0.0),
    math.nextafter(2.5, 4.0),
    math.nextafter(1.0e6 + 0.5, 0.0),
    1234567.499999999,
    1234567.5,
    2.0**51 - 0.5,  # .5 exactly representable at ulp=0.5
    2.0**51 + 0.5,
    2.0**52 - 1.0,
    -(2.0**52 - 1.0),
    1e-300,
    -1e-300,
]


def test_qlong_matches_f_round_and_binary_half_away(spark):
    """qlong ≡ F.round().cast(long) ≡ binary half-away on the adversarial
    grid AND on 20k seeded pseudo-random doubles, in one Spark job."""
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "d double")
    # seeded uniform doubles across several magnitudes (rand is seeded →
    # deterministic); offsets push values near .5 boundaries too
    r = spark.range(20_000).select(
        (
            (F.rand(seed=9) - F.lit(0.5))
            * F.pow(F.lit(10.0), (F.col("id") % 9).cast("double"))
        ).alias("d")
    )
    both = df.unionAll(r)
    out = both.select(
        F.col("d"),
        qlong(F.col("d")).alias("q"),
        F.round(F.col("d")).cast("long").alias("fr"),
    ).collect()
    for row in out:
        assert row.q == row.fr, (row.d, row.q, row.fr)
        assert row.q == _ref_half_away(row.d), (row.d, row.q)


def test_qlong_scaled_matches_f_round(spark):
    """With a 10^6 scale (the dsum path) the product expression is shared,
    so only the rounding differs — must agree everywhere on money-like
    and division-shaped values."""
    rows = [(p / q,) for p in range(1, 400) for q in (3, 7, 11, 13)]
    df = spark.createDataFrame(rows, "d double")
    m = 1_000_000
    out = df.select(
        qlong(F.col("d"), m).alias("q"),
        F.round(F.col("d") * F.lit(m)).cast("long").alias("fr"),
    ).where(F.col("q") != F.col("fr"))
    assert out.count() == 0


def test_qlong_null_propagates(spark):
    df = spark.createDataFrame([(None,), (1.25,)], "d double")
    out = {r.d: r.q for r in df.select("d", qlong(F.col("d")).alias("q")).collect()}
    assert out[None] is None
    assert out[1.25] == 1


def test_quantize_micros_exact_half_away():
    """The numpy twin: same overshoot-corrected semantics on the binary
    product |v|·1e6 — spot the window, the ties, and signs."""
    vals = [
        0.0,
        1.5e-6,  # product ≈ 1.5 → 2
        2.5e-6,
        -2.5e-6,
        0.1,
        -0.1,
        123.456789,
        # products landing in the floor(+0.5) overshoot window
        math.nextafter(0.5, 0.0) / 1e6,
        math.nextafter(1234567.5, 0.0) / 1e6,
    ]
    got = quantize_micros(vals)
    for v, g in zip(vals, got):
        prod = abs(v) * 1e6  # the binary product quantize_micros sees
        ref = int(math.copysign(_ref_half_away(prod), v)) if v else 0
        assert int(g) == ref, (v, int(g), ref)
