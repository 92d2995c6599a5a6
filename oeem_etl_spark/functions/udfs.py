"""UDF surfaces (SURVEY.md §2.J): the escape hatch for semantics built-ins
can't express — always Arrow-vectorized, never row-at-a-time pickling.

The reference's entire 'engine' was arbitrary per-record/per-group Python
(SURVEY.md §2.J [PK-high]); here that surface exists but is deliberately
thin: each public helper is a pattern users copy for their own logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

# NOTE: returnType must be a DataType instance, not a DDL string — DDL
# parsing at decoration time requires an active SparkSession, which breaks
# importing this module before the session exists.


@F.udf(returnType=Ty.StringType(), useArrow=True)
def reverse_text(s: str) -> str:
    """Arrow-optimized scalar UDF (J1): string reverse."""
    return s[::-1] if s is not None else None


@F.udf(returnType=Ty.StringType(), useArrow=True)
def canon_label(s: str) -> str:
    """Arrow-optimized scalar UDF (J1): canonicalize a free-text label —
    trim, collapse inner whitespace, uppercase. The record-linkage
    normalizer applied before key-based dedupe."""
    return " ".join(s.split()).upper() if s is not None else None


@F.pandas_udf(Ty.DoubleType())
def affine_value(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF (J2): 2x + 1 over an Arrow batch."""
    return v * 2.0 + 1.0


@F.pandas_udf(Ty.DoubleType())
def max_value(v: pd.Series) -> float:
    """Vectorized grouped-agg pandas UDF (J5). Max (not mean): exact under
    floats, so the oracle comparison never hits accumulation-order noise."""
    return v.max()


@F.pandas_udf(Ty.LongType())
def micros_total(v: pd.Series) -> int | None:
    """Vectorized grouped-agg pandas UDF (J5): exact integer-micros sum —
    each value quantized half-AWAY-from-zero via the ONE shared quantizer
    (streaming/ops.quantize_micros; ROUND parity — numpy .round is
    half-to-even), summed as int64. Order-independent and oracle-exact,
    the dsum discipline inside an Arrow-batched UDAF. SQL SUM semantics
    exactly (r9 review): NULLs (Arrow NaN) skip; an all-NULL group
    returns NULL, not 0; ±inf raises loudly instead of being silently
    deleted or cast to INT64_MIN."""
    import numpy as np

    from oeem_etl_spark.streaming.ops import quantize_micros

    a = v.to_numpy("float64")
    a = a[~np.isnan(a)]
    if np.isinf(a).any():
        raise ValueError("micros_total: non-finite (inf) value cannot quantize")
    if not len(a):
        return None
    return int(quantize_micros(a).sum())


def rebase_per_group(df: DataFrame, key: str, col: str, out: str) -> DataFrame:
    """Grouped-map applyInPandas (J3): subtract the group minimum — the
    reference's per-trace transform idiom. Schema is declared explicitly;
    each group arrives as one pandas frame (Arrow-batched). Min (not mean)
    keeps the float math exact and order-independent."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf[out] = pdf[col] - pdf[col].min()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema)


def filter_project_in_pandas(df: DataFrame, event_type: str) -> DataFrame:
    """mapInPandas (J4): per-partition pandas filter+project. Iterator of
    Arrow batches in, iterator out — constant memory per partition."""
    schema = "event_id bigint, user_id bigint, boosted double"

    def fn(it):
        for pdf in it:
            sel = pdf[pdf["event_type"] == event_type]
            out = pd.DataFrame(
                {
                    "event_id": sel["event_id"],
                    "user_id": sel["user_id"],
                    "boosted": sel["value"] * 1.5,
                }
            )
            yield out

    return df.mapInPandas(fn, schema)


@F.udf(returnType=Ty.IntegerType(), useArrow=True)
def vowel_count(s: str) -> int | None:
    """Arrow-optimized scalar UDF (J1): count of aeiou characters — the
    SQL-checkable stand-in for any per-string Python featurizer."""
    return sum(c in "aeiou" for c in s) if s is not None else None


@F.pandas_udf(Ty.DoubleType())
def clip_value(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF (J2): clip to [0, 50] over an Arrow
    batch — the winsorization primitive."""
    return v.clip(lower=0.0, upper=50.0)
