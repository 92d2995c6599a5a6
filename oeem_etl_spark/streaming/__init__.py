"""Structured Streaming surface (SURVEY.md §2.I): pure transformations in
:mod:`~oeem_etl_spark.streaming.ops`, sources in
:mod:`~oeem_etl_spark.streaming.source`, execution/equivalence harness in
:mod:`~oeem_etl_spark.streaming.harness`."""

from oeem_etl_spark.streaming import harness, ops, source  # noqa: F401
