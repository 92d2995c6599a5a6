"""Query plans: the declared-operator registry (SURVEY.md §2 contract).

Importing this package loads every query module, which registers each
declared operator's (Spark callable, DuckDB oracle SQL) pair into
``oeem_etl_spark.plans.registry``.
"""

from oeem_etl_spark.plans import registry  # noqa: F401


def load_all() -> None:
    """Import every query module so their @query decorators run."""
    from oeem_etl_spark.plans import (  # noqa: F401
        relational_queries,
        function_queries,
        etl_queries,
        llm_queries,
        streaming_queries,
        source_queries,
        misc_queries,
        tpch_queries,
        corpus_queries,
        breadth_queries,
        breadth3_queries,
        breadth4_queries,
        breadth5_queries,
        breadth6_queries,
        breadth7_queries,
        breadth8_queries,
        breadth9_queries,
        hostile_queries,
        scale_queries,
    )
