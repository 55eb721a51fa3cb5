"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grid-cell ε-radius self-join over
geotagged documents) at sf0.001. ``queries()`` / ``oracle_sql()`` expose the
engine's operator surface with DuckDB oracles (see
``parallelcovertree_spark/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parallelcovertree_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ε-join (r=1.0, self-loops per reference semantics) over
    /root/testdata/sf0.001 documents geotagged by the deterministic encoder."""
    return registry.epsilon_join_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
