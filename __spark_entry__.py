"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-ingest plan at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` pairs each with DuckDB-runnable ANSI SQL (operators
whose semantics aren't SQL-expressible are omitted → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_seismic_data_pipeline_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["ingest_plan_daily"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
