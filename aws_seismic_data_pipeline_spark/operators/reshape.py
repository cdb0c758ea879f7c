"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

No direct seed in the reference (its data is single-shaped), but any
engine replacing it needs both directions: pivot for status dashboards
(the reference's ``index.html`` status matrix is a hand-built pivot of
job states), unpivot to normalize wide metric tables into the long form
every aggregation operator expects.

Scale posture: ``pivot`` with an EXPLICIT value list compiles to a
single hash aggregate with one conditional-agg column per value — one
shuffle, no second pass to discover distinct values (never call
``pivot(col)`` without values at 100 TB: it runs a blocking distinct
first). ``unpivot`` is a zero-shuffle narrow transform (each row expands
to k rows in place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "pivot_status_counts",
    oracle="""
        SELECT o_orderpriority,
               CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS status_open,
               CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS status_filled,
               CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS status_partial,
               ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0.0), 2) AS open_value
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("reshape", "pivot"),
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot over an explicit status list (O/F/P).

    The explicit value list keeps the plan a single-shuffle conditional
    aggregate; missing (priority, status) cells surface as NULL from
    ``pivot`` and are coalesced to 0 to match SQL's empty-group
    convention."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("value"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("O_n"), F.lit(0)).alias("status_open"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("status_filled"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("status_partial"),
        F.coalesce(F.col("O_value"), F.lit(0.0)).alias("open_value"),
    )


@register(
    "unpivot_part_measures",
    oracle="""
        SELECT p_partkey, m_name, m_value FROM (
            SELECT p_partkey, 'size' AS m_name, CAST(p_size AS DOUBLE) AS m_value
            FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice' AS m_name, p_retailprice AS m_value
            FROM part
        )
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of part measures via ``DataFrame.unpivot``
    (Spark's UNPIVOT — the inverse of pivot; SQL equivalent is a
    UNION ALL of one select per measure). Values are cast to one
    common type (double) first, as UNPIVOT requires."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="m_name",
        valueColumnName="m_value",
    )
