"""Set operators (SURVEY.md §2B).

Seeds: success ∪ dead-letter channel union (``/root/reference/
app.py:315-334`` placeholder records live beside real files) and the
migration's source-minus-destination reconciliation
(``upload_to_rfs.py:182-216``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "set_union_all",
    oracle="""
        SELECT o_orderkey, o_totalprice, 'high_value' AS channel
        FROM orders WHERE o_totalprice > 350000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'urgent' AS channel
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two channels, duplicates preserved (seed R15:
    success rows ∪ dead-letter rows with a channel discriminator)."""
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 350000.0).select(
        "o_orderkey", "o_totalprice", F.lit("high_value").alias("channel")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("channel")
    )
    return high.unionByName(urgent)


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection: customers active in both statuses."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "set_except",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct difference (seed R27: source keys minus destination keys
    drives the copy-verify-delete migration loop)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ordered = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.subtract(ordered)  # EXCEPT DISTINCT semantics


@register(
    "set_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics: nations having customers or
    suppliers, each once. Spark expresses it as union + distinct —
    Catalyst collapses the pair into one hash aggregate over the
    unioned children (one shuffle, same plan SQL UNION gets)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


@register(
    "set_except_all",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-key multiplicities
    subtract instead of collapsing — a customer with 5 orders, 2 of
    them finished, keeps 3 rows. The multiset semantics matter for
    reconciliation counts (seed R27: how many copies remain unmoved),
    where DISTINCT would hide duplicates."""
    orders = load_table(spark, sf_dir, "orders")
    all_keys = orders.select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_keys.exceptAll(finished)


@register(
    "set_intersect_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): keeps min(multiplicity)
    occurrences per key across both sides."""
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent_keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return open_keys.intersectAll(urgent_keys)


@register(
    "set_union_by_name",
    oracle="""
        SELECT id, src, amount, balance
        FROM (
            SELECT o_orderkey AS id, 'order' AS src,
                   o_totalprice AS amount
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL BY NAME
            SELECT c_custkey AS id, 'customer' AS src,
                   c_acctbal AS balance
            FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    tags=("setop",),
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (UNION ALL BY NAME): combine two extracts
    whose columns differ in order AND membership — matched by NAME, with
    absent columns null-filled. The append path every long-lived dataset
    eventually needs when a new field appears in one feed first; a
    positional UNION would silently misalign or reject.

    Scale: pure map-side concatenation, no shuffle (locked in plans)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("id"),
        F.lit("order").alias("src"),
        F.col("o_totalprice").alias("amount"),
    )
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("id"),
        F.lit("customer").alias("src"),
        F.col("c_acctbal").alias("balance"),
    )
    return a.unionByName(b, allowMissingColumns=True)
