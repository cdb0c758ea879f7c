"""MERGE / upsert semantics (seed R19: the reference's re-upload path).

When the reference re-fetches a chunk it simply uploads again —
last-writer-wins overwrite by S3 key (``/root/reference/
app.py:461-463``; placeholder refresh ``app.py:271-273`` + re-tag
``app.py:466-480``). The engine form of "new data replaces matched
keys, lands otherwise" is MERGE: update-when-matched /
insert-when-not-matched, with per-row action accounting so a run can
report exactly what it changed (the observable the reference's blind
overwrite loses).

Implemented as a declarative full-outer join + coalesce — the exact
relational core a lakehouse MERGE executes underneath (minus
transactional file replacement, which parquet-on-filesystem cannot
give). Scale shape: ONE shuffle join on the merge key; with both sides
bucketed by key it degrades to a zipper join with zero exchange, and a
broadcast when the update batch is small — which is the common case
(daily delta ≪ accumulated table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Generic MERGE: rows from ``updates`` replace matched ``base``
    rows and insert otherwise; untouched base rows pass through. Adds
    ``merge_action`` ∈ {update, insert, keep}. Idempotent: applying the
    same update batch twice yields the same table."""
    b = base.select(key, *cols)
    u = updates.select(key, *cols)
    bk = F.col(f"b.{key}")
    uk = F.col(f"u.{key}")
    joined = b.alias("b").join(u.alias("u"), bk == uk, "full_outer")
    action = (
        F.when(uk.isNotNull() & bk.isNotNull(), F.lit("update"))
        .when(uk.isNotNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        F.coalesce(uk, bk).alias(key),
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols],
        action.alias("merge_action"),
    )


@register(
    "plan_merge_upsert",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 3 <> 0
        ),
        updates AS (
            -- surcharge as IEEE-exact double addition: round(x*1.1, 2)
            -- diverges between engines at halfway points (parity notes)
            SELECT o_orderkey,
                   'R' AS o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
               CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                         THEN 'update'
                    WHEN u.o_orderkey IS NOT NULL THEN 'insert'
                    ELSE 'keep' END AS merge_action
        FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
    tags=("plan", "sink"),
)
def plan_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo on the fixtures: the accumulated table is orders with
    ``orderkey % 3 <> 0`` (so some update keys are missing → inserts);
    the daily batch re-prices every urgent order (status 'R', +1000
    surcharge — an IEEE-exact double add, engine-parity-safe where a
    rounded product is not). Matched keys take the new values,
    unmatched batch rows insert, everything else passes through — with
    merge_action accounting. Idempotency (same batch twice ⇒ same
    table) is pytest-asserted in tests/test_upsert.py."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    updates = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
    )
    return merge_upsert(
        base, updates, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
