"""MERGE/upsert semantics: action accounting, key conservation,
idempotency (seed R19 — the reference's blind re-upload, made
observable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.plans.upsert import merge_upsert

from .conftest import SF_DIR


def _tables(spark):
    orders = load_table(spark, SF_DIR, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
    )
    return base, updates


def test_merge_action_accounting(spark):
    base, updates = _tables(spark)
    merged = merge_upsert(
        base, updates, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    n_base = base.count()
    n_upd = updates.count()
    n_matched = base.join(updates, "o_orderkey", "left_semi").count()
    actions = {
        r["merge_action"]: r["n"]
        for r in merged.groupBy("merge_action").agg(F.count("*").alias("n")).collect()
    }
    assert actions.get("update", 0) == n_matched
    assert actions.get("insert", 0) == n_upd - n_matched
    assert actions.get("keep", 0) == n_base - n_matched
    # every key exactly once
    assert merged.count() == merged.select("o_orderkey").distinct().count()
    assert merged.count() == n_base + (n_upd - n_matched)


def test_merge_values_take_update_side(spark):
    base, updates = _tables(spark)
    merged = merge_upsert(
        base, updates, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    touched = merged.filter(F.col("merge_action") != "keep")
    assert touched.filter(F.col("o_orderstatus") != "R").count() == 0
    kept = merged.filter(F.col("merge_action") == "keep")
    assert (
        kept.join(updates, "o_orderkey", "left_semi").count() == 0
    )  # keep rows are exactly the non-matched base


def test_merge_is_idempotent(spark):
    base, updates = _tables(spark)
    cols = ["o_orderstatus", "o_totalprice"]
    once = merge_upsert(base, updates, "o_orderkey", cols)
    twice = merge_upsert(once.drop("merge_action"), updates, "o_orderkey", cols)
    a = {tuple(r) for r in once.drop("merge_action").collect()}
    b = {tuple(r) for r in twice.drop("merge_action").collect()}
    assert a == b
    # second application reports zero inserts (all keys already present)
    actions = {
        r["merge_action"]: r["n"]
        for r in twice.groupBy("merge_action").agg(F.count("*").alias("n")).collect()
    }
    assert actions.get("insert", 0) == 0
