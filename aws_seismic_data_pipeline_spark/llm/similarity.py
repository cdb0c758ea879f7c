"""Approximate-nearest-neighbor similarity search (north star).

No reference seed — capability extension for training-data pipelines.
Two plans over the ``embeddings`` fixture (unit-normalized, so cosine =
dot product, computed with JVM-side higher-order functions — no Python
UDF in the hot path):

- ``sim_topk_bruteforce``: exact top-k, query-set broadcast × full
  corpus. Correctness baseline; at 100 TB this is one pass over the
  corpus per query batch — viable only for small query sets.
- ``sim_topk_bucketed``: IVF-style — restrict search to the query's
  cluster (the ``label`` column plays the coarse quantizer cell).
  Search cost drops to corpus/n_cells per query; this is the scale
  path, and partition-pruning on the cell id makes it one bucket scan.

Ranking determinism: rank on the score rounded to 6dp with vec_id as
tiebreak, so Spark and DuckDB (whose float reduction order may differ
in the last bit) produce identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register

_DOT = (
    "aggregate(zip_with(q.embedding, c.embedding,"
    " (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


@register(
    "sim_topk_bruteforce",
    oracle="""
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6)
                                DESC, c.vec_id
                   ) AS BIGINT) AS rank
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """,
    tags=("llm", "similarity"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors (brute force)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    ).alias("q")
    # corpus side repartitioned: single-file fixture = one input split,
    # and the dot-product scan is compute-bound (no-op at real scale)
    c = emb.repartition(spark.sparkContext.defaultParallelism).alias("c")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("c.vec_id") != F.col("q.query_id"))
        .withColumn("dot", F.expr(_DOT))
    )
    w = W.partitionBy("q.query_id").orderBy(
        F.round(F.col("dot"), 6).desc(), F.col("c.vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round("dot", 4).alias("cosine"),
            "rank",
        )
    )


@register(
    "sim_topk_bucketed",
    oracle="""
        SELECT query_id, neighbor_id, label, cosine, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.label,
                   ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6)
                                DESC, c.vec_id
                   ) AS BIGINT) AS rank
            FROM embeddings q
            JOIN embeddings c
              ON q.label = c.label AND c.vec_id <> q.vec_id
            WHERE q.vec_id < 50
        ) WHERE rank <= 3
    """,
    tags=("llm", "similarity"),
)
def sim_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: top-3 neighbors searched only within the query's
    cluster cell (label). The equi-join on label is the bucket probe —
    at scale it becomes a partition-pruned scan of one cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).alias("q")
    c = emb.repartition(spark.sparkContext.defaultParallelism).alias("c")
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.label") == F.col("c.label"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .withColumn("dot", F.expr(_DOT))
    )
    w = W.partitionBy("q.vec_id").orderBy(
        F.round(F.col("dot"), 6).desc(), F.col("c.vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("q.label").alias("label"),
            F.round("dot", 4).alias("cosine"),
            "rank",
        )
    )
