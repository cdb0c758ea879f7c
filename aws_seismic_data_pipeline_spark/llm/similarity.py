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

from aws_seismic_data_pipeline_spark.catalog import load_table, spread_dense
from aws_seismic_data_pipeline_spark.registry import register


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
    """Exact top-5 cosine neighbors for 10 query vectors (brute force).

    Execution is the vectorized partial-top-k plan (llm/vector.py):
    query matrix in the task closure, one Arrow+numpy pass over the
    corpus emitting per-partition candidates, then a tiny global
    re-rank — no corpus shuffle, ~100× the interpreted
    aggregate(zip_with(...)) throughput."""
    from aws_seismic_data_pipeline_spark.llm.vector import rank_topk, topk_dots

    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], None, r["embedding"])
        for r in emb.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    ]
    corpus = spread_dense(emb, spark, sf_dir)
    candidates = topk_dots(corpus, queries, k=5, same_label_only=False)
    return rank_topk(candidates, 5).select(
        "query_id",
        "neighbor_id",
        F.round("dot", 4).alias("cosine"),
        "rank",
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
    cluster cell (label; the coarse-quantizer cell id). Same vectorized
    partial-top-k plan as bruteforce but label-masked — at scale the
    corpus is partitioned by cell and only the probed cell is scanned."""
    from aws_seismic_data_pipeline_spark.llm.vector import rank_topk, topk_dots

    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], r["label"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 50)
        .select("vec_id", "label", "embedding")
        .collect()
    ]
    labels = {q[0]: q[1] for q in queries}
    corpus = spread_dense(emb, spark, sf_dir)
    candidates = topk_dots(corpus, queries, k=3, same_label_only=True)
    label_df = candidates.sparkSession.createDataFrame(
        [(qid, lab) for qid, lab in labels.items()], "query_id long, label int"
    )
    return (
        rank_topk(candidates, 3)
        .join(F.broadcast(label_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round("dot", 4).alias("cosine"),
            "rank",
        )
    )
