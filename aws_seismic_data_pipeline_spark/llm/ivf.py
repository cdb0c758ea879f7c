"""IVF approximate-nearest-neighbor with LEARNED centroids (north star).

``sim_topk_bucketed`` (llm/similarity.py) demonstrates the IVF *search*
shape using the fixture's label column as the coarse-quantizer cell.
This module closes the loop: the quantizer itself is TRAINED — a
distributed spherical k-means over the corpus — so the index needs no
ground-truth labels, which is the real situation for a 100 TB embedding
store.

Scale shape per k-means iteration (the textbook distributed EM step):

- **assign** — centroids (k × d floats, a few KB) ship in the task
  closure; one Arrow/numpy pass over the corpus computes ``argmax
  (C @ x)`` per vector. No shuffle.
- **update** — per-cell mean via ONE map-side-combinable aggregation:
  each partition pre-sums its vectors per cell (``applyInPandas`` after
  a cell shuffle would work, but summing components through
  ``posexplode`` + groupBy keeps it a pure built-in hash agg), then the
  k × d sums collect to the driver (tiny) and renormalize.

Search = probe the ``nprobe`` nearest cells per query, brute-force only
inside them with the same partial-top-k kernel as brute force
(llm/vector.py). Cost drops from O(corpus) to O(corpus × nprobe / k)
per query batch; the corpus is scanned pre-assigned (one extra int
column), never shuffled.

No SQL oracle — iterative training isn't SQL-expressible; the driver
records a rows-only check. ``tests/test_ivf.py`` asserts the strong
IVF property (result == exact top-k restricted to probed cells) on the
fixture, recall ≥ 0.9 on planted clustered data, and end-to-end
determinism. (The fixture embeddings are isotropic — labels carry no
geometric signal — so full-corpus recall there is ~nprobe/n_cells for
ANY cell-probing index; that is a property of the data, not the
index.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_seismic_data_pipeline_spark.catalog import load_table, spread
from aws_seismic_data_pipeline_spark.registry import register

N_CELLS = 10
N_ITERS = 3
N_PROBE = 2

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cell", T.IntegerType(), False),
    ]
)


def _assign_cells(corpus: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell) for every corpus vector: argmax dot vs centroids.

    Centroids ride the task closure (k × d ≈ KBs); one vectorized pass,
    no shuffle."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cells = np.argmax(X @ C.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(np.int64), "cell": cells}
            )

    return corpus.select("vec_id", "embedding").mapInPandas(assign, _ASSIGN_SCHEMA)


def train_centroids(
    corpus: DataFrame,
    k: int = N_CELLS,
    iters: int = N_ITERS,
) -> np.ndarray:
    """Spherical k-means over unit vectors, fully deterministic.

    Init: the k corpus vectors with the smallest ``md5(vec_id)`` — an
    order-stable pseudo-random draw (engine/layout/rerun-independent,
    same primitive as every sampler in this repo). Each iteration:
    closure-broadcast assign (no shuffle) + one hash-agg mean update
    (component rows via posexplode — map-side combinable), k × d values
    to the driver, renormalize. Empty cells keep their previous
    centroid."""
    d = len(corpus.select("embedding").first()[0])
    seed_rows = (
        corpus.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .collect()
    )
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed_rows])
    for _ in range(iters):
        assigned = _assign_cells(corpus, C)
        sums = (
            corpus.select("vec_id", "embedding")
            .join(assigned, "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            # round the component sums: float reduction order varies
            # with partitioning, and training must be layout-independent
            .agg(F.round(F.sum("val"), 6).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = C.copy()  # empty cells keep their previous centroid
        acc = np.zeros((k, d))
        cnt = np.zeros(k)
        for r in sums:
            acc[r["cell"], r["pos"]] = r["s"]
            cnt[r["cell"]] = r["n"]
        for c in range(k):
            if cnt[c] > 0:
                v = acc[c]
                norm = np.linalg.norm(v)
                if norm > 0:
                    nxt[c] = v / norm  # spherical: renormalize the mean
        C = nxt
    return C


def probe_topk(
    corpus_with_cell: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    centroids: np.ndarray,
    k: int,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Partial top-k restricted to each query's ``nprobe`` nearest cells.

    Same per-partition score/argpartition shape as
    ``vector.topk_dots``, with the label mask generalized to a
    per-query allowed-cell set (the multi-probe matrix rides the
    closure: n_q × k booleans)."""
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    cell_rank = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    allowed = np.zeros((len(queries), centroids.shape[0]), dtype=bool)
    for i, cells in enumerate(cell_rank):
        allowed[i, cells] = True

    pair_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("dot", T.DoubleType(), False),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy(np.int64)
            c_cells = pdf["cell"].to_numpy(np.int64)
            c_mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            dots = q_mat @ c_mat.T
            excluded = ~allowed[:, c_cells]
            excluded |= c_ids[None, :] == q_ids[:, None]
            dots[excluded] = -np.inf
            n_q, n_c = dots.shape
            kk = min(k + 16, n_c)
            if n_c > kk:
                part = np.argpartition(dots, -kk, axis=1)[:, -kk:]
            else:
                part = np.broadcast_to(np.arange(n_c), (n_q, n_c))
            vals = np.take_along_axis(dots, part, axis=1).ravel()
            keep = np.isfinite(vals)
            if keep.any():
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids, part.shape[1])[keep],
                        "neighbor_id": c_ids[part.ravel()][keep],
                        "dot": vals[keep],
                    }
                )

    return corpus_with_cell.select("vec_id", "embedding", "cell").mapInPandas(
        score, pair_schema
    )


def build_and_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 50,
    n_cells: int = N_CELLS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Train the quantizer, assign the corpus, probe-search the query set."""
    from aws_seismic_data_pipeline_spark.llm.vector import rank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = spread(emb, spark)
    centroids = train_centroids(corpus, k=n_cells)
    assigned = corpus.join(_assign_cells(corpus, centroids), "vec_id")
    # at 100 TB `assigned` is the persisted index table, written
    # partitioned by cell so probes prune at the scan; here: cache the
    # one-pass assignment for the search
    assigned = assigned.localCheckpoint(eager=False)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    ]
    candidates = probe_topk(assigned, queries, centroids, k=k, nprobe=nprobe)
    return rank_topk(candidates, k).select(
        "query_id",
        "neighbor_id",
        F.round("dot", 4).alias("cosine"),
        "rank",
    )


@register("sim_topk_ivf", tags=("llm", "similarity", "no-oracle"))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: spherical k-means
    (deterministic md5-order init, 3 iterations), corpus assigned to
    cells in one closure-broadcast pass, then top-5 search probing the
    2 nearest cells per query. Rows-only check (iterative training has
    no SQL form); recall vs exact brute force and rerun-determinism are
    pytest-asserted in tests/test_ivf.py."""
    return build_and_search(spark, sf_dir)
