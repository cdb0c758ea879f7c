"""Incremental-maintenance + sketch-merge semantics.

The oracle already proves ``plan_incremental_agg`` equals a full
recompute; these tests pin the properties the oracle can't see: the
fold is associative across MULTIPLE deltas, and HLL sketch merges
match direct sketches (the re-aggregation contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.plans.incremental import _agg, fold_delta
from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _as_map(df):
    return {
        r["o_orderpriority"]: (r["n_orders"], round(r["total_price"], 2))
        for r in df.collect()
    }


def test_fold_is_associative_over_three_batches(spark):
    """state ⊕ d1 ⊕ d2 == agg(all): day-by-day maintenance converges to
    the same view regardless of how history was batched."""
    orders = load_table(spark, SF_DIR, "orders")
    b1 = _agg(orders.filter(F.col("o_orderdate") < "1995-01-01"))
    b2 = _agg(
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-06-01")
        )
    )
    b3 = _agg(orders.filter(F.col("o_orderdate") >= "1996-06-01"))
    folded = fold_delta(fold_delta(b1, b2, "o_orderpriority"), b3, "o_orderpriority")
    assert _as_map(folded) == _as_map(_agg(orders))


def test_fold_handles_groups_absent_from_either_side(spark):
    """A group seen only in the delta (or only in state) must pass
    through with the other side treated as zero."""
    orders = load_table(spark, SF_DIR, "orders")
    state = _agg(orders.filter(F.col("o_orderpriority") == "1-URGENT"))
    delta = _agg(orders.filter(F.col("o_orderpriority") == "3-MEDIUM"))
    merged = _as_map(fold_delta(state, delta, "o_orderpriority"))
    direct = _as_map(
        _agg(
            orders.filter(
                F.col("o_orderpriority").isin("1-URGENT", "3-MEDIUM")
            )
        )
    )
    assert merged == direct


def test_hll_estimates_within_2pct_and_merge_consistent(spark):
    """Sketch-of-union == union-of-sketches, and both land within 2% of
    the exact distinct count per group."""
    orders = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    merged = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in REGISTRY["agg_hll_partial_reaggregate"]
        .builder(spark, SF_DIR)
        .collect()
    }
    direct = {
        r["o_orderpriority"]: r["approx"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("approx"))
        .collect()
    }
    assert merged == direct, "sketch merge diverged from direct sketch"
    for prio, n in exact.items():
        assert abs(merged[prio] - n) / n < 0.02, (prio, merged[prio], n)


def test_promote_to_corpus_equals_rebuild(spark, tmp_path):
    """The continuous-crawl loop must be exact: a corpus artifact built
    from docs A then PROMOTED with accepted snapshot docs B classifies
    the next snapshot identically to an artifact rebuilt from A ∪ B in
    one shot — the dedup sibling of the IVF append==rebuild pin."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import load_table
    from aws_seismic_data_pipeline_spark.llm.dedup import (
        classify_snapshot_persisted,
        promote_to_corpus,
        write_corpus_index,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    part_a = docs.filter(F.col("doc_id") % 3 == 0)
    part_b = docs.filter(F.col("doc_id") % 3 == 1)
    snapshot = docs.filter(F.col("doc_id") % 3 == 2)

    rebuilt = str(tmp_path / "corpus_full")
    promoted = str(tmp_path / "corpus_incr")
    write_corpus_index(part_a.unionByName(part_b), rebuilt)
    write_corpus_index(part_a, promoted)
    promote_to_corpus(part_b, promoted)

    a = sorted(
        map(
            tuple,
            classify_snapshot_persisted(spark, snapshot, rebuilt).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            classify_snapshot_persisted(spark, snapshot, promoted).collect(),
        )
    )
    assert a == b and a


def test_promotion_catches_cross_batch_duplicates(spark, tmp_path):
    """The reason promotion exists: a document accepted in batch 1 must
    flag its re-crawl in batch 2 as exact_dup — without promotion the
    artifact only knows the original corpus and would wave the copy
    through as new."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import load_table
    from aws_seismic_data_pipeline_spark.llm.dedup import (
        classify_snapshot_persisted,
        promote_to_corpus,
        write_corpus_index,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 100)
    batch1 = docs.filter(F.col("doc_id").between(100, 199))

    index = str(tmp_path / "corpus_promote")
    write_corpus_index(corpus, index)

    # batch 2 re-crawls one batch-1 doc under a fresh id
    seed = batch1.limit(1).collect()[0]
    batch2 = spark.createDataFrame(
        [(999_999, seed["text"], seed["lang"], seed["source"], seed["n_chars"])],
        docs.schema,
    )

    # without promotion: the re-crawl looks new (or at best near-dup)
    before = classify_snapshot_persisted(spark, batch2, index).collect()[0]
    assert before["status"] != "exact_dup"

    promote_to_corpus(batch1, index)
    after = classify_snapshot_persisted(spark, batch2, index).collect()[0]
    assert after["status"] == "exact_dup", after


def test_compact_corpus_index_preserves_classification(spark, tmp_path):
    """Compaction must be pure maintenance: after several promotions
    (including a re-crawl that appends a duplicate md5 row) the
    compacted artifact classifies the next snapshot IDENTICALLY while
    holding strictly fewer data files — the small-file growth of
    continuous promotion reclaimed without touching semantics."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import (
        count_parquet_files,
        load_table,
    )
    from aws_seismic_data_pipeline_spark.llm.dedup import (
        classify_snapshot_persisted,
        compact_corpus_index,
        promote_to_corpus,
        write_corpus_index,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    index = str(tmp_path / "corpus_compact")
    write_corpus_index(docs.filter(F.col("doc_id") % 5 == 0), index)
    # several small promotions, one of them re-promoting an overlap so
    # the md5 table carries duplicate hash rows
    for m in (1, 2, 3, 1):
        promote_to_corpus(docs.filter(F.col("doc_id") % 5 == m), index)
    snapshot = docs.filter(F.col("doc_id") % 5 == 4)

    files_before = count_parquet_files(index)
    before = sorted(
        map(tuple, classify_snapshot_persisted(spark, snapshot, index).collect())
    )
    compact_corpus_index(spark, index)
    files_after = count_parquet_files(index)
    after = sorted(
        map(tuple, classify_snapshot_persisted(spark, snapshot, index).collect())
    )

    assert before == after and before
    assert files_after < files_before, (files_after, files_before)
    # md5 is one file, bands one per band partition
    assert count_parquet_files(f"{index}/md5") == 1
    import glob as _glob
    import os as _os

    for band_dir in _glob.glob(f"{index}/bands/band=*"):
        files = [
            f for f in _os.listdir(band_dir) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (band_dir, files)
