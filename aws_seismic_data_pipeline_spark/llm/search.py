"""Inverted token index: keyword search over a 100 TB corpus.

Seed: the reference locates data by constructing object keys from
known (station, date) coordinates (``/root/reference/app.py:449-463``)
— it can never ask "which objects CONTAIN x?". This module adds that
missing direction as a persisted posting-list artifact: one build pass
tokenizes the corpus into (token, doc_id) postings written bucketed by
token hash; a probe then answers conjunctive/disjunctive keyword
queries by reading only the query tokens' buckets — candidate-bounded
work, never a corpus scan. The same artifact-lifecycle contract as the
dedup corpus index (``llm/dedup.py: write_corpus_index``) and the IVF
index (``llm/ivf.py``): build once, APPEND per ingest batch,
append == rebuild pinned in tests/test_search.py.

Tokenization is the repo's standard whitespace convention
(``llm/text.py: text_tokenize_stats``) lowered — chosen because DuckDB
expresses it exactly (``string_split(lower(text), ' ')``), so every
probe result is driver-hash-checkable against SQL ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table, spread
from aws_seismic_data_pipeline_spark.registry import register

#: token-hash buckets the postings are partitioned by: a probe for k
#: tokens opens at most k of these directories (partition pruning on
#: the literal bucket values), so probe I/O is query-sized however
#: large the corpus grows. 64 keeps directory counts tame at fixture
#: scale; a 100 TB deployment raises it with table size.
_N_BUCKETS = 64


def _tokens_col(text_col: str = "text"):
    """Lowered whitespace tokens, per-doc-deduplicated (postings are
    set-semantic: a doc lists each token once however often it repeats
    — term frequency is ``text_tfidf_topk``'s job, not the index's)."""
    return F.array_distinct(F.split(F.lower(F.col(text_col)), " "))


def _postings(docs: DataFrame) -> DataFrame:
    """(token, doc_id, bucket) posting rows for a document frame —
    shared by build and append so both generations tokenize
    identically. Empty tokens (from runs of whitespace) are dropped."""
    return (
        docs.select(
            "doc_id", F.explode(_tokens_col()).alias("token")
        )
        .filter(F.length("token") > 0)
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("token"), F.lit(_N_BUCKETS)).cast("int"),
        )
    )


def build_inverted_index(
    spark: SparkSession, docs: DataFrame, index_dir: str
) -> None:
    """One corpus pass: explode per-doc distinct tokens into posting
    rows and land them partitioned by token-hash bucket. Entirely
    JVM-side (split/explode higher-order expressions — no Python in the
    hot path); the only shuffle is the partitioned write's hash
    distribution. Posting lists for high-document-frequency tokens are
    long by nature — they cost probe I/O only when queried, and the
    conjunctive prober intersects via one count aggregate rather than
    materializing any list driver-side.

    The write clusters by bucket first (r16; guide §6 small files):
    without the repartition every tokenize task writes one file into
    every bucket directory — n_tasks × n_buckets tiny files (measured
    1410 files at sf0.1/local[32], and the slot anti-scaled: 32-core
    build 4× the 8-core time, PERF_r15 scaling ratio 0.25; one file
    per bucket after). Same shuffle-buys-layout trade as the IVF
    index's cell-partitioned write."""
    _postings(spread(docs, spark)).repartition("bucket").write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(index_dir)


def append_postings(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> None:
    """Incremental index maintenance: tokenize ONLY the newly ingested
    documents and append their postings into the same bucket layout —
    ingest-batch cost, mirroring ``append_stats_manifest`` and
    ``llm/ivf.py: append_to_index``. Append == rebuild is pinned in
    tests/test_search.py (set-semantic postings make the equality
    exact, not approximate). Clusters by bucket before the write for
    the same small-files reason as ``build_inverted_index`` (one file
    per touched bucket per batch, not one per task per bucket)."""
    _postings(spread(new_docs, spark)).repartition("bucket").write.partitionBy(
        "bucket"
    ).mode("append").parquet(index_dir)


def keyword_search(
    spark: SparkSession,
    index_dir: str,
    tokens: list[str],
    mode: str = "all",
) -> DataFrame:
    """Answer a keyword query from the posting index: read ONLY the
    query tokens' hash buckets (partition pruning on literal bucket
    values — probed via one tiny JVM job so Python never re-implements
    xxhash64), then one groupBy(doc_id) counting distinct matched
    tokens; ``mode='all'`` keeps docs matching every token (conjunctive
    AND), ``'any'`` keeps every candidate with its hit count
    (disjunctive OR, ranked by the caller). Returns (doc_id, n_hit).
    Work is posting-list-sized: the corpus text is never touched."""
    if not tokens:
        raise ValueError("keyword_search: empty token list")
    if mode not in ("all", "any"):
        raise ValueError(f"keyword_search: unknown mode {mode!r}")
    toks = sorted({t.lower() for t in tokens})
    try:
        idx = spark.read.parquet(index_dir)
    except Exception:
        # an index built from an EMPTY corpus has no data files (a
        # parquet write of 0 rows emits nothing readable) — bootstrap
        # state, not an error: no document can match
        return spark.createDataFrame([], "doc_id long, n_hit long")
    buckets = [
        r.b
        for r in spark.createDataFrame([(t,) for t in toks], "token string")
        .select(
            F.pmod(F.xxhash64("token"), F.lit(_N_BUCKETS))
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    ]
    hits = (
        idx
        .filter(F.col("bucket").isin(buckets) & F.col("token").isin(toks))
        .groupBy("doc_id")
        .agg(F.countDistinct("token").cast("long").alias("n_hit"))
    )
    if mode == "all":
        hits = hits.filter(F.col("n_hit") == len(toks))
    return hits


#: the demo conjunction — selective at every fixture SF (13 of 500 docs
#: at sf0.001, 161 of 5000 at sf0.1)
_SEARCH_TOKENS = ("vector", "dup", "spark")


@register(
    "text_keyword_search",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
            FROM documents
        )
        SELECT doc_id, lang,
               CAST({len(_SEARCH_TOKENS)} AS BIGINT) AS n_hit
        FROM t
        WHERE {" AND ".join(
            f"list_contains(toks, '{t}')" for t in _SEARCH_TOKENS
        )}
    """,
    tags=("llm", "text", "index"),
)
def text_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search THROUGH the persisted inverted index —
    'which documents contain all of {vector, dup, spark}?' answered
    without scanning any document text: build the posting index for
    most of the corpus, APPEND the rest (``append_postings`` — the
    ingest path), probe only the query tokens' buckets, and join the
    surviving doc_ids back to the dimension columns. The oracle
    recomputes the conjunction from raw text with ``list_contains``,
    so the driver hash-checks that the index neither drops nor invents
    matches across the append. At 100 TB: probe cost is posting-sized,
    and the decontamination / targeted-eviction queries the curation
    ops run (``text_decontaminate``) get an index to run against
    instead of a corpus scan."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    docs = load_table(spark, sf_dir, "documents")
    index_dir = scratch_path(spark, sf_dir, "inverted_index")
    with scratch_cleanup(index_dir):
        build_inverted_index(spark, docs.filter(F.col("doc_id") % 5 != 0), index_dir)
        append_postings(spark, docs.filter(F.col("doc_id") % 5 == 0), index_dir)
        hits = keyword_search(
            spark, index_dir, list(_SEARCH_TOKENS), mode="all"
        )
        return (
            hits.join(docs.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "lang", "n_hit")
            .localCheckpoint(eager=True)
        )


def compact_postings(spark: SparkSession, index_dir: str) -> None:
    """Maintenance for the posting artifact: every ``append_postings``
    call adds small files to each touched bucket partition, so
    thousands of crawl batches grow the probe-side file listing — the
    same small-file hazard ``llm/dedup.py: compact_corpus_index``
    handles for the dedup tables. One artifact-sized rewrite
    (``catalog.compact_parquet_dir``): distinct-deduped (set-semantic
    postings — a re-crawled doc re-appended must not double its rows;
    probes are already duplicate-proof via countDistinct, this keeps
    the ARTIFACT canonical too), re-clustered one file per bucket,
    atomically swapped. Probe results are exactly unchanged —
    compacted == fragmented is pinned in tests/test_search.py."""
    from aws_seismic_data_pipeline_spark.catalog import compact_parquet_dir

    compact_parquet_dir(spark, index_dir, partition_by="bucket", distinct=True)
