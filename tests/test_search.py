"""Inverted-index keyword search (llm/search.py): probe correctness
against raw-text ground truth, disjunctive ranking, bucket-level
partition pruning, and append == rebuild — the artifact-lifecycle
contract every persisted index in this repo carries."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.llm.search import (
    _N_BUCKETS,
    append_postings,
    build_inverted_index,
    keyword_search,
)

from .conftest import SF_DIR

TOKENS = ["vector", "dup", "spark"]


def _ground_truth(docs, tokens, mode):
    toks = F.array_distinct(F.split(F.lower("text"), " "))
    n_hit = None
    for t in tokens:
        term = F.array_contains(toks, t).cast("long")
        n_hit = term if n_hit is None else n_hit + term
    out = docs.select("doc_id", n_hit.alias("n_hit"))
    return out.filter(
        F.col("n_hit") == len(tokens) if mode == "all" else F.col("n_hit") > 0
    )


def test_keyword_search_matches_raw_text(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "idx")
    build_inverted_index(spark, docs, idx)

    for mode in ("all", "any"):
        got = sorted(
            (r.doc_id, r.n_hit)
            for r in keyword_search(spark, idx, TOKENS, mode=mode).collect()
        )
        want = sorted(
            (r.doc_id, r.n_hit)
            for r in _ground_truth(docs, TOKENS, mode).collect()
        )
        assert got == want and got, mode

    # a token absent from the corpus: conjunction with it is empty
    assert (
        keyword_search(spark, idx, TOKENS + ["zzzznotoken"], mode="all")
        .count()
        == 0
    )


def test_keyword_search_prunes_buckets(spark, tmp_path):
    """The probe must open only the query tokens' hash-bucket
    partitions — partition pruning visible in the executed scan's
    numFiles, which must be well below the index's total file count."""
    import glob

    from .test_catalog_scale import _executed_num_files

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "idx")
    build_inverted_index(spark, docs, idx)
    all_files = glob.glob(idx + "/bucket=*/*.parquet")
    n_buckets_present = len(glob.glob(idx + "/bucket=*"))
    assert n_buckets_present > 10  # fixture vocab spreads over buckets

    hit = keyword_search(spark, idx, TOKENS, mode="any")
    hit.count()
    opened = _executed_num_files(hit)
    # <= 3 buckets' worth of files out of the whole index
    per_bucket = max(1, len(all_files) // n_buckets_present)
    assert opened is not None and opened <= 3 * per_bucket < len(all_files)


def test_append_equals_rebuild(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    idx_app = str(tmp_path / "idx_app")
    build_inverted_index(spark, docs.filter(F.col("doc_id") % 5 != 0), idx_app)
    append_postings(spark, docs.filter(F.col("doc_id") % 5 == 0), idx_app)
    idx_full = str(tmp_path / "idx_full")
    build_inverted_index(spark, docs, idx_full)

    a = sorted(
        (r.token, r.doc_id, r.bucket)
        for r in spark.read.parquet(idx_app).collect()
    )
    b = sorted(
        (r.token, r.doc_id, r.bucket)
        for r in spark.read.parquet(idx_full).collect()
    )
    assert a == b and a

    # and the probe through the appended index agrees with ground truth
    got = sorted(
        (r.doc_id, r.n_hit)
        for r in keyword_search(spark, idx_app, TOKENS, mode="all").collect()
    )
    want = sorted(
        (r.doc_id, r.n_hit)
        for r in _ground_truth(docs, TOKENS, "all").collect()
    )
    assert got == want


def test_bucket_assignment_is_total(spark, tmp_path):
    """Every posting lands in [0, _N_BUCKETS) — pmod keeps negative
    xxhash64 values in range, so no token can fall outside the pruned
    probe's reach."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    idx = str(tmp_path / "idx")
    build_inverted_index(spark, docs, idx)
    rng = spark.read.parquet(idx).agg(
        F.min("bucket"), F.max("bucket")
    ).collect()[0]
    assert rng[0] >= 0 and rng[1] < _N_BUCKETS


def test_compaction_preserves_probes_and_bounds_files(spark, tmp_path):
    """After fragmenting the index with several appends (one of them a
    re-crawl duplicate batch), compaction must leave every probe result
    identical, collapse to one file per bucket, and physically dedupe
    the re-appended postings."""
    from aws_seismic_data_pipeline_spark.catalog import count_parquet_files
    from aws_seismic_data_pipeline_spark.llm.search import compact_postings

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "idx")
    build_inverted_index(spark, docs.filter(F.col("doc_id") % 4 == 0), idx)
    for m in (1, 2, 3):
        append_postings(spark, docs.filter(F.col("doc_id") % 4 == m), idx)
    # re-crawl: batch 1 arrives again
    append_postings(spark, docs.filter(F.col("doc_id") % 4 == 1), idx)

    before = sorted(
        (r.doc_id, r.n_hit)
        for r in keyword_search(spark, idx, TOKENS, mode="any").collect()
    )
    n_files_frag = count_parquet_files(idx)
    n_rows_frag = spark.read.parquet(idx).count()

    compact_postings(spark, idx)

    after = sorted(
        (r.doc_id, r.n_hit)
        for r in keyword_search(spark, idx, TOKENS, mode="any").collect()
    )
    assert after == before and after
    n_files_comp = count_parquet_files(idx)
    assert n_files_comp < n_files_frag
    import glob

    for bdir in glob.glob(idx + "/bucket=*"):
        assert len(glob.glob(bdir + "/*.parquet")) == 1
    # the duplicate batch's rows are physically gone
    n_rows_comp = spark.read.parquet(idx).count()
    assert n_rows_comp < n_rows_frag
    assert spark.read.parquet(idx).distinct().count() == n_rows_comp


def test_keyword_search_property_random_token_sets(spark, tmp_path):
    """For ANY mix of present and absent tokens and either mode, the
    index probe must agree with raw-text ground truth — hypothesis
    drives token sets over one shared build (the bloom property test's
    sibling for the text artifact)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "idx_prop")
    build_inverted_index(spark, docs, idx)
    vocab = sorted(
        r.t
        for r in docs.select(
            F.explode(
                F.array_distinct(F.split(F.lower("text"), " "))
            ).alias("t")
        )
        .distinct()
        .collect()
        if r.t
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.sets(st.sampled_from(vocab), min_size=1, max_size=4),
        st.sets(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz", min_size=8, max_size=12
            ),
            max_size=2,
        ),
        st.sampled_from(["all", "any"]),
    )
    def check(present, absent, mode):
        toks = sorted(present | {a for a in absent if a not in vocab})
        got = sorted(
            (r.doc_id, r.n_hit)
            for r in keyword_search(spark, idx, toks, mode=mode).collect()
        )
        want = sorted(
            (r.doc_id, r.n_hit)
            for r in _ground_truth(docs, toks, mode).collect()
        )
        assert got == want, (toks, mode)

    check()


def test_bm25_matches_hand_scores(spark, monkeypatch):
    """BM25 on a 3-doc corpus must equal the hand-computed Robertson
    formula: rarer query terms score higher, longer docs are penalized
    at equal tf, and only docs containing ≥1 query term appear."""
    import math

    import aws_seismic_data_pipeline_spark.llm.text as T
    from aws_seismic_data_pipeline_spark.registry import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, "spark join fast"),
            (2, "spark spark spark spark spark spark spark pad pad pad"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(T, "load_table", lambda s, d, t: docs)
    monkeypatch.setattr(T, "spread", lambda df, s: df)
    out = {r.doc_id: r for r in REGISTRY["text_bm25_topk"].builder(spark, "x").collect()}

    assert 3 not in out  # no query term -> no candidate row
    n, avgdl = 3.0, (3 + 10 + 3) / 3.0
    k1, b = T.BM25_K1, T.BM25_B

    def score(tf, dl, df):
        idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 6)
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))

    # doc1: spark tf1 df2, join tf1 df1; doc2: spark tf7 df2
    d1 = round(score(1, 3, 2) + score(1, 3, 1), 6)
    d2 = round(score(7, 10, 2), 6)
    assert abs(out[1].bm25 - d1) < 2e-6, (out[1].bm25, d1)
    assert abs(out[2].bm25 - d2) < 2e-6, (out[2].bm25, d2)
    assert out[1].n_hit == 2 and out[2].n_hit == 1
    # 'join' (df=1) must out-score one 'spark' occurrence (df=2): the
    # two-term short doc outranks the term-stuffed long one (saturation)
    assert out[1].bm25 > out[2].bm25
    assert out[1].rank == 1
