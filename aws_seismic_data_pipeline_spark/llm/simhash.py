"""SimHash near-duplicate detection (north star dedup family).

SimHash maps a document to a 64-bit fingerprint whose Hamming distance
tracks token-set similarity: each token contributes ±1 per bit position
(sign taken from the token's hash), and the fingerprint takes the sign
of each accumulated position. Near-duplicate docs differ in few bits.

Token hashes derive from md5 (available in both Spark and DuckDB), so
the whole pipeline — fingerprint AND candidate pairs — is
oracle-checkable: no library-private hash seeds (contrast
``dedup_minhash_lsh``, which is rows-only for that reason).

Scale posture: fingerprinting is one map-side pass (O(64·tokens) per
doc, all JVM built-ins). Candidate generation blocks on 16-bit bands
(4 bands; Hamming distance ≤ 3 guarantees ≥1 identical band) — a
standard LSH argument — so the pair space is sum over band-buckets of
bucket², never n². The band join shuffles only (band_id, band_value,
doc_id, fingerprint-as-2-longs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_seismic_data_pipeline_spark.catalog import load_table, spread
from aws_seismic_data_pipeline_spark.registry import register

# First 15 hex chars of md5(token) → 60-bit non-negative int64; bit j
# contributes +1 if set else -1. 60 bits (not 64) keeps the value
# exactly representable in a signed BIGINT in both engines.
N_BITS = 60
BAND_BITS = 15
N_BANDS = N_BITS // BAND_BITS  # 4 bands → Hamming ≤ 3 ⇒ ≥1 shared band

# md5 is computed ONCE per distinct token into a hash array; the
# per-bit loop then only does shifts/adds (60 × n_tokens int ops, no
# re-hashing). Verified identical int64 values across engines.
_SPARK_HASHES = (
    "transform(array_distinct(split(text, ' ')),"
    " t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
)
_DUCK_HASHES = (
    "list_transform(list_distinct(string_split(text, ' ')),"
    " t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT))"
)


def _spark_simhash(hashes_col: str = "token_hashes") -> str:
    """Spark SQL expression: token-hash array → 60-bit simhash."""
    return f"""
    aggregate(
        sequence(0, {N_BITS - 1}),
        cast(0 as bigint),
        (acc, j) -> acc + if(
            aggregate({hashes_col}, 0,
                      (a, h) -> a + if((h >> j) & 1 = 1, 1, -1)) > 0,
            shiftleft(cast(1 as bigint), j), cast(0 as bigint)))
    """


def _duck_simhash(hashes_col: str = "token_hashes") -> str:
    """DuckDB SQL expression computing the identical 60-bit simhash."""
    return f"""
    list_sum(list_transform(range(0, {N_BITS}), j ->
        CASE WHEN list_sum(list_transform({hashes_col},
                 h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             THEN (1::BIGINT << j) ELSE 0 END))
    """


@register(
    "dedup_simhash",
    oracle=f"""
        SELECT doc_id,
               CAST(simhash AS BIGINT) AS simhash,
               CAST(bit_count(CAST(simhash AS BIGINT)) AS INTEGER)
                   AS n_set_bits
        FROM (
            SELECT doc_id, {_duck_simhash(_DUCK_HASHES)} AS simhash
            FROM documents
        )
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash fingerprint (md5-derived, engine-
    portable). The fingerprint column is what a 100 TB dedup pass
    persists; near-dup candidates come from banding it (see
    ``dedup_simhash_pairs``)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    hashed = docs.select("doc_id", F.expr(_SPARK_HASHES).alias("token_hashes"))
    sh = F.expr(_spark_simhash()).cast("long")
    return hashed.select(
        "doc_id",
        sh.alias("simhash"),
        F.bit_count(sh).cast("int").alias("n_set_bits"),
    )


def simhash_fingerprints_np(docs: DataFrame) -> DataFrame:
    """Vectorized simhash kernel: identical semantics to the SQL
    expression (same md5-derived token hashes, same sign rule) but
    computed with hashlib + numpy over Arrow batches — the 100 TB hot
    path (the interpreted higher-order lambda is ~50× slower; equality
    of the two paths is pytest-asserted)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )
    shifts = np.arange(N_BITS, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            out = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf["text"]):
                toks = list(dict.fromkeys(text.split(" ")))  # distinct, ordered
                hs = np.array(
                    [
                        cache.setdefault(
                            t, int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                        )
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = (hs[:, None] >> shifts) & np.uint64(1)  # (n_tok, 60)
                votes = 2 * bits.astype(np.int64).sum(axis=0) - len(toks)
                out[i] = int(
                    np.sum((votes > 0).astype(np.uint64) << shifts).astype(np.int64)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(run, schema)


@register(
    "dedup_simhash_pairs",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id,
                   CAST({_duck_simhash(_DUCK_HASHES)} AS BIGINT) AS simhash
            FROM documents
        ),
        bands AS (
            SELECT doc_id, simhash, b.band_id,
                   (simhash >> (b.band_id * {BAND_BITS}))
                       & {(1 << BAND_BITS) - 1} AS band_val
            FROM fp, (SELECT unnest(range(0, {N_BANDS})) AS band_id) b
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sh_a, b.simhash AS sh_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs at Hamming distance ≤ 3.

    Banded blocking: 4 × 15-bit bands; by pigeonhole any pair within
    Hamming 3 shares at least one full band, so the band equi-join
    finds all such pairs without an n² comparison. The post-filter on
    exact Hamming distance removes band collisions."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # Vectorized fingerprint kernel, then materialize BEFORE the
    # self-join: without the lineage cut, Catalyst collapses the
    # projection into both join inputs and re-evaluates the fingerprint
    # per candidate pair (measured ~3× slower even vectorized). At
    # scale this is the standard LSH shape — fingerprints are tiny
    # (16 B/doc) and reused by every band.
    # eager: materializing the fingerprints as their own job sidesteps a
    # scheduler pathology where the combined checkpoint+join+distinct
    # action straggles ~25 s (measured; the three steps run separately
    # take ~7 s total)
    fp = simhash_fingerprints_np(docs).localCheckpoint(eager=True)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band_id"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band_id * {BAND_BITS}) & {(1 << BAND_BITS) - 1}"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    # hamming filter BEFORE distinct: band collisions far outnumber true
    # near-dups, so the dedup shuffle only carries surviving pairs
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
