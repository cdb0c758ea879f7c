"""UDF / UDAF / UDTF surface (SURVEY.md §2B).

Demonstrates every Python-extension mechanism the engine supports, each
with a DuckDB oracle so the driver can hash-check the semantics:

- ``udf_python_scalar`` — row-at-a-time ``@udf``. Deliberately the
  SLOW path (pickled per row); kept for API completeness and for
  logic that genuinely can't vectorize. Hot paths use built-ins.
- ``udf_pandas_vectorized`` — Arrow-batched ``@pandas_udf`` scalar:
  ~10-100× the row UDF's throughput, the right Python escape hatch.
- ``udaf_pandas_grouped`` — ``applyInPandas`` per-group aggregation
  (the reference's per-IP grouping, app.py:391-397, generalized to
  arbitrary per-group Python).
- ``udtf_chunk_expand`` — one row → N rows. Implemented with the
  JVM-side ``explode(sequence(...))`` (the reference's
  ``iterate_chunks`` generator, app.py:336-353); a Python ``@udtf``
  would only slow it down, which is itself the design point.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "udf_python_scalar",
    oracle="""
        SELECT s_suppkey,
               'OX.' || s_name || '.' || CAST(s_nationkey AS VARCHAR) AS seed_id
        FROM supplier
    """,
    tags=("udf",),
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF building the reference's SEED id string
    (app.py:206-208). Semantically identical to concat built-ins — the
    query exists to exercise the ``@udf`` mechanism end-to-end."""

    @F.udf(returnType=T.StringType())
    def seed_id(name: str, nationkey: int) -> str:
        return f"OX.{name}.{nationkey}"

    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey", seed_id(F.col("s_name"), F.col("s_nationkey")).alias("seed_id")
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
               CASE WHEN l_quantity >= 30 THEN 'bulk' ELSE 'retail' END AS band
        FROM lineitem
        WHERE l_returnflag = 'A'
    """,
    tags=("udf",),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar Pandas UDF: whole-column numpy arithmetic
    (identical IEEE ops to the SQL expression, so values hash-match the
    oracle bit-for-bit)."""

    @F.pandas_udf(T.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    @F.pandas_udf(T.StringType())
    def band(qty: pd.Series) -> pd.Series:
        return pd.Series(["bulk" if q >= 30 else "retail" for q in qty])

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
        band("l_quantity").alias("band"),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal,
               ROUND(MAX(c_acctbal) - MIN(c_acctbal), 2) AS bal_range
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("udf",),
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group custom aggregation via ``applyInPandas``: each market
    segment's rows arrive as ONE pandas frame (the reference's
    dict[ip → list] grouping, app.py:391-397). The kernel here computes
    sums/ranges; a real use computes whatever pandas/numpy can —
    gap profiles, percentile fits, model scoring.

    Scale note: one shuffle on the group key; a hot key concentrates
    its rows in one task, so keys must be bounded-cardinality-per-group
    (or pre-aggregated) at 100 TB."""
    schema = T.StructType(
        [
            T.StructField("c_mktsegment", T.StringType(), False),
            T.StructField("n_cust", T.LongType(), False),
            T.StructField("total_bal", T.DoubleType(), False),
            T.StructField("bal_range", T.DoubleType(), False),
        ]
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "n_cust": [len(pdf)],
                "total_bal": [round(float(bal.sum()), 2)],
                "bal_range": [round(float(bal.max() - bal.min()), 2)],
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").applyInPandas(profile, schema)


@register(
    "udtf_chunk_expand",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS window_start,
               unnest(generate_series(
                   CAST(o_orderdate AS TIMESTAMP),
                   CAST(o_orderdate AS TIMESTAMP) + INTERVAL 23 HOUR,
                   INTERVAL 6 HOUR)) AS chunk_start
        FROM orders
        WHERE o_orderkey <= 1000
    """,
    tags=("udf", "udtf"),
)
def udtf_chunk_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function expansion: one request row → N chunk rows (the
    reference's ``iterate_chunks`` generator, app.py:336-353, 6-hour
    chunks here). Runs as JVM-side explode(sequence(...)) — the UDTF
    surface whose fast path needs no Python at all."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("window_start"),
        F.explode(
            F.sequence(
                F.col("o_orderdate"),
                F.col("o_orderdate") + F.expr("INTERVAL 23 HOUR"),
                F.expr("INTERVAL 6 HOUR"),
            )
        ).alias("chunk_start"),
    )


@register(
    "udtf_python_chunks",
    oracle="""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        idx AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i
            FROM tok
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               array_to_string(toks[(i*10+1):((i+1)*10)], ' ') AS chunk_text,
               CAST(len(array_to_string(toks[(i*10+1):((i+1)*10)], ' ')) AS INTEGER)
                   AS n_chars
        FROM idx
    """,
    tags=("udf", "udtf"),
)
def udtf_python_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): one document → N 10-word chunk
    rows, the LLM-pipeline chunking primitive (context-window packing).

    This is the *generator* extension surface the reference's
    ``iterate_chunks`` (app.py:336-353) would map to when the per-row
    logic is genuinely Python; the pure-arithmetic variant is JVM-side
    ``explode(sequence(...))`` (``udtf_chunk_expand``). The UDTF runs
    once per input row in a Python worker; keep the heavy path
    JVM-side and reserve this for logic built-ins can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk_text: string, n_chars: int")
    class ChunkDoc:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(0, (len(toks) + 9) // 10):
                chunk = " ".join(toks[i * 10 : (i + 1) * 10])
                yield i, chunk, len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_chars
        FROM documents_udtf d, LATERAL chunk_doc(d.text) c
        """
    )


@register(
    "udaf_pandas_agg_window",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey)
               / (100.0 * COUNT(*) OVER (PARTITION BY o_custkey))
                   AS cust_avg_price
        FROM orders
    """,
    tags=("udf", "window"),
)
def udaf_pandas_agg_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDF applied over an unbounded window — the
    third pandas-UDF mode (scalar and grouped-map are covered by
    ``udf_pandas_vectorized`` / ``udaf_pandas_grouped``). The Arrow
    batch carries each partition's column once; the aggregate broadcasts
    back to every row without a self-join.

    Exact arithmetic: prices are cents-exact doubles, so both sides sum
    integer cents (order-free, exact) and divide once — the quotient is
    the same IEEE double bit-for-bit. The r3 driver hash failure came
    from ROUND(mean, 4) on means produced by different summation orders:
    176/15000 rows sat on opposite sides of the 4th-decimal boundary."""
    from pyspark.sql import Window as W

    @F.pandas_udf("double")
    def mean_price(v: pd.Series) -> float:
        cents = np.round(v.to_numpy() * 100.0).astype(np.int64)
        return float(cents.sum()) / (100.0 * len(cents))

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        mean_price("o_totalprice").over(w).alias("cust_avg_price"),
    )


@register(
    "udf_arrow_batch",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS net_cents
        FROM lineitem
        WHERE l_quantity >= 30
    """,
    tags=("udf", "arrow"),
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` mechanism witness — the zero-copy sibling of
    ``mapInPandas``: the Python stage receives raw
    ``pyarrow.RecordBatch`` objects (no pandas materialization, no
    index/NaN coercions) and returns them, the right tool when the
    kernel is itself Arrow-native (pyarrow.compute, polars, DuckDB-WASM
    style engines). The net-price-in-cents math runs entirely in
    ``pyarrow.compute`` on the batch buffers; the pushed-down quantity
    filter stays JVM-side — only surviving rows cross the Arrow
    boundary. Semantically identical to built-ins (the oracle proves
    it); the query exists to pin the mapInArrow batch contract
    end-to-end, exactly like ``udf_python_scalar`` pins ``@udf``."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 30
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")

    def net_cents(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            # half_towards_infinity (= half away from zero): pyarrow
            # defaults to banker's rounding (half-to-even), which
            # disagrees with SQL ROUND at exact .5 cents — 3 of 500
            # fixture rows land there
            net = pc.round(
                pc.multiply(
                    pc.multiply(
                        batch.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                    ),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            )
            # cast keys to the DECLARED output types: the fixture stores
            # l_linenumber as int32, and a returned Arrow vector whose
            # physical type mismatches the schema fails JVM-side access
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column("l_orderkey"), pa.int64()),
                    pc.cast(batch.column("l_linenumber"), pa.int64()),
                    pc.cast(net, pa.int64()),
                ],
                ["l_orderkey", "l_linenumber", "net_cents"],
            )

    return li.mapInArrow(
        net_cents, "l_orderkey long, l_linenumber long, net_cents long"
    )


@register(
    "udaf_arrow_grouped",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
               CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS max_price_cents
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("udf", "arrow"),
)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` mechanism witness — the GROUPED sibling of
    ``mapInArrow`` (Spark 4): each group's rows arrive as one
    ``pyarrow.Table`` and the aggregation runs in ``pyarrow.compute``
    on the buffers, no pandas materialization — the shape for
    Arrow-native grouped kernels (polars aggregations, Arrow-UDF
    libraries). Shuffle semantics are identical to any groupBy: one
    hash shuffle on the key, then per-group Python cost proportional
    to group size — at 100 TB the key must be bounded-cardinality,
    exactly like ``udaf_pandas_grouped``'s caveat. The oracle proves
    the arithmetic equals built-in aggregates; the query pins the
    grouped Arrow boundary (schema contract, typed key passthrough,
    half-away rounding) end-to-end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )

    def agg_group(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        qty = pc.sum(pc.cast(table.column("l_quantity"), pa.int64()))
        cents = pc.max(
            pc.cast(
                pc.round(
                    pc.multiply(
                        table.column("l_extendedprice"), pa.scalar(100.0)
                    ),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )
        return pa.Table.from_pydict(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n_items": [table.num_rows],
                "total_qty": [qty.as_py()],
                "max_price_cents": [cents.as_py()],
            },
            schema=pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("n_items", pa.int64()),
                    ("total_qty", pa.int64()),
                    ("max_price_cents", pa.int64()),
                ]
            ),
        )

    return li.groupBy("l_returnflag").applyInArrow(
        agg_group,
        schema=(
            "l_returnflag string, n_items long, total_qty long,"
            " max_price_cents long"
        ),
    )
