"""Sources & sinks (SURVEY.md §2B scans/sinks).

Seeds: JSON catalog load (``/root/reference/app.py:28-33``,
``config.json:1-24``), paginated S3 object listing
(``upload_to_rfs.py:16-35``), date-partitioned S3 key layout
(``app.py:449-463``), ensure-bucket-exists DDL (``app.py:530-553``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_seismic_data_pipeline_spark.catalog import (
    GOLDEN_SF_DIR,
    load_table,
    prepare,
)
from aws_seismic_data_pipeline_spark.registry import register

_TMP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "_tmp")


def _decode_input_file() -> F.Column:
    """``input_file_name()`` as a canonical local path: strip the
    ``file:`` scheme and decode the URI's %-escapes JVM-side, so paths
    containing spaces or other reserved characters compare equal to the
    plain filesystem paths a manifest records. ``url_decode`` follows
    ``URLDecoder`` in turning '+' into a space — file URIs never encode
    space that way — so a literal '+' is pre-escaped to '%2B' first,
    making the result exactly ``urllib.parse.unquote`` of the URI path."""
    uri = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    return F.url_decode(F.regexp_replace(uri, r"\+", "%2B"))


def _sink_path(name: str, sf_dir: str) -> str:
    """Sink path keyed by the sf fixture tag so interleaved runs at
    different scale factors never clobber each other between a query's
    eager write and its lazy read-back."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    return os.path.join(_TMP_DIR, f"{name}_{tag}")

# The station catalog the reference keeps in config.json:2-18, as data.
STATION_CATALOG = [
    {"network": "OX", "station": "NYM8", "location": "00", "channel": "HHZ",
     "sensor_ip": "10.144.0.10:8080"},
    {"network": "OX", "station": "NYM8", "location": "00", "channel": "HHN",
     "sensor_ip": "10.144.0.10:8080"},
    {"network": "OX", "station": "NYM8", "location": "00", "channel": "HHE",
     "sensor_ip": "10.144.0.10:8080"},
    {"network": "OX", "station": "CONW", "location": "00", "channel": "HHZ",
     "sensor_ip": "10.144.0.11:8080"},
    {"network": "OX", "station": "CONW", "location": "00", "channel": "HHN",
     "sensor_ip": None},
    {"network": "OX", "station": "DRUM", "location": "01", "channel": "HHZ",
     "sensor_ip": "10.144.0.12:8080"},
]

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("network", T.StringType(), False),
        T.StructField("station", T.StringType(), False),
        T.StructField("location", T.StringType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("sensor_ip", T.StringType(), True),
    ]
)


def write_catalog_json(path: str | None = None) -> str:
    """Materialize the station catalog as JSON-lines (deterministic)."""
    path = path or os.path.join(_TMP_DIR, "station_catalog.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for row in STATION_CATALOG:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    return path


@register(
    "scan_json_catalog",
    oracle="""
        SELECT network, station, location, channel, sensor_ip,
               CONCAT(network, '.', station, '.', location, '.', channel) AS seed_id,
               (sensor_ip IS NOT NULL) AS reachable
        FROM (
            VALUES
            ('OX', 'NYM8', '00', 'HHZ', '10.144.0.10:8080'),
            ('OX', 'NYM8', '00', 'HHN', '10.144.0.10:8080'),
            ('OX', 'NYM8', '00', 'HHE', '10.144.0.10:8080'),
            ('OX', 'CONW', '00', 'HHZ', '10.144.0.11:8080'),
            ('OX', 'CONW', '00', 'HHN', CAST(NULL AS VARCHAR)),
            ('OX', 'DRUM', '01', 'HHZ', '10.144.0.12:8080')
        ) AS t(network, station, location, channel, sensor_ip)
    """,
    tags=("source",),
)
def scan_json_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON catalog scan (seed R1): the reference's
    config.json dimension lists as an explicit-schema ``read.json``,
    with the SEED id projection (app.py:206) and reachability flag
    (app.py:239-241) computed declaratively."""
    prepare(spark)
    path = write_catalog_json()
    df = spark.read.schema(CATALOG_SCHEMA).json(path)
    return df.select(
        "network",
        "station",
        "location",
        "channel",
        "sensor_ip",
        F.concat_ws(".", "network", "station", "location", "channel").alias("seed_id"),
        F.col("sensor_ip").isNotNull().alias("reachable"),
    )


@register(
    "scan_binary_files",
    oracle=f"""
        SELECT regexp_extract(filename, '[^/]+$') AS file_name,
               CAST(size AS BIGINT) AS n_bytes,
               CAST(octet_length(content) AS BIGINT) AS content_len,
               substring(hex(content), 1, 32) AS head_hex
        FROM read_blob('{GOLDEN_SF_DIR}/*.parquet')
    """,
    tags=("source", "golden-sf0.01"),
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingest (seed R13/R25): distributed file listing with
    path/size/content, the Spark-native replacement for the reference's
    paginated list_objects_v2 loop (upload_to_rfs.py:16-35). The
    miniSEED analog: files are opaque bytes + a path that parses into
    metadata.

    Oracle (new in r4 — was rows-only): DuckDB ``read_blob`` lists the
    same files; size, byte length, and a 16-byte content prefix (hex)
    prove both engines read identical bytes. The driver's correctness
    run is pinned at sf0.01, hence the literal path (views can't cover
    a file listing); DuckDB has no blob md5, so the prefix replaces the
    earlier md5 column."""
    prepare(spark)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.length("content").cast("long").alias("content_len"),
        F.hex(F.substring("content", 1, 16)).alias("head_hex"),
    ).orderBy("file_name")


@register(
    "scan_csv_roundtrip",
    oracle="""
        SELECT r_regionkey, r_name, CAST(strlen(r_name) AS BIGINT) AS name_len
        FROM region
    """,
    tags=("source", "sink"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema'd CSV scan (text interchange format support):
    write region as headered CSV, read it back with an explicit schema
    (never inferSchema at scale — one extra full pass), project. Quotes/
    escapes handled by the writer; the oracle reads the parquet
    original, proving the round trip is lossless."""
    prepare(spark)
    sink = _sink_path("region_csv", sf_dir)
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").option("header", True).csv(sink)
    # explicit schema = the parquet original's (no inferSchema pass)
    back = spark.read.schema(region.schema).option("header", True).csv(sink)
    return back.select(
        "r_regionkey",
        "r_name",
        F.length("r_name").cast("long").alias("name_len"),
    )


@register(
    "sink_ensure_exists",
    oracle="""
        SELECT n_regionkey,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation
        GROUP BY n_regionkey
    """,
    tags=("sink", "ddl"),
)
def sink_ensure_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-create sink (seed R20: head_bucket → create_bucket on
    404, app.py:530-553). The engine form: ``CREATE TABLE IF NOT
    EXISTS`` + append-mode write, both no-ops when the target exists —
    run twice to prove idempotency, then read back the (single) copy.
    Replaces the reference's probe-then-create race with a catalog
    transaction."""
    prepare(spark)
    sink = _sink_path("sink_ensure_nation", sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    # overwrite once to reset, then two idempotent ensure-exists appends
    nation.limit(0).write.mode("overwrite").parquet(sink)
    nation.write.mode("append").parquet(sink)
    spark.read.parquet(sink)  # exists-probe: raises if create failed
    back = spark.read.parquet(sink)
    return back.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))


@register(
    "sink_partitioned_parquet",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_value
        FROM orders
        GROUP BY 1
    """,
    tags=("sink",),
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-sink round trip (seeds R17/R19/R20): write orders
    partitioned by year — the engine form of the reference's
    ``YYYYMMDD/`` S3 prefixes (app.py:449-463) — then read back relying
    on partition discovery and aggregate per partition. The read-back
    plan prunes partitions on the partition column; the write uses
    Spark's commit protocol, replacing upload-then-delete (app.py:
    461-488) with atomic task commits."""
    prepare(spark)
    sink = _sink_path("sink_orders_by_year", sf_dir)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("order_year").parquet(sink)
    back = spark.read.parquet(sink)
    return back.groupBy(F.col("order_year").cast("int").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


@register(
    "scan_partition_pruned",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00'
        GROUP BY event_type
    """,
    tags=("scan", "pruning"),
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan: events written Hive-partitioned by day
    (the engine form of the reference's ``YYYYMMDD/`` key prefixes,
    app.py:449-456), then read with a partition predicate.

    The read plan lists only 3 of ~30 day directories — Catalyst's
    PruneFileSourcePartitions turns the filter into directory-level
    pruning (PartitionFilters in .explain, asserted in
    tests/test_plans.py). At 100 TB this is THE difference between
    scanning 100 TB and scanning 10 GB: date predicates never touch
    non-matching files' footers, let alone their bytes."""
    prepare(spark)
    sink = _sink_path("events_by_day", sf_dir)
    marker = os.path.join(sink, "_SUCCESS")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_day", F.to_date("ts")
        )
        ev.write.mode("overwrite").partitionBy("event_day").parquet(sink)
    back = spark.read.parquet(sink)
    return (
        back.filter(
            (F.col("event_day") >= F.lit("2024-01-10"))
            & (F.col("event_day") < F.lit("2024-01-13"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "scan_orc_roundtrip",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey,
               CAST(strlen(n_name) AS INTEGER) AS name_len
        FROM nation
    """,
    tags=("source", "sink"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (the second columnar interchange format after
    parquet — same vectorized reader, predicate pushdown, and column
    pruning in Spark). Write nation as ORC, read back, project; the
    oracle reads the parquet original, proving the round trip is
    lossless across formats."""
    prepare(spark)
    sink = _sink_path("nation_orc", sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").orc(sink)
    back = spark.read.orc(sink)
    return back.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.length("n_name").cast("int").alias("name_len"),
    )


@register(
    "scan_jsonl_roundtrip",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM orders
        WHERE o_totalprice > 400000.0
    """,
    tags=("source", "sink"),
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd scan (seed R1: the reference's config
    catalog is schema-on-read JSON). Write a filtered orders slice as
    JSONL, read it back with the writer's explicit schema — never
    inferSchema at scale (a second full pass), and doubles round-trip
    exactly via shortest-representation printing."""
    prepare(spark)
    sink = _sink_path("orders_jsonl", sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    orders.write.mode("overwrite").json(sink)
    back = spark.read.schema(orders.schema).json(sink)
    return back


@register(
    "scan_merge_schema",
    oracle="""
        SELECT n_nationkey,
               n_name,
               CASE WHEN n_nationkey < 13 THEN NULL
                    ELSE CAST(n_regionkey AS BIGINT) END AS n_regionkey,
               CASE WHEN n_nationkey < 13 THEN 'v1' ELSE 'v2' END AS schema_ver
        FROM nation
    """,
    tags=("source", "sink"),
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations in one table
    path — v1 wrote (n_nationkey, n_name, schema_ver), v2 added
    n_regionkey — unified by ``mergeSchema``, with v1 rows NULL in the
    added column. This is how a long-lived 100 TB table absorbs new
    columns with ZERO rewrite: old files stay as-is, the reader merges
    footers. (Spark reads each footer once at planning; production
    keeps this cheap via a metastore schema instead of inference —
    mergeSchema is the migration-window tool, not steady state.)

    Cross-engine note: the added column lands as BIGINT (Spark writes
    the long it inferred), so the oracle CASTs to match. Seed: R17/R20
    (the reference's fixed filename schema can never evolve; a real
    engine's must)."""
    prepare(spark)
    sink = _sink_path("nation_evolving", sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    v1 = nation.filter(F.col("n_nationkey") < 13).select(
        "n_nationkey", "n_name", F.lit("v1").alias("schema_ver")
    )
    v2 = nation.filter(F.col("n_nationkey") >= 13).select(
        "n_nationkey",
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
        F.lit("v2").alias("schema_ver"),
    )
    v1.write.mode("overwrite").parquet(sink)
    v2.write.mode("append").parquet(sink)
    back = spark.read.option("mergeSchema", "true").parquet(sink)
    return back.select("n_nationkey", "n_name", "n_regionkey", "schema_ver")


@register(
    "scan_hash_sample",
    oracle="""
        WITH bucketed AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        )
        SELECT doc_id, lang, bucket
        FROM bucketed
        WHERE bucket < 10
    """,
    tags=("source", "sample"),
)
def scan_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample by key hash — the reproducible way to
    subsample a 100 TB corpus. ``TABLESAMPLE``/``DataFrame.sample`` draw
    from a per-partition RNG: the sample changes with partitioning,
    reruns, and engines, which poisons train/eval splits. Hashing the
    stable key into 100 buckets (md5 → 60-bit int, the engine-portable
    hash shared with dedup_simhash) gives a sample that is (a) identical
    on every engine and every rerun, (b) independent of physical layout,
    (c) cheaply widened (bucket < 20 is a strict superset of < 10 —
    nested splits for scaling-law runs). Pushdown-friendly: the filter
    is a scan-level predicate, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
            " as bigint)"
        )
        % 100
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < 10
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
        WITH years AS (
            SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
                       AS order_year
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND EXTRACT(year FROM o_orderdate) IN (1996, 1999)
        )
        SELECT o.order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_value
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
                   o_totalprice
            FROM orders
        ) o
        JOIN years y ON o.order_year = y.order_year
        GROUP BY o.order_year
    """,
    tags=("source", "join", "pruning"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact table is stored
    partitioned by year; the years to read are only known at RUNTIME
    (they come from a filtered dimension), yet Catalyst still prunes
    the fact SCAN — it plans a DynamicPruningExpression subquery that
    broadcasts the dim's join keys to the fact scan before it starts,
    so unneeded partitions are never opened. scan_partition_pruned
    covers the static case (literal WHERE year=...); this is the join
    -driven case that matters at 100 TB, where the date dimension is
    always joined, never inlined. Verified in the physical plan:
    ``PartitionFilters: [... dynamicpruning#...]`` on the fact scan.
    Seed: R17/R25 (the reference's YYYYMMDD prefixes, driven from a
    catalog instead of a literal)."""
    prepare(spark)
    sink = _sink_path("orders_by_year_dpp", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        F.year("o_orderdate").alias("order_year"), "o_totalprice", "o_orderkey"
    )
    fact.write.mode("overwrite").partitionBy("order_year").parquet(sink)
    fact_back = spark.read.parquet(sink)
    dim = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.year("o_orderdate").isin(1996, 1999)
        )
        .select(F.year("o_orderdate").alias("order_year"))
        .distinct()
    )
    joined = fact_back.join(F.broadcast(dim), "order_year")
    return joined.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


#: malformed CSV lines staged alongside valid rows — exercised by the
#: dead-letter split below (literal also in the oracle)
_CSV_BAD_LINES = [
    "NOT_A_KEY,BROKEN_NATION,xx",
    '7,"unterminated quote,3',
]


@register(
    "scan_csv_corrupt_deadletter",
    oracle="""
        SELECT 'ok' AS status,
               CAST(n_nationkey AS BIGINT) AS record_key,
               n_name AS payload
        FROM nation
        UNION ALL
        SELECT 'dead_letter', NULL, 'NOT_A_KEY,BROKEN_NATION,xx'
        UNION ALL
        SELECT 'dead_letter', NULL, '7,"unterminated quote,3'
    """,
    tags=("source", "quality"),
)
def scan_csv_corrupt_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input dead-lettering at the SCAN (seed R15: the
    reference turns failed fetches into placeholder records rather than
    dying, ``/root/reference/app.py:306-334``; this is the batch-scan
    analog for corrupt text interchange files): parse a CSV under
    PERMISSIVE mode with a corrupt-record column, route clean rows to
    the data channel and malformed lines — verbatim, for replay — to
    the dead-letter channel, in ONE pass. The staged file interleaves
    the nation table with two broken lines (unparseable key; an
    unterminated quote).

    Scale shape: PERMISSIVE parsing is per-row map work inside the
    scan; the status split is a projection, not a second read. At
    100 TB the dead-letter branch writes to its own sink and the job
    never aborts on line 40-billion-and-three."""
    prepare(spark)
    nation = load_table(spark, sf_dir, "nation")
    # fixed sf-keyed stage path (same convention as every other sink
    # here): rewritten per call, never accumulates per-run orphans
    stage_dir = _sink_path("csv_dlq", sf_dir)
    os.makedirs(stage_dir, exist_ok=True)
    stage = os.path.join(stage_dir, "nation_dirty.csv")
    rows = nation.select("n_nationkey", "n_name", "n_regionkey").collect()
    with open(stage, "w") as fh:
        for r in rows:
            fh.write(f"{r.n_nationkey},{r.n_name},{r.n_regionkey}\n")
        for line in _CSV_BAD_LINES:
            fh.write(line + "\n")

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(stage)
        # cache() lifts the Spark restriction on referencing only the
        # corrupt column of a PERMISSIVE scan in a filter
        .cache()
    )
    is_dead = F.col("_corrupt").isNotNull()
    return parsed.select(
        F.when(is_dead, F.lit("dead_letter")).otherwise(F.lit("ok")).alias(
            "status"
        ),
        F.when(~is_dead, F.col("n_nationkey")).alias("record_key"),
        F.when(is_dead, F.col("_corrupt")).otherwise(F.col("n_name")).alias(
            "payload"
        ),
    )


#: compaction target: files pack into bins of ~this many bytes
_COMPACT_TARGET_BYTES = 512 * 1024


@register(
    "plan_compaction_bins",
    oracle=f"""
        WITH files AS (
            SELECT regexp_extract(filename, '[^/]+$') AS file_name,
                   CAST(size AS BIGINT) AS n_bytes
            FROM read_blob('{GOLDEN_SF_DIR}/*.parquet')
        ),
        c AS (
            SELECT file_name, n_bytes,
                   COALESCE(SUM(n_bytes) OVER (
                       ORDER BY file_name
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS prior
            FROM files
        )
        SELECT file_name, n_bytes,
               CAST(FLOOR(prior / {_COMPACT_TARGET_BYTES}.0) AS BIGINT)
                   AS bin_id
        FROM c
    """,
    tags=("plan", "layout", "golden-sf0.01"),
)
def plan_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION plan (OPTIMIZE / bin-packing maintenance):
    assign each data file to a target-size bin by exclusive running
    sum over the deterministic name order — the same streaming
    first-fit approximation as ``pack_token_budget`` (a bin overflows
    by at most one file, no packing search), so the plan is stable
    across reruns. Executing the plan is one
    ``read bin -> coalesce(1) -> rewrite`` per bin; this query emits
    the assignment a maintenance job consumes.

    Scale shape: the file listing is metadata (|files| rows, never
    data bytes on the Spark side — binaryFile lists path+length
    without reading content because only those columns are selected);
    one window over the listing. At 100 TB with millions of files the
    window keys on (table, partition) so no single sort serializes.
    Seed: R17's date-partitioned layout accumulating one file per
    fetch (``/root/reference/app.py:449-463``) — exactly the
    small-file problem compaction exists to fix."""
    prepare(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
        )
    )
    from pyspark.sql import Window as W

    w = W.orderBy("file_name").rowsBetween(W.unboundedPreceding, -1)
    prior = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    return files.select(
        "file_name",
        "n_bytes",
        F.floor(prior / float(_COMPACT_TARGET_BYTES)).cast("long").alias("bin_id"),
    )


@register(
    "scan_rowgroup_stats",
    oracle=f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
               CAST(row_group_id AS BIGINT) AS row_group,
               CAST(num_values AS BIGINT) AS n_rows,
               CAST(stats_min_value AS BIGINT) AS min_orderkey,
               CAST(stats_max_value AS BIGINT) AS max_orderkey
        FROM parquet_metadata('{GOLDEN_SF_DIR}/orders.parquet')
        WHERE path_in_schema = 'o_orderkey'
    """,
    tags=("source", "layout", "golden-sf0.01"),
)
def scan_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expose the parquet ROW-GROUP statistics that scan pruning
    consults (min/max per column per row group) as a queryable table —
    the introspection behind every data-skipping decision this engine
    makes (``analytics_forecast_revenue``'s date skipping,
    ``layout_zorder_scan``'s tile ranges). Footers are read
    DISTRIBUTED: the file list fans out over ``mapInPandas`` and each
    task reads only its files' metadata (KBs) with pyarrow — at 100 TB
    with millions of files this is the scalable stats collector; the
    bytes of the data pages are never touched. Cross-engine check:
    DuckDB's ``parquet_metadata()`` must report the identical footers.
    ``scan_rowgroup_pruned`` closes the loop: the same stats DRIVE a
    file-pruned range scan over a multi-file table.
    """
    import os as _os

    prepare(spark)
    paths = [
        _os.path.join(sf_dir, "orders.parquet")
    ]  # single-file fixture; a table directory would glob here
    return read_footer_stats(spark, paths, "o_orderkey").select(
        "file_name",
        "row_group",
        "n_rows",
        F.col("min_val").alias("min_orderkey"),
        F.col("max_val").alias("max_orderkey"),
    )


def read_footer_stats(
    spark: SparkSession, paths: list[str], column: str
) -> DataFrame:
    """Distributed parquet-footer stats collector: fan the file list
    out over ``mapInPandas`` (each task reads only its files' footer
    KBs with pyarrow) and return one row per (file, row group) with
    the integer ``column``'s min/max/num_values. Row groups written
    without statistics yield NULL min/max (consumers must treat them
    conservatively — an unknown range can match anything). The data
    pages are never read — at 100 TB with millions of files this is
    manifest-building, not a scan. Shared by ``scan_rowgroup_stats``
    (introspection) and ``rowgroup_pruned_scan`` (the data-skipping
    decision itself)."""
    import os as _os

    import pandas as _pd

    if not paths:
        raise ValueError("read_footer_stats: empty path list")
    # pandas input -> one Arrow batch; the tuple-list form pickles
    # through a Python-RDD pipeline (~5 s of overhead per call)
    files = spark.createDataFrame(
        _pd.DataFrame({"path": sorted(paths)}), "path string"
    ).repartition(min(len(paths), 32))
    out_schema = (
        "path string, file_name string, row_group long, n_rows long,"
        " min_val long, max_val long"
    )

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                col_idx = names.index(column)
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(col_idx)
                    st = col.statistics
                    has = st is not None and st.has_min_max
                    rows.append(
                        (
                            p,
                            _os.path.basename(p),
                            rg,
                            col.num_values,
                            int(st.min) if has else None,
                            int(st.max) if has else None,
                        )
                    )
            if rows:
                yield _pd.DataFrame(
                    rows,
                    columns=[
                        "path",
                        "file_name",
                        "row_group",
                        "n_rows",
                        "min_val",
                        "max_val",
                    ],
                ).astype({"min_val": "Int64", "max_val": "Int64"})

    return files.mapInPandas(read_footers, out_schema)


def rangekey_write(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Land the orders table as a MULTI-FILE parquet directory with
    narrow per-file o_orderkey ranges: ``repartitionByRange`` gives
    each task a contiguous key segment, so every file's footer min/max
    covers ~1/16 of the key space — the layout that makes footer-stats
    pruning effective. This is the 1-D sibling of ``zorder_write``
    (operators/window_ops.py); the reference's date-prefix layout
    (``/root/reference/app.py:449-463``) is the same idea with the
    calendar as the range key."""
    load_table(spark, sf_dir, "orders").repartitionByRange(
        16, "o_orderkey"
    ).write.mode("overwrite").parquet(path)


def rowgroup_pruned_scan(
    spark: SparkSession, path: str, lo: int, hi: int
) -> DataFrame:
    """Answer a key-range query by reading ONLY the files whose footer
    min/max overlaps [lo, hi]: collect the per-file stats (|files| rows
    of metadata), build the matching file list, and scan just those
    paths with the residual predicate pushed down — Spark's parquet
    reader then prunes row groups WITHIN each matching file from the
    same footer stats. Unmatched files are never opened. This is the
    DIRECT form, kept as the equality baseline; the production form is
    the persisted manifest path (``write_stats_manifest`` /
    ``manifest_pruned_scan`` — r8), where pruning is an agg+filter on
    the stored stats table and only MATCHING paths reach the driver."""
    import glob as _glob

    all_files = _glob.glob(os.path.join(path, "*.parquet"))
    if not all_files:
        raise ValueError(f"rowgroup_pruned_scan: no parquet files under {path}")
    per_file = (
        read_footer_stats(spark, all_files, "o_orderkey")
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            # row groups lacking stats make the file's range unknowable
            F.sum(F.when(F.col("min_val").isNull(), 1).otherwise(0)).alias(
                "n_statless"
            ),
        )
    )
    # conservative inclusion: a file with ANY stats-less row group might
    # hold matching rows its known min/max doesn't cover — read it
    matching = [
        r.path
        for r in per_file.filter(
            (F.col("n_statless") > 0)
            | ((F.col("fmax") >= lo) & (F.col("fmin") <= hi))
        ).collect()
    ]
    if not matching:
        return spark.read.parquet(*all_files).filter(F.lit(False))
    return spark.read.parquet(*matching).filter(
        F.col("o_orderkey").between(lo, hi)
    )


#: the demo range: ~5 of the 16 range-partitioned files at any SF
_RG_PRUNE_RANGE = (1000, 5000)


@register(
    "scan_rowgroup_pruned",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]} AND {_RG_PRUNE_RANGE[1]}
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_rowgroup_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end footer-stats data skipping: write orders as a
    range-clustered multi-file table (``rangekey_write``), collect
    per-file min/max DISTRIBUTED from the parquet footers
    (``read_footer_stats``), then answer a key-range aggregate reading
    only the overlapping files (``rowgroup_pruned_scan``) — the
    introspection of ``scan_rowgroup_stats`` turned into the pruned
    scan it exists for. The oracle recomputes the same range from the
    raw table, so the driver hash-checks that skipping loses no rows;
    the file-count drop itself is pinned on executed-scan metrics in
    tests/test_catalog_scale.py. Seed: the reference's date-prefixed
    object layout (``/root/reference/app.py:449-463``) — list-prune by
    key prefix — generalized to footer-stats pruning on any column."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "rangekey")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(path):
        rangekey_write(spark, sf_dir, path)
        return (
            rowgroup_pruned_scan(spark, path, lo, hi)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


# --------------------------------------------------------------------------
# Persisted footer-stats MANIFEST (r8): the production form of
# ``rowgroup_pruned_scan``'s docstring — stats live in a parquet table
# next to the data (like Iceberg/Delta manifests), pruning is an
# agg+filter on that table, and only the MATCHING path list ever
# reaches the driver.
# --------------------------------------------------------------------------

#: leaf columns the demo manifests carry stats for
_MANIFEST_COLS = ("o_orderkey", "o_custkey")


def read_footer_stats_multi(
    spark: SparkSession, paths: list[str], columns: tuple[str, ...]
) -> DataFrame:
    """Multi-column footer-stats collector: ONE pyarrow footer read per
    file yields min/max/num_values for EVERY requested leaf column —
    the same metadata object carries them all, so a manifest over N
    predicate columns costs exactly the same footer I/O as one column
    (the r7 ``read_footer_stats`` re-listed per column). Output is the
    manifest's physical schema, keyed (path, row_group, column_name);
    min/max are stored as double (exact for integers below 2^53 —
    every fixture and TPC-H key range — and natively right for float
    measure columns). Stats-less row groups yield NULL min/max and
    must be treated conservatively by consumers."""
    import os as _os

    import pandas as _pd

    if not paths:
        raise ValueError("read_footer_stats_multi: empty path list")
    if not columns:
        raise ValueError("read_footer_stats_multi: no columns requested")
    cols = tuple(columns)
    # pandas input -> one Arrow batch (see read_footer_stats)
    files = spark.createDataFrame(
        _pd.DataFrame({"path": sorted(paths)}), "path string"
    ).repartition(min(len(paths), 32))
    out_schema = (
        "path string, file_name string, row_group long, column_name string,"
        " n_rows long, min_val double, max_val double"
    )

    def read_footers(batches):
        import pyarrow.parquet as pq

        def _num(v):
            # non-numeric stats (string/binary columns) become NULL —
            # consumers already treat NULL min/max conservatively, and
            # row-count users (bloom sizing) only need n_rows
            try:
                return float(v)
            except (TypeError, ValueError):
                return None

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                idx = {c: names.index(c) for c in cols}
                for rg in range(md.num_row_groups):
                    for c in cols:
                        col = md.row_group(rg).column(idx[c])
                        st = col.statistics
                        has = st is not None and st.has_min_max
                        rows.append(
                            (
                                p,
                                _os.path.basename(p),
                                rg,
                                c,
                                col.num_values,
                                _num(st.min) if has else None,
                                _num(st.max) if has else None,
                            )
                        )
            if rows:
                yield _pd.DataFrame(
                    rows,
                    columns=[
                        "path",
                        "file_name",
                        "row_group",
                        "column_name",
                        "n_rows",
                        "min_val",
                        "max_val",
                    ],
                )

    return files.mapInPandas(read_footers, out_schema)


def _partition_values_col(partition_by: tuple[str, ...]) -> F.Column:
    """The manifest's ``partition_values`` map for a stats row: each
    requested partition column's value parsed from the row's Hive-style
    path segment (``lang=en/``) — the reference's ``YYYYMMDD/`` prefix
    layout (``/root/reference/app.py:449-456``) generalized to named
    key=value dirs. Entries exist ONLY where the segment is present, so
    a file not laid out by a requested column carries no entry and every
    partition filter treats it conservatively (scanned, never silently
    dropped). NULL map when the table is unpartitioned.

    Spark percent-escapes reserved characters ('%', '=', ':', ...) in
    Hive partition dir names, so the captured segment is DECODED before
    it is stored — a partition filter compares LOGICAL values, and
    ``{'col': 'a=b'}`` must match the on-disk ``col=a%3Db`` segment.
    Decode mirrors ``_decode_input_file`` ('+' pre-escaped so
    ``url_decode`` never turns it into a space); a segment that is not
    valid percent-encoding (hand-made dir with a bare '%') falls back
    to its raw form instead of failing the scan. The column name is
    regex-escaped so a name containing metacharacters cannot corrupt
    the pattern."""
    import re as _re

    if not partition_by:
        return F.lit(None).cast("map<string,string>")
    pairs = []
    for pcol in partition_by:
        seg = F.regexp_extract(
            F.col("path"), f"(?:^|/){_re.escape(pcol)}=([^/]+)/", 1
        )
        decoded = F.coalesce(
            F.try_url_decode(F.regexp_replace(seg, r"\+", "%2B")), seg
        )
        pairs.append(F.lit(pcol))
        pairs.append(decoded)
    return F.map_filter(F.create_map(*pairs), lambda _k, v: v != "")


def write_stats_manifest(
    spark: SparkSession,
    paths: list[str],
    manifest_dir: str,
    columns: tuple[str, ...] = _MANIFEST_COLS,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Materialize the footer-stats manifest as a parquet TABLE beside
    the data — the artifact a table format keeps so planning never
    re-lists or re-opens data-file footers. Built distributed
    (``read_footer_stats_multi``); |manifest| = |files| × row groups ×
    columns rows of fixed-width metadata, ~KBs per thousand files. The
    write inherits the footer-read fan-out, capped at 32 tasks, so a
    build adds at most 32 manifest files regardless of table size
    (a trailing ``coalesce(1)`` would serialize the footer read into
    one task — measured 7× slower — for a single-file nicety
    ``catalog.compact_parquet_dir`` can restore offline if thousands
    of appends ever accumulate). Every row carries ``snapshot_id`` = 0;
    appends stamp successive ids, giving the manifest a version axis
    (``manifest_pruned_scan(as_of=...)`` time-travels on it).
    ``partition_by`` records Hive-style partition values per row (see
    ``_partition_values_col``) for combined partition+stats pruning."""
    read_footer_stats_multi(spark, paths, columns).withColumn(
        "snapshot_id", F.lit(0).cast("int")
    ).withColumn("op", F.lit("add")).withColumn(
        "partition_values", _partition_values_col(partition_by)
    ).write.mode("overwrite").parquet(manifest_dir)


def append_stats_manifest(
    spark: SparkSession,
    new_paths: list[str],
    manifest_dir: str,
    columns: tuple[str, ...] = _MANIFEST_COLS,
    snapshot_id: int | None = None,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Incremental manifest maintenance: when new data files land
    (ingest batch, compaction output), footer-read ONLY them and append
    their stats rows — cost is new-batch-sized, mirroring
    ``llm/ivf.py: append_to_index`` / ``llm/dedup.py:
    promote_to_corpus``. Appended == rebuilt is pytest-pinned in
    tests/test_catalog_scale.py. Each append is stamped with the next
    ``snapshot_id`` — CAS-RESERVED via ``_claimed_next_snapshot``
    unless the caller passes one, so concurrent writers can never
    stamp the same id — and the manifest keeps its whole version
    history — an as-of read (``manifest_pruned_scan(as_of=N)``) sees
    exactly the files visible at snapshot N, the table-format
    time-travel contract. Returns the id written."""
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, manifest_dir)
    verify_claim(manifest_dir, int(snapshot_id))
    _stats_add_rows(
        spark, new_paths, columns, int(snapshot_id), partition_by
    ).write.mode("append").parquet(manifest_dir)
    return int(snapshot_id)


def _stats_add_rows(
    spark: SparkSession,
    new_paths: list[str],
    columns: tuple[str, ...],
    snapshot_id: int,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """The 'add' stats rows for new data files as an UNCOMMITTED frame —
    compound verbs (merge, compaction) union these with their tombstones
    and commit everything in ONE append, so a concurrent re-planner can
    never observe adds without the matching removes (half a commit)."""
    return (
        read_footer_stats_multi(spark, new_paths, columns)
        .withColumn("snapshot_id", F.lit(int(snapshot_id)).cast("int"))
        .withColumn("op", F.lit("add"))
        .withColumn("partition_values", _partition_values_col(partition_by))
    )


def commit_manifest_rows(
    spark: SparkSession, manifest_dir: str, frames: list[DataFrame]
) -> None:
    """Commit several metadata row groups (adds + tombstones + markers)
    as ONE Spark write job — the atomicity half of the optimistic-
    concurrency contract. Two separate appends leave a window where a
    concurrent ``merge_with_conflict_retry`` loser re-plans against the
    adds WITHOUT the removes (or vice versa), double-counting the
    rewritten rows and baking the duplication into its own rewrite;
    one job commits all files in a single FileOutputCommitter commit.
    Frames are aligned by name (missing columns NULL-filled) and cast
    to the target manifest's schema so the append never forks it."""
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf, allowMissingColumns=True)
    out.write.mode("append").parquet(manifest_dir)


_MANIFEST_SCHEMA = (
    "path string, file_name string, row_group long, column_name string,"
    " n_rows long, min_val double, max_val double, snapshot_id int,"
    " op string, partition_values map<string,string>"
)


def _next_snapshot(spark: SparkSession, manifest_dir: str) -> int:
    """Next snapshot id: one KB-scale max() over the stats table (0 if
    the manifest does not exist yet)."""
    try:
        cur = (
            spark.read.parquet(manifest_dir)
            .agg(F.max("snapshot_id"))
            .collect()[0][0]
        )
        return (cur if cur is not None else -1) + 1
    except Exception:
        return 0


class ConcurrentCommitError(RuntimeError):
    """Another writer committed at the snapshot this writer planned
    against — Delta's ConcurrentModificationException: the loser must
    RE-VALIDATE its plan against the new table state and retry, never
    blind-append (its candidacy/rewrite set may be stale)."""


def claim_commit(
    spark: SparkSession,
    manifest_dir: str,
    parent: int,
    stale_after: float = 300.0,
) -> int:
    """Optimistic-concurrency COMPARE-AND-SWAP on the snapshot axis:
    atomically claim snapshot ``parent + 1`` by creating the commit
    token directory ``<manifest>/_commits/<id>`` — POSIX ``mkdir`` is
    atomic, exactly the primitive Delta's log store builds on (create
    ``N.json`` if absent; an object-store deployment swaps in a
    conditional PUT). Two writers that both planned against ``parent``
    race for one token: the winner returns the claimed id and commits;
    the loser gets :class:`ConcurrentCommitError` and must re-read the
    table, re-validate candidacy, and claim the NEXT id. The leading
    underscore keeps the token tree invisible to Spark's parquet
    listing of the manifest itself.

    Each claim writes an ``owner`` file (a fresh uuid) inside its token
    dir. A stale takeover (token older than ``stale_after`` with no
    committed rows) renames the token ASIDE atomically — only one
    takeover-er can win the rename — and claims fresh, so the original
    claimant's ownership is revoked rather than silently shared: if
    that claimant was merely SLOW (a >5-min compaction, not a crash),
    its commit-time :func:`verify_claim` check fails loudly instead of
    interleaving two writers' rows under one snapshot id."""
    import time as _time
    import uuid as _uuid

    token_root = os.path.join(manifest_dir, "_commits")
    os.makedirs(token_root, exist_ok=True)
    snap = int(parent) + 1
    token = os.path.join(token_root, str(snap))
    # an id at or below the committed tip is NEVER claimable, token or
    # no token (tokens don't survive expire's manifest swap; without
    # this check a stale writer could stamp new rows onto an id that
    # already has committed history)
    if snap <= _next_snapshot(spark, manifest_dir) - 1:
        raise ConcurrentCommitError(
            f"snapshot {snap} at {manifest_dir} was committed by a "
            "concurrent writer — re-validate against the current table "
            "state and retry"
        )
    owner = _uuid.uuid4().hex
    for attempt in (0, 1):
        try:
            os.mkdir(token)
        except FileExistsError:
            committed_max = _next_snapshot(spark, manifest_dir) - 1
            if snap <= committed_max:
                raise ConcurrentCommitError(
                    f"snapshot {snap} at {manifest_dir} was committed by "
                    "a concurrent writer — re-validate against the "
                    "current table state and retry"
                ) from None
            # claimed but not (yet) committed: in-flight, or abandoned
            # by a crashed claimant. A token older than stale_after with
            # no committed rows is taken over — the lease-timeout
            # recovery object-store log stores use; a young token means
            # a live writer: fail loudly, the caller backs off and
            # retries. Takeover renames the token aside (atomic: one
            # winner) instead of rmdir'ing it, revoking the old owner
            # file with it.
            try:
                age = _time.time() - os.stat(token).st_mtime
            except FileNotFoundError:
                continue  # winner vanished between mkdir and stat: retry
            if attempt == 0 and age > float(stale_after):
                try:
                    os.rename(token, f"{token}.stale-{owner}")
                except OSError:
                    pass  # another takeover-er won the rename: retry
                continue
            raise ConcurrentCommitError(
                f"snapshot {snap} at {manifest_dir} is claimed by an "
                f"in-flight commit (token age {age:.1f}s) — back off and "
                "retry; if the claimant crashed, the token becomes "
                f"stale after {stale_after}s and is taken over"
            ) from None
        with open(os.path.join(token, "owner"), "w") as fh:
            fh.write(owner)
        _CLAIM_OWNERS[(os.path.abspath(manifest_dir), snap)] = owner
        return snap
    raise ConcurrentCommitError(  # pragma: no cover - loop always exits
        f"could not claim snapshot {snap} at {manifest_dir}"
    )


#: this process's live claims: (abs manifest dir, snapshot id) -> owner
#: uuid written into the token dir. verify_claim compares the on-disk
#: owner file against this registry at commit time.
_CLAIM_OWNERS: dict[tuple[str, int], str] = {}


def verify_claim(manifest_dir: str, snapshot_id: int) -> None:
    """Re-validate token ownership IMMEDIATELY before committing rows at
    ``snapshot_id`` — the commit-time half of the lease protocol. A slow
    writer whose token was taken over (``claim_commit`` stale recovery)
    finds someone else's uuid — or no token — where its own used to be,
    and must raise rather than commit: without this check two writers'
    rows silently interleave under one snapshot id. A snapshot this
    process never claimed (explicit ``snapshot_id=`` passthrough from a
    caller that claimed in another process, or pre-claim-era tests
    stamping id 0 fixtures) is not re-validated — the registry only
    knows this process's leases."""
    ours = _CLAIM_OWNERS.get((os.path.abspath(manifest_dir), int(snapshot_id)))
    if ours is None:
        return
    owner_file = os.path.join(
        manifest_dir, "_commits", str(int(snapshot_id)), "owner"
    )
    try:
        with open(owner_file) as fh:
            on_disk = fh.read().strip()
    except OSError:
        on_disk = None
    if on_disk != ours:
        raise ConcurrentCommitError(
            f"snapshot {snapshot_id} at {manifest_dir}: this writer's "
            "claim was revoked (token taken over as stale while the "
            "commit was in flight) — re-validate against the current "
            "table state and retry with a fresh claim"
        )


def _claimed_next_snapshot(spark: SparkSession, manifest_dir: str) -> int:
    """Allocate AND reserve the next snapshot id: every committing verb
    routes through this instead of a bare max()+1, so two writers can
    never stamp rows with the SAME id — the id-collision half of the
    optimistic-concurrency contract (the other half, re-planning after
    a lost race, is the caller's job: plain verbs fail loudly with
    ConcurrentCommitError; ``merge_with_conflict_retry`` re-plans)."""
    parent = _next_snapshot(spark, manifest_dir) - 1
    return claim_commit(spark, manifest_dir, parent)


def merge_with_conflict_retry(
    spark: SparkSession,
    manifest_dir: str,
    delta: DataFrame,
    key: str,
    cols: list[str],
    insert_files: int = 1,
    max_retries: int = 3,
) -> tuple[int, int, int, int]:
    """MERGE under optimistic concurrency: plan against the current
    snapshot, CAS-claim the next id (:func:`claim_commit`), and commit;
    on a lost race, RE-PLAN from scratch — candidacy, the rewrite set,
    and matched-vs-insert classification are all recomputed against the
    winner's committed state, so the outcome is the SERIAL order of the
    commits (what Delta calls write serializability), never a lost
    update. Bounded retries: livelock under pathological contention
    fails loudly rather than spinning. Returns
    (snapshot_id, n_intersecting, n_rewritten, n_retries)."""
    for attempt in range(int(max_retries) + 1):
        parent = _next_snapshot(spark, manifest_dir) - 1
        try:
            snap = claim_commit(spark, manifest_dir, parent)
        except ConcurrentCommitError:
            if attempt == max_retries:
                raise
            import time as _time

            # back off before re-planning: a lost race against a LIVE
            # writer needs its rows to land before the re-plan can see
            # them; spinning would exhaust retries in microseconds
            _time.sleep(min(0.05 * (2 ** attempt), 1.0))
            continue  # table advanced: loop re-reads and re-plans
        s, n_int, n_rw = merge_through_manifest(
            spark,
            manifest_dir,
            delta,
            key,
            cols,
            insert_files=insert_files,
            snapshot_id=snap,
        )
        return s, n_int, n_rw, attempt
    raise ConcurrentCommitError(  # pragma: no cover - loop always returns
        f"merge at {manifest_dir} lost {max_retries + 1} commit races"
    )


def evolve_schema_add(
    spark: SparkSession, manifest_dir: str, column: str, sql_type: str
) -> int:
    """ADD COLUMN as a METADATA commit — Iceberg/Delta schema evolution
    through the snapshot axis: one 'schema_add' manifest row declares
    the column (name + SQL type, the type riding in the generic
    ``partition_values`` string map), no data file is touched.
    Pre-commit files are NULL-backfilled at scan time
    (:func:`read_evolved` — the ``scan_merge_schema`` semantics, but
    COMMITTED: an as-of read below this snapshot sees the old schema,
    at/above sees the new, exactly like any other table mutation).
    Returns the snapshot id written."""
    man = spark.read.parquet(manifest_dir)
    declared = (
        man.filter(
            (F.col("op") == "schema_add") & (F.col("column_name") == column)
        ).limit(1).count()
        > 0
    )
    if declared:
        raise ValueError(
            f"column {column!r} is already declared at {manifest_dir}"
        )
    snap = _claimed_next_snapshot(spark, manifest_dir)
    schema = man.schema
    fixed = {
        "path": "",
        "file_name": "",
        "column_name": column,
        "snapshot_id": int(snap),
        "op": "schema_add",
        "partition_values": {"type": str(sql_type)},
    }
    row = tuple(fixed.get(f.name) for f in schema)
    spark.createDataFrame([row], schema).write.mode("append").parquet(
        manifest_dir
    )
    return snap


def read_evolved(
    spark: SparkSession,
    manifest_dir: str,
    key: str,
    as_of: int | None = None,
) -> DataFrame:
    """Full scan under the EVOLVED schema visible at ``as_of``: the
    physical read unions mixed file schemas (``mergeSchema`` — files
    landed after an ADD COLUMN carry it, earlier files don't), then
    every declared-but-physically-absent column is NULL-backfilled with
    its committed type. An as-of below the ADD COLUMN commit sees
    neither the declaration nor any post-commit file, so the OLD schema
    emerges exactly — schema history is as time-travelable as data
    history. Metadata-only cost on top of the pruned scan."""
    man = spark.read.parquet(manifest_dir)
    if as_of is not None:
        man = man.filter(F.col("snapshot_id") <= as_of)
    adds = (
        man.filter(F.col("op") == "schema_add")
        .select(
            "column_name",
            F.col("partition_values").getItem("type").alias("sql_type"),
        )
        .collect()
    )
    df = manifest_pruned_scan(
        spark,
        manifest_dir,
        key,
        float("-inf"),
        float("inf"),
        as_of=as_of,
        merge_schema=True,
    )
    for r in adds:
        if r.column_name not in df.columns:
            df = df.withColumn(
                r.column_name, F.lit(None).cast(r.sql_type or "string")
            )
    return df


@register(
    "plan_schema_evolve",
    oracle="""
        WITH evolved AS (
            SELECT doc_id, lang, n_chars, CAST(NULL AS DOUBLE) AS quality
            FROM documents
            UNION ALL
            SELECT doc_id, lang, n_chars, n_chars / 1000.0 AS quality
            FROM documents WHERE doc_id % 7 = 0
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(quality) AS BIGINT) AS n_with_quality,
               CAST(SUM(CAST(ROUND(quality * 1000) AS BIGINT)) AS BIGINT)
                   AS quality_milli,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM evolved
        GROUP BY lang
    """,
    tags=("plan", "layout", "schema"),
)
def plan_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION through the manifest end to end: documents land
    governed WITHOUT a quality column, ADD COLUMN quality DOUBLE commits
    as pure metadata (snapshot k), then a post-commit batch lands
    CARRYING the column. The current evolved read must union both
    physical shapes — pre-commit rows NULL-backfilled, post-commit rows
    with their written values — and the oracle recomputes exactly that
    union from the raw table, so the driver hash pins the backfill
    semantics (COUNT(quality) counts only post-commit rows; the
    cents-style integer sum pins the values). Reads pinned below k see
    the OLD schema — asserted in tests/test_catalog_scale.py. Seed: the
    reference re-parses filename fields as its schema
    (``/root/reference/app.py:449-463``); a governed table declares
    schema changes as commits instead."""
    import glob as _glob
    import shutil as _shutil

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "schema_evolve_data")
    mpath = scratch_path(spark, sf_dir, "schema_evolve_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.repartition(4, "doc_id").write.mode("overwrite").parquet(
            data_dir
        )
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("doc_id",))
        evolve_schema_add(spark, mpath, "quality", "double")
        late = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "quality", F.col("n_chars") / F.lit(1000.0)
        )
        stage = os.path.join(data_dir, ".late_stage")
        late.coalesce(1).write.mode("overwrite").parquet(stage)
        part = sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))[0]
        late_path = os.path.join(data_dir, "evolved-late-00000.parquet")
        _shutil.move(part, late_path)
        _shutil.rmtree(stage, ignore_errors=True)
        append_stats_manifest(spark, [late_path], mpath, ("doc_id",))
        return (
            read_evolved(spark, mpath, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count("quality").alias("n_with_quality"),
                F.sum(F.round(F.col("quality") * 1000, 0).cast("long"))
                .cast("long")
                .alias("quality_milli"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def remove_from_manifest(
    spark: SparkSession,
    manifest_dir: str,
    paths: list[str],
    snapshot_id: int | None = None,
) -> int:
    """Append REMOVE tombstones for data files the table no longer
    contains (compaction inputs, retention deletes): one metadata row
    per path, stamped with the next snapshot id. From that snapshot on
    the paths are invisible to ``manifest_pruned_scan`` and count as
    reclaimable for ``vacuum_orphans_report``; as-of reads BELOW the
    tombstone snapshot still see them — history is never rewritten,
    which is what makes pinned training runs reproducible across later
    maintenance. (Re-adding a previously removed path is not supported;
    compaction always writes fresh file names, so the case cannot
    arise from this engine's own maintenance.)

    The tombstone row is SHAPED BY THE TARGET MANIFEST'S OWN SCHEMA —
    path/file_name/snapshot_id/op filled, every other field NULL — so
    the same delete works against the stats manifest AND the bloom
    manifest (whose rows carry m_bits/bloom instead of min/max stats)
    without the appended file forking the directory's schema. On stats
    manifests the otherwise-unused min_val/max_val slots carry the
    TOMBSTONE WALL-CLOCK (epoch seconds) — the retention axis Delta
    keeps in its log timestamps: ``vacuum_orphans`` measures the
    retention window from when the file became unreferenced, not from
    when it was created."""
    if not paths:
        raise ValueError("remove_from_manifest: empty path list")
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, manifest_dir)
    verify_claim(manifest_dir, int(snapshot_id))
    _tombstone_rows(spark, manifest_dir, paths, int(snapshot_id)).write.mode(
        "append"
    ).parquet(manifest_dir)
    return int(snapshot_id)


def _tombstone_rows(
    spark: SparkSession,
    manifest_dir: str,
    paths: list[str],
    snapshot_id: int,
) -> DataFrame:
    """REMOVE tombstone rows (see :func:`remove_from_manifest`) as an
    UNCOMMITTED frame, for single-append compound commits."""
    import os as _os
    import time as _time

    schema = spark.read.parquet(manifest_dir).schema
    now = float(_time.time())
    has_stats_slots = {"min_val", "max_val"} <= {f.name for f in schema}
    fixed = {
        "path": lambda p: p,
        "file_name": lambda p: _os.path.basename(p),
        "column_name": lambda p: "__remove__",
        "snapshot_id": lambda p: int(snapshot_id),
        "op": lambda p: "remove",
    }
    if has_stats_slots:
        fixed["min_val"] = lambda p: now
        fixed["max_val"] = lambda p: now
    rows = [
        tuple(
            fixed[f.name](p) if f.name in fixed else None for f in schema
        )
        for p in sorted(paths)
    ]
    return spark.createDataFrame(rows, schema)


def _visible_stats(manifest: DataFrame, as_of: int | None) -> DataFrame:
    """The stats rows of files VISIBLE at ``as_of`` (latest snapshot if
    None): 'add' rows whose path has no 'remove' tombstone at or below
    the pin. Both sides are metadata-scale; the anti-join's removed set
    is |tombstones| rows."""
    if as_of is not None:
        manifest = manifest.filter(F.col("snapshot_id") <= as_of)
    removed = (
        manifest.filter(F.col("op") == "remove").select("path").distinct()
    )
    return manifest.filter(F.col("op") == "add").join(
        removed, "path", "left_anti"
    )


def manifest_row_count(
    spark: SparkSession, manifest_dir: str, as_of: int | None = None
) -> int:
    """The governed table's visible row count answered ENTIRELY from
    the stats manifest — zero data pages: each (path, row_group)'s
    ``n_rows`` (repeated across its per-column stats rows, so reduced
    with max) summed over the files visible at ``as_of``. This is the
    metadata feed for the distributed global-order primitives'
    partition sizing (``operators/window_ops._auto_partitions``):
    a ranked/NTILE'd governed scan sizes its range exchange without a
    second pass over the fact table. Seed: the reference treats its
    paginated listing as the statistic itself
    (``/root/reference/upload_to_rfs.py:16-35``); the manifest keeps
    the same answer one metadata agg away."""
    visible = _visible_stats(spark.read.parquet(manifest_dir), as_of)
    n = (
        visible.groupBy("path", "row_group")
        .agg(F.max("n_rows").alias("n"))
        .agg(F.sum("n").alias("total"))
        .collect()[0]
        .total
    )
    return int(n) if n is not None else 0


def manifest_pruned_scan(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    lo: float,
    hi: float,
    as_of: int | None = None,
    partition_filter: dict[str, str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Answer a key-range query through the PERSISTED manifest: an
    agg+filter over the stats table computes which files can overlap
    [lo, hi], only that MATCHING path list is collected (never the
    full |files| frame — the r7 driver-side step this replaces), and
    the scan opens just those paths with the residual predicate pushed
    down so Spark's reader prunes row groups within them from the same
    footer stats. Files with any stats-less row group for ``column``
    are included conservatively. The manifest is the catalog: files
    absent from it are invisible, exactly like a table-format snapshot
    — and ``as_of=N`` TIME-TRAVELS the catalog, restricting visibility
    to files whose stats landed at snapshot ≤ N (a metadata filter;
    the late files' data pages are simply never listed). An as-of
    below an ``expire_manifest_history`` floor RAISES — expired
    history must fail loudly, never reconstruct partially.

    ``partition_filter`` ({col: value}) COMBINES partition pruning with
    stats pruning in the same metadata pass — a file survives only if
    every requested partition value matches its recorded
    ``partition_values`` entry AND its key stats overlap [lo, hi].
    Files with no recorded entry for a filtered column are kept
    conservatively (scanned, never silently dropped), so the filter is
    always sound over mixed/legacy manifests."""
    raw = spark.read.parquet(manifest_dir)
    if as_of is not None:
        floor = _history_floor(raw)
        if floor is not None and as_of < floor:
            raise ValueError(
                f"as_of={as_of} is below the expire floor {floor} — "
                f"history at {manifest_dir} was expired; pinned reads "
                "below the floor cannot be reconstructed"
            )
    manifest = _visible_stats(raw, as_of)
    if partition_filter:
        if "partition_values" not in manifest.columns:
            raise ValueError(
                f"manifest at {manifest_dir} records no partition values "
                "— rebuild it with write_stats_manifest(partition_by=...)"
            )
        for k, v in partition_filter.items():
            entry = F.col("partition_values").getItem(k)
            manifest = manifest.filter(entry.isNull() | (entry == str(v)))
    per_file = (
        manifest.filter(F.col("column_name") == column)
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            F.sum(
                F.when(F.col("min_val").isNull(), 1).otherwise(0)
            ).alias("n_statless"),
        )
    )
    matching = [
        r.path
        for r in per_file.filter(
            (F.col("n_statless") > 0)
            | ((F.col("fmax") >= lo) & (F.col("fmin") <= hi))
        )
        .select("path")
        .collect()
    ]
    if not matching:
        # preserve the data schema on an empty result: open one manifest
        # file lazily (schema-only footer read, no data pages)
        any_path = manifest.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty stats manifest at {manifest_dir}")
        return spark.read.parquet(any_path[0].path).filter(F.lit(False))
    reader = spark.read
    if merge_schema:
        # post-evolution tables mix physical schemas (pre-ADD files
        # lack the new column); union them instead of sampling one
        # file's footer for the schema
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*matching).filter(F.col(column).between(lo, hi))


@register(
    "scan_manifest_stats",
    oracle=f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
               CAST(row_group_id AS BIGINT) AS row_group,
               path_in_schema AS column_name,
               CAST(num_values AS BIGINT) AS n_rows,
               CAST(stats_min_value AS DOUBLE) AS min_val,
               CAST(stats_max_value AS DOUBLE) AS max_val
        FROM parquet_metadata('{GOLDEN_SF_DIR}/orders.parquet')
        WHERE path_in_schema IN ('o_orderkey', 'o_custkey')
    """,
    tags=("source", "layout", "golden-sf0.01"),
)
def scan_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted stats manifest as a queryable table, keyed
    (file, row_group, column): build it for the orders file over BOTH
    demo predicate columns in one footer pass
    (``write_stats_manifest``), read it back from disk, and expose the
    stats rows. Cross-engine check: DuckDB's ``parquet_metadata()``
    must report identical footers for both columns — extending
    ``scan_rowgroup_stats``'s single-column check to the multi-column
    manifest shape a 100 TB table needs (prune on ANY predicate column
    without re-reading footers). Seed: the reference's date-prefix
    layout (``/root/reference/app.py:449-463``) whose listing IS its
    (implicit, single-column) manifest."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    mpath = scratch_path(spark, sf_dir, "stats_manifest_intro")
    with scratch_cleanup(mpath):
        write_stats_manifest(
            spark, [os.path.join(sf_dir, "orders.parquet")], mpath
        )
        return (
            spark.read.parquet(mpath)
            .select(
                "file_name",
                "row_group",
                "column_name",
                "n_rows",
                "min_val",
                "max_val",
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_pruned",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]} AND {_RG_PRUNE_RANGE[1]}
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer-stats skipping through the PERSISTED manifest — the
    production lifecycle end to end: range-cluster the table
    (``rangekey_write``), build the manifest for most of its files,
    APPEND the stats of the late-landing rest
    (``append_stats_manifest`` — the ingest-batch path), then answer
    the range aggregate with ``manifest_pruned_scan``, where pruning is
    an agg+filter ON THE MANIFEST TABLE and only matching paths reach
    the driver. Same oracle as ``scan_rowgroup_pruned``, so the driver
    hash-checks that manifest-driven skipping loses no rows even
    across the append; manifest==direct-footer-read equality and the
    numFiles drop are pinned in tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "rangekey_m")
    mpath = scratch_path(spark, sf_dir, "stats_manifest")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        rangekey_write(spark, sf_dir, path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(spark, files[:12], mpath)
        if files[12:]:
            append_stats_manifest(spark, files[12:], mpath)
        return (
            manifest_pruned_scan(spark, mpath, "o_orderkey", lo, hi)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


#: price band for the float-stats pruning demo (~central slice of
#: o_totalprice at any SF)
_MANIFEST_PRICE_RANGE = (150000.0, 250000.0)


@register(
    "scan_manifest_pruned_double",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_totalprice BETWEEN {_MANIFEST_PRICE_RANGE[0]}
                                AND {_MANIFEST_PRICE_RANGE[1]}
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven skipping on a FLOAT measure column: cluster
    orders by ``o_totalprice``, manifest carries (o_orderkey,
    o_totalprice) stats from the same single footer pass, and a price-
    band aggregate prunes through the manifest — proving the stats
    table's double min/max columns serve numeric predicates of any
    type, not just integer keys (parquet double footer stats are exact,
    so conservative overlap on them loses no rows; the driver hash
    checks exactly that). The residual BETWEEN still reaches the scan
    for row-group pruning inside matching files."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "pricekey")
    mpath = scratch_path(spark, sf_dir, "stats_manifest_price")
    lo, hi = _MANIFEST_PRICE_RANGE
    with scratch_cleanup(path, mpath):
        load_table(spark, sf_dir, "orders").repartitionByRange(
            16, "o_totalprice"
        ).write.mode("overwrite").parquet(path)
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(
            spark, files, mpath, ("o_orderkey", "o_totalprice")
        )
        return (
            manifest_pruned_scan(spark, mpath, "o_totalprice", lo, hi)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


#: doc_id band for the partition+stats combined-pruning demo (spans a
#: minority of range clusters at every fixture SF)
_PART_PRUNE_RANGE = (50, 199)


@register(
    "scan_manifest_partitioned",
    oracle=f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang = 'en'
          AND doc_id BETWEEN {_PART_PRUNE_RANGE[0]} AND {_PART_PRUNE_RANGE[1]}
        GROUP BY source
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-AWARE manifest pruning — Iceberg's partition-tuple +
    column-stats skipping in one metadata pass: documents land
    Hive-partitioned by lang AND range-clustered by doc_id inside each
    partition, the manifest records each file's partition values
    (parsed from its path — the reference's ``YYYYMMDD/`` prefix layout,
    ``/root/reference/app.py:449-456``, generalized to named key=value
    dirs) beside its footer stats, and a lang+key-band aggregate prunes
    on BOTH axes: non-en partitions vanish on the partition filter, and
    en files outside the doc_id band vanish on stats — each axis alone
    would scan strictly more files (pytest-pinned numFiles drops,
    tests/test_catalog_scale.py). At 100 TB this is the difference
    between touching one partition's boundary files and touching every
    partition's boundary files. The leaf files drop the partition
    column (Hive layout), which the combined filter makes irrelevant:
    every surviving row is lang='en' by construction."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "part_manifest_data")
    mpath = scratch_path(spark, sf_dir, "part_manifest")
    lo, hi = _PART_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        (
            load_table(spark, sf_dir, "documents")
            .repartitionByRange(6, "doc_id")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(path)
        )
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        write_stats_manifest(
            spark, files, mpath, ("doc_id",), partition_by=("lang",)
        )
        return (
            manifest_pruned_scan(
                spark,
                mpath,
                "doc_id",
                lo,
                hi,
                partition_filter={"lang": "en"},
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_partition_evolution",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang = 'en'
        GROUP BY source
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_partition_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-SPEC EVOLUTION without rewriting a byte — Iceberg's
    signature trick, which falls out of the manifest design rather than
    being bolted on: the table's FIRST generation lands flat (no
    partition dirs, manifest rows carry no partition entries), the
    spec then changes, and the SECOND generation lands Hive-partitioned
    by lang with recorded values. A lang-filtered scan prunes the NEW
    generation to exactly its matching partition dirs while including
    every OLD-generation file conservatively (no recorded entry →
    cannot be skipped) — correct by construction, and strictly better
    than either rewriting history to the new spec or losing pruning on
    new data. The driver hash pins exactness across the mixed
    generations; the numFiles split (old all-in, new pruned) is
    pytest-pinned. Seed: the reference changed its S3 key scheme
    mid-life exactly this way (``/root/reference/app.py:449-463``'s
    date-prefix layout vs the fallback bare-name branch at
    ``app.py:457-459``)."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    old_dir = scratch_path(spark, sf_dir, "pspec_old")
    new_dir = scratch_path(spark, sf_dir, "pspec_new")
    mpath = scratch_path(spark, sf_dir, "pspec_manifest")
    with scratch_cleanup(old_dir, new_dir, mpath):
        docs = load_table(spark, sf_dir, "documents")
        # generation 1: the old flat spec (doc_id % 2 == 0 cohort);
        # lang kept IN-FILE because the layout does not encode it
        docs.filter(F.col("doc_id") % 2 == 0).repartition(
            3, "doc_id"
        ).write.mode("overwrite").parquet(old_dir)
        old_files = sorted(_glob.glob(os.path.join(old_dir, "*.parquet")))
        write_stats_manifest(spark, old_files, mpath, ("doc_id",))
        # spec change: generation 2 lands lang-partitioned
        (
            docs.filter(F.col("doc_id") % 2 == 1)
            .repartition(2, "doc_id")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(new_dir)
        )
        new_files = sorted(
            _glob.glob(
                os.path.join(new_dir, "**", "*.parquet"), recursive=True
            )
        )
        append_stats_manifest(
            spark, new_files, mpath, ("doc_id",), partition_by=("lang",)
        )
        scanned = manifest_pruned_scan(
            spark,
            mpath,
            "doc_id",
            -1,
            2**62,
            partition_filter={"lang": "en"},
            merge_schema=True,
        )
        # old-generation leaf files carry lang in-file; new-generation
        # files dropped it into the dir name and are already en-only —
        # recover it from either source and apply the residual filter
        lang = F.coalesce(
            F.col("lang"),
            F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1),
        )
        return (
            scanned.withColumn("_lang", lang)
            .filter(F.col("_lang") == "en")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def vacuum_orphans_report(
    spark: SparkSession, data_dir: str, manifest_dir: str
) -> DataFrame:
    """Orphan-file GC report — the maintenance twin of the manifest
    being the catalog: files on disk but ABSENT from the stats manifest
    are unreachable by ``manifest_pruned_scan`` (failed-write leftovers,
    superseded compaction inputs, files landed without
    ``append_stats_manifest``) and hold reclaimable storage. The
    listing side is |files|-rows of metadata anti-joined against the
    manifest's distinct paths; only the ORPHAN list is collected and
    only orphan files are re-opened (with ``basePath`` so their
    partition values survive) to size the reclaim. This is what a
    table format's VACUUM computes before deleting; the report is
    returned rather than acted on so the caller owns the destructive
    step."""
    import glob as _glob

    import pandas as _pd

    all_files = sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    if not all_files:
        raise ValueError(f"vacuum_orphans_report: no files under {data_dir}")
    listing = spark.createDataFrame(
        _pd.DataFrame({"path": all_files}), "path string"
    )
    # VISIBLE paths only: a tombstoned file (compaction input, retention
    # delete) is exactly what vacuum exists to reclaim
    tracked = (
        _visible_stats(spark.read.parquet(manifest_dir), None)
        .select("path")
        .distinct()
    )
    orphans = [
        r.path for r in listing.join(tracked, "path", "left_anti").collect()
    ]
    if not orphans:
        return (
            spark.read.option("basePath", data_dir)
            .parquet(data_dir)
            .filter(F.lit(False))
        )
    return spark.read.option("basePath", data_dir).parquet(*orphans)


#: KMV sketch size for the per-file NDV manifest (matches the
#: aggregate family's KMV_K so estimates are comparable)
_SKETCH_K = 64

#: 2^60 as a DOUBLE literal — division must run in double, not decimal
#: (see operators/aggregates.py agg_kmv_distinct)
_SKETCH_SCALE = 1152921504606846976.0


def write_kmv_sketch_manifest(
    spark: SparkSession,
    paths: list[str],
    sketch_dir: str,
    column: str,
    k: int = _SKETCH_K,
) -> None:
    """Per-FILE KMV distinct sketches persisted as a manifest table —
    Iceberg's Puffin NDV blobs, built Spark-first: one pass over the
    files keeps each file's K smallest portable hashes of ``column``
    (md5→60-bit→(0,1), the ``agg_kmv_distinct`` hash, so every estimate
    is a deterministic function of the data and DuckDB can recompute it
    exactly). Rows are (path, file_name, key, u) — K rows per file, KBs
    per thousand files. The payoff is :func:`sketch_merged_ndv`:
    because the global K smallest hashes are each among their own
    file's K smallest, merging ANY file subset's sketches
    (union-distinct + trim to K) yields EXACTLY the sketch a direct
    pass over those files would build — approximate NDV for the
    optimizer / dashboards from pure metadata, no data scan, over any
    pruned file selection."""
    from pyspark.sql import Window as W

    if not paths:
        raise ValueError("write_kmv_sketch_manifest: empty path list")
    hashed = (
        spark.read.parquet(*paths)
        .select(
            _decode_input_file().alias("path"),
            F.col(column).cast("long").alias("key"),
        )
        .distinct()
        .withColumn(
            "u",
            F.expr(
                "cast(conv(substring(md5(cast(key as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            / F.lit(_SKETCH_SCALE),
        )
    )
    w = W.partitionBy("path").orderBy("u", "key")
    (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "path",
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.lit(column).alias("column_name"),
            "key",
            "u",
        )
        .write.mode("overwrite")
        .parquet(sketch_dir)
    )


def sketch_merged_ndv(
    spark: SparkSession,
    sketch_dir: str,
    paths: list[str] | None = None,
    k: int = _SKETCH_K,
) -> DataFrame:
    """Merge the (optionally path-restricted) per-file KMV sketches and
    estimate distinct count: union-distinct the kept keys, take the K
    smallest hashes (a global top-K — ``TakeOrdered``, never a
    single-partition window), estimate (K-1)/u_K, or the exact kept
    count when fewer than K survive. Returns a 1-row frame
    (sketch_size, kmv_estimate). Metadata-scale end to end: the input
    is ≤ K×|files| sketch rows."""
    rows = spark.read.parquet(sketch_dir)
    if paths is not None:
        rows = rows.filter(F.col("path").isin(list(paths)))
    merged = (
        rows.select("key", "u").distinct().orderBy("u", "key").limit(int(k))
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("sketch_size"),
        F.when(
            F.count(F.lit(1)) < int(k),
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(float(k) - 1.0) / F.max("u"))
        .alias("kmv_estimate"),
    )


@register(
    "scan_manifest_sketch_ndv",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT o_custkey,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                        AS BIGINT) / 1152921504606846976.0 AS u
            FROM orders
        ),
        merged AS (
            SELECT u FROM (
                SELECT u, ROW_NUMBER() OVER (ORDER BY u, o_custkey) AS rn
                FROM hashed
            ) WHERE rn <= {_SKETCH_K}
        )
        SELECT (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
                   AS n_exact,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM merged) AS sketch_size,
               CASE WHEN (SELECT COUNT(*) FROM merged) < {_SKETCH_K}
                    THEN (SELECT CAST(COUNT(*) AS DOUBLE) FROM merged)
                    ELSE ({_SKETCH_K} - 1.0) / (SELECT MAX(u) FROM merged)
               END AS kmv_estimate
    """,
    tags=("source", "layout", "sketch"),
)
def scan_manifest_sketch_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDV statistics FROM METADATA — the Puffin-sketch lifecycle end
    to end: orders land range-clustered, a per-file KMV sketch manifest
    is built beside the stats manifest, and the table's approximate
    distinct-customer count is answered by MERGING the per-file
    sketches — no data page is read at estimate time (the number a
    CBO's ndv() consults, kept fresh per file exactly like min/max
    stats). The portable md5 hash makes the merged estimate a
    deterministic function of the data, so the DuckDB oracle recomputes
    it EXACTLY — no tolerance band; the driver hash also pins that
    merging per-file sketches equals the direct whole-table sketch (the
    k-min subset property). Band-scoped merges (estimate NDV over just
    the stats-pruned file subset) are pytest-pinned merged==direct in
    tests/test_catalog_scale.py. Seed: the reference's only statistic
    is an object COUNT on a prefix listing
    (``/root/reference/upload_to_rfs.py:16-35``); a governed table
    keeps mergeable per-file sketches instead."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "sketch_ndv_data")
    sdir = scratch_path(spark, sf_dir, "sketch_ndv_manifest")
    with scratch_cleanup(path, sdir):
        rangekey_write(spark, sf_dir, path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_kmv_sketch_manifest(spark, files, sdir, "o_custkey")
        est = sketch_merged_ndv(spark, sdir)
        exact = load_table(spark, sf_dir, "orders").agg(
            F.countDistinct("o_custkey").cast("long").alias("n_exact")
        )
        return (
            exact.crossJoin(F.broadcast(est))
            .select("n_exact", "sketch_size", "kmv_estimate")
            .localCheckpoint(eager=True)
        )


def vacuum_orphans(
    spark: SparkSession,
    data_dir: str,
    manifest_dir: str,
    older_than_seconds: float = 7 * 24 * 3600,
) -> tuple[int, int]:
    """EXECUTE the vacuum ``vacuum_orphans_report`` only plans — Delta's
    VACUUM semantics: delete files on disk that no CURRENT manifest row
    tracks (failed-write leftovers, tombstoned compaction inputs,
    retention-deleted partitions) and that are older than the retention
    window. The window is the time-travel horizon: a tombstoned file
    still serves as-of reads below its tombstone, so deleting it
    intentionally forfeits pinned reads older than the retention —
    exactly Delta's documented trade (default 7 days there and here).
    Pair with ``expire_manifest_history``, which retires the METADATA
    for the same horizon so expired pins fail loudly at the manifest
    instead of at a missing file. Only the orphan list is ever
    collected (metadata-scale); deletion is per-file unlink. Returns
    (n_deleted, bytes_reclaimed).

    Retention is measured from when the file became UNREFERENCED, not
    from when it was created — Delta's VACUUM semantics: a file written
    a month ago but tombstoned a minute ago still serves as-of reads
    inside the window and must survive. The gate is therefore
    ``max(file mtime, tombstone wall-clock) <= cutoff``; tombstone
    times come from the remove rows' min_val slot
    (:func:`remove_from_manifest`), and a tombstone written before that
    slot existed (NULL) falls back to the mtime-only gate."""
    import glob as _glob
    import time as _time

    all_files = sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    if not all_files:
        raise ValueError(f"vacuum_orphans: no files under {data_dir}")
    import pandas as _pd

    listing = spark.createDataFrame(
        _pd.DataFrame({"path": all_files}), "path string"
    )
    manifest = spark.read.parquet(manifest_dir)
    tracked = _visible_stats(manifest, None).select("path").distinct()
    orphans = [
        r.path for r in listing.join(tracked, "path", "left_anti").collect()
    ]
    tombstoned_at = {
        r.path: r.t
        for r in manifest.filter(F.col("op") == "remove")
        .groupBy("path")
        .agg(F.max("min_val").alias("t"))
        .collect()
        if r.t is not None
    }
    cutoff = _time.time() - float(older_than_seconds)
    n_deleted = 0
    reclaimed = 0
    for path in orphans:
        try:
            st = os.stat(path)
        except FileNotFoundError:
            continue
        unreferenced_at = max(st.st_mtime, tombstoned_at.get(path, 0.0))
        if unreferenced_at <= cutoff:
            os.remove(path)
            n_deleted += 1
            reclaimed += st.st_size
    return n_deleted, reclaimed


@register(
    "plan_vacuum_orphans",
    oracle="""
        SELECT lang,
               CAST(1 AS BIGINT) AS n_files,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM documents
        WHERE lang IN ('fr', 'zh')
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_vacuum_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM planning over the manifest-as-catalog: documents land
    partitioned by lang (one file per partition — deterministic
    content), the manifest is built for only the de/en/es partitions,
    and the report must surface exactly the fr/zh files as orphans with
    their reclaimable row counts — the dirs a table-format VACUUM would
    delete. The oracle recomputes the orphan partitions' shapes from
    the raw table, so the driver hash-checks that the anti-join finds
    precisely the untracked files, no more (tracked partitions must NOT
    appear) and no less. Seed: the reference's date-prefixed layout
    (``/root/reference/app.py:449-463``), where a failed upload leaves
    exactly this kind of unreferenced object behind."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "vacuum_docs")
    mpath = scratch_path(spark, sf_dir, "vacuum_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)
        tracked_files = sorted(
            p
            for lang in ("de", "en", "es")
            for p in _glob.glob(
                os.path.join(data_dir, f"lang={lang}", "*.parquet")
            )
        )
        write_stats_manifest(spark, tracked_files, mpath, ("doc_id",))
        orphans = vacuum_orphans_report(spark, data_dir, mpath).withColumn(
            "_file", F.input_file_name()
        )
        return (
            orphans.groupBy("lang")
            .agg(
                F.count_distinct("_file").cast("long").alias("n_files"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_asof",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang <> 'zh'
        GROUP BY lang
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL through the manifest's snapshot axis: documents land
    partitioned by lang, the manifest is built at snapshot 0 (de/en/es),
    then fr lands at snapshot 1 and zh at snapshot 2 — and a query
    pinned ``as_of=1`` must see exactly the world as of snapshot 1:
    fr included, zh invisible, even though zh's files sit on disk AND
    in the (current) manifest. Visibility is a pure metadata filter
    (``snapshot_id <= as_of`` on the stats table) — the table-format
    snapshot-isolation contract, with the reproducibility payoff for
    training pipelines: a run pinned to a snapshot reads the same
    corpus forever, regardless of what later ingests append. The
    oracle recomputes the as-of world from the raw table (everything
    but zh), so the driver hash-checks the visibility boundary in both
    directions."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "asof_docs")
    mpath = scratch_path(spark, sf_dir, "asof_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)

        def lang_files(*langs: str) -> list[str]:
            return sorted(
                p
                for lang in langs
                for p in _glob.glob(
                    os.path.join(data_dir, f"lang={lang}", "*.parquet")
                )
            )

        write_stats_manifest(spark, lang_files("de", "en", "es"), mpath, ("doc_id",))
        v1 = append_stats_manifest(spark, lang_files("fr"), mpath, ("doc_id",))
        append_stats_manifest(spark, lang_files("zh"), mpath, ("doc_id",))
        visible = manifest_pruned_scan(
            spark, mpath, "doc_id", 0, 2**62, as_of=v1
        )
        # leaf-file reads drop partition dir values; recover lang from
        # the path the row was read from (pure metadata, no join)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def commit_data_compaction(
    spark: SparkSession,
    manifest_dir: str,
    paths: list[str],
    columns: tuple[str, ...] | None = None,
    partition_by: tuple[str, ...] = (),
) -> tuple[str, int]:
    """DATA-file compaction committed THROUGH the manifest — the
    missing half of ``catalog.compact_parquet_dir`` for
    manifest-governed tables (that helper rewrites a whole directory
    in place; a governed table instead swaps files ATOMICALLY in
    metadata): read the fragment files, rewrite them as ONE file
    beside them, then commit ``add``(new) + ``remove``(fragments) at a
    single snapshot id. Readers pinned below that snapshot still see
    the fragments (reproducibility); current readers see only the
    compacted file (never both — the double-count is the failure mode
    the registered query's oracle hash-checks); the fragments become
    vacuum-reclaimable. Cost is fragment-sized: one read+write of the
    compacted bytes plus two metadata appends. With ``columns=None``
    (the default) the compacted file's stats carry the tracked column
    set the FRAGMENTS had in the manifest — a narrower append would
    hide the compacted file from scans probing the other tracked
    columns (the merge/delete-compaction fix, applied here too);
    ``partition_by`` re-records Hive partition values. Returns
    (new_path, snapshot_id)."""
    import glob as _glob
    import shutil as _shutil

    if not paths:
        raise ValueError("commit_data_compaction: empty path list")
    if columns is None:
        tracked = sorted(
            r.column_name
            for r in spark.read.parquet(manifest_dir)
            .filter((F.col("op") == "add") & F.col("path").isin(list(paths)))
            .select("column_name")
            .distinct()
            .collect()
        )
        columns = tuple(tracked) or _MANIFEST_COLS
    out_dir = os.path.dirname(sorted(paths)[0])
    snap = _claimed_next_snapshot(spark, manifest_dir)
    tmp = os.path.join(out_dir, f".compact_{snap}_stage")
    spark.read.parquet(*paths).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    new_path = os.path.join(out_dir, f"compacted-{snap}.parquet")
    _shutil.move(part, new_path)
    _shutil.rmtree(tmp, ignore_errors=True)
    # add(compacted) + remove(fragments) commit as ONE append — a reader
    # between two appends would double-count (or lose) the fragment rows
    verify_claim(manifest_dir, snap)
    commit_manifest_rows(
        spark,
        manifest_dir,
        [
            _stats_add_rows(spark, [new_path], columns, snap, partition_by),
            _tombstone_rows(spark, manifest_dir, paths, snap),
        ],
    )
    return new_path, snap


@register(
    "plan_manifest_compact_commit",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_manifest_compact_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compaction COMMIT protocol end to end: documents land
    fragmented (4 write tasks × lang partitions => several small files
    per lang dir), the manifest tracks all of them, then the 'en'
    partition's fragments are compacted and committed
    (``commit_data_compaction`` — add the merged file and tombstone the
    fragments at ONE snapshot). The query then reads the WHOLE table
    through the manifest: per-lang counts and char sums must equal the
    raw table exactly — if the tombstones failed, 'en' double-counts
    (old + compacted files both visible); if the add failed, 'en'
    vanishes; either way the driver hash catches it. Time travel
    across the commit and vacuum reclaim of the fragments are
    pytest-pinned in tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "compact_commit_docs")
    mpath = scratch_path(spark, sf_dir, "compact_commit_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(4).write.partitionBy(
            "lang"
        ).mode("overwrite").parquet(data_dir)
        all_files = sorted(
            _glob.glob(os.path.join(data_dir, "lang=*", "*.parquet"))
        )
        write_stats_manifest(spark, all_files, mpath, ("doc_id",))
        en_files = [p for p in all_files if "/lang=en/" in p]
        assert len(en_files) > 1, "fixture should fragment the en partition"
        commit_data_compaction(spark, mpath, en_files, ("doc_id",))
        visible = manifest_pruned_scan(spark, mpath, "doc_id", 0, 2**62)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "plan_retention_delete",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang <> 'zh'
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY delete: when a retention predicate aligns with
    file boundaries (partition dirs, range-clustered files wholly
    inside the cutoff), deletion is pure manifest maintenance — one
    tombstone row per affected file (``remove_from_manifest``), ZERO
    data bytes rewritten; the table-format DELETE fast path, vs the
    rewrite-every-matching-file cost of a format without a manifest.
    Here the 'zh' partition is retired: its files stay on disk
    (vacuum's job, and as-of reads below the delete still see them —
    GDPR-style physical erasure = this delete + vacuum), but the
    current table view excludes them. The oracle recomputes the
    post-delete world from the raw table, so the driver hash-checks
    both that zh vanished and that nothing else did. Files straddling
    a predicate boundary can't take this path — they need the rewrite
    (``commit_data_compaction``'s shape with a filter)."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "retention_docs")
    mpath = scratch_path(spark, sf_dir, "retention_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)
        all_files = sorted(
            _glob.glob(os.path.join(data_dir, "lang=*", "*.parquet"))
        )
        write_stats_manifest(spark, all_files, mpath, ("doc_id",))
        retired = [p for p in all_files if "/lang=zh/" in p]
        assert retired, "fixture must contain the partition being retired"
        remove_from_manifest(spark, mpath, retired)
        visible = manifest_pruned_scan(spark, mpath, "doc_id", 0, 2**62)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


# --------------------------------------------------------------------------
# BLOOM-FILTER manifest (r8): point-lookup file skipping. Min/max stats
# prune RANGE predicates, but a high-cardinality key uniformly spread
# across files (a doc_id, an order id under hash layout) defeats them —
# every file's [min, max] covers every key, so a point lookup reads the
# whole table. A small per-file Bloom filter over the key column answers
# "can this file contain key x?" with no false negatives, so the scan
# opens ~|keys| files out of millions. Parquet has optional per-column
# bloom filters in the file format itself; this manifest keeps them in
# the catalog instead so planning never opens data-file footers — the
# same argument as the stats manifest above, applied to equality
# predicates.
# --------------------------------------------------------------------------

#: universal-hash constants for the k=5 bloom probes:
#: pos_j(x) = ((a_j * x + b_j) mod P) mod m with P = 2^31 - 1 and
#: a_j < 2^28, so a_j * (x mod P) < 2^59 — no int64 overflow (the same
#: overflow-safe construction as llm/dedup.py's MinHash constants). The
#: key enters as pmod(xxhash64(CAST(key AS STRING)), P): casting to
#: STRING first makes the filter layout-proof against integer width
#: (int32 column vs BIGINT literal hash differently under Spark's typed
#: hash functions), and xxhash64 is the same stable hash Spark's
#: bucketing contract relies on, so a filter built by one Spark version
#: probes correctly under another.
_BLOOM_P = 2_147_483_647
_BLOOM_A = (1299721, 15485917, 32452871, 49979699, 67868017)
_BLOOM_B = (8369347, 23879539, 39916811, 54018533, 7368791)
#: bits per key: m = next_pow2(10 * rows_per_file) with k = 5 probes
#: gives a ~1% per-key false-positive rate (a false positive costs one
#: needlessly opened file whose residual predicate drops every row —
#: never a wrong answer).
_BLOOM_BPK = 10

_BLOOM_MANIFEST_SCHEMA = (
    "path string, file_name string, column_name string, m_bits long,"
    " bloom array<bigint>, snapshot_id int, op string"
)


def _bloom_key_sql(key_sql: str) -> str:
    """The normalized 31-bit key a bloom position derives from."""
    return f"pmod(xxhash64(CAST({key_sql} AS STRING)), {_BLOOM_P})"


def _bloom_pos_sql(key_sql: str, m_sql: str) -> list[str]:
    """The k bit-position SQL expressions for ``key_sql`` under an
    ``m_sql``-bit filter (both may reference columns)."""
    x = _bloom_key_sql(key_sql)
    return [
        f"(pmod({a} * {x} + {b}, {_BLOOM_P}) % {m_sql})"
        for a, b in zip(_BLOOM_A, _BLOOM_B)
    ]


def build_bloom_manifest(
    spark: SparkSession,
    paths: list[str],
    bloom_dir: str,
    column: str,
    bits_per_key: int = _BLOOM_BPK,
    mode: str = "overwrite",
    snapshot_id: int = 0,
) -> int:
    """Build one Bloom filter PER DATA FILE over ``column`` and persist
    them as a manifest table beside the data. Entirely JVM-side and
    shuffle-light: one scan of the key column, each key exploded into
    its k (word, bit-mask) contributions, ``bit_or`` partial-aggregated
    into per-(file, word) words map-side, then assembled into a dense
    ``array<bigint>`` of m/64 words per file. The filter is sized from
    the parquet FOOTER row counts (metadata-only — no data read), so m
    tracks the table's actual file sizing; each manifest row carries its
    own ``m_bits``, letting appends size independently as files grow.
    Returns m_bits. Files whose every row is NULL-keyed carry an
    all-zero bloom (via the densify filler below) — which correctly
    prunes every point lookup, since no lookup can match NULL.

    FP economics, MEASURED at sf0.1 (16 hash-clustered files, ~9 375
    rows each, m=131 072 after pow2 rounding → ~14 effective bits/key):
    320 000 absent-key×file trials produced 819 false positives
    (0.256%) vs the analytic (1-e^{-k·n/m})^k = 0.248% — ratio 1.03,
    i.e. the affine double-hash family loses nothing to ideal random
    hashing. At 100 TB the same sizing gives the same per-file rate
    (it depends only on n/m, which the footer-count sizing holds
    constant), so a 10 000-file table opens ~26 spurious files per
    1 000 point probes. Pinned two-sided (0.25x-2x analytic, plus
    zero false negatives) in tests/test_catalog_scale.py.

    Seed: the reference prunes its object listing by date-prefix string
    match (``/root/reference/app.py:449-463``) — the degenerate bloom
    where the key IS the file name; this generalizes to any column."""
    import math as _math

    if not paths:
        raise ValueError("build_bloom_manifest: empty path list")
    max_rows = (
        read_footer_stats_multi(spark, paths, (column,))
        .groupBy("path")
        .agg(F.sum("n_rows").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    ) or 1
    m_bits = max(1024, 1 << _math.ceil(_math.log2(bits_per_key * max_rows)))
    n_words = m_bits // 64
    rows = (
        spark.read.parquet(*paths)
        .select(
            _decode_input_file().alias("path"),
            F.col(column).alias("k"),
        )
        .filter(F.col("k").isNotNull())
    )
    structs = ", ".join(
        f"named_struct('word', CAST({pos} DIV 64 AS BIGINT),"
        f" 'mask', shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT)))"
        for pos in _bloom_pos_sql("k", str(m_bits))
    )
    contrib = rows.selectExpr(
        "path", f"explode(array({structs})) AS c"
    ).select("path", "c.word", "c.mask")
    # densify via a zero-word filler + sort, NOT a map probe: the first
    # landing built map<word,bits> per file and filled the dense array
    # with transform(sequence(0, n_words-1), w -> wm[w]) — but Spark's
    # GetMapValue is a LINEAR scan, so that was O(n_words^2) interpreted
    # lookups per file (measured 3.7 s of the sf0.1 build; this form is
    # 0.7 s, output bit-identical). Union one zero row per (file, word),
    # bit_or them with the real contributions, and the sorted entry list
    # IS the dense array.
    import pandas as _pd

    filler = (
        spark.createDataFrame(
            _pd.DataFrame({"path": sorted(paths)}), "path string"
        )
        .select(
            "path",
            F.explode(F.sequence(F.lit(0), F.lit(n_words - 1))).alias("w"),
        )
        .select(
            "path",
            F.col("w").cast("long").alias("word"),
            F.lit(0).cast("long").alias("mask"),
        )
    )
    words = (
        contrib.unionByName(filler)
        .groupBy("path", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    (
        words.groupBy("path")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(word, bits))),"
                " e -> e.bits)"
            ).alias("bloom")
        )
        .select(
            "path",
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.lit(column).alias("column_name"),
            F.lit(m_bits).cast("long").alias("m_bits"),
            "bloom",
            F.lit(int(snapshot_id)).cast("int").alias("snapshot_id"),
            F.lit("add").alias("op"),
        )
        .write.mode(mode)
        .parquet(bloom_dir)
    )
    return m_bits


def append_bloom_manifest(
    spark: SparkSession,
    new_paths: list[str],
    bloom_dir: str,
    column: str,
    bits_per_key: int = _BLOOM_BPK,
    snapshot_id: int | None = None,
) -> int:
    """Incremental bloom-manifest maintenance: filter ONLY the newly
    landed files and append their rows — ingest-batch cost, mirroring
    ``append_stats_manifest``. The append sizes its own m_bits from the
    new files' footer counts (each row carries m_bits, so probes mix
    generations freely). Tombstones via ``remove_from_manifest`` and
    time travel via the shared snapshot axis both apply unchanged.
    Returns the snapshot id written."""
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, bloom_dir)
    build_bloom_manifest(
        spark,
        new_paths,
        bloom_dir,
        column,
        bits_per_key=bits_per_key,
        mode="append",
        snapshot_id=int(snapshot_id),
    )
    return int(snapshot_id)


def bloom_pruned_scan(
    spark: SparkSession,
    bloom_dir: str,
    column: str,
    keys: list,
    as_of: int | None = None,
) -> DataFrame:
    """Answer a point-lookup (``column IN keys``) through the persisted
    bloom manifest: evaluate the k bit tests per key AGAINST THE
    MANIFEST ROWS (a metadata-scale filter — the key's positions are
    constant-folded, each row checks k words of its own filter), collect
    only the candidate path list, and scan just those files with the
    residual IN-predicate pushed down. No false negatives by
    construction; a false positive opens one extra file whose rows the
    residual drops. ``as_of`` time-travels on the shared snapshot axis
    exactly like ``manifest_pruned_scan``."""
    from functools import reduce as _reduce
    from operator import and_ as _and, or_ as _or

    if not keys:
        raise ValueError("bloom_pruned_scan: empty key list")
    man = _visible_stats(spark.read.parquet(bloom_dir), as_of).filter(
        F.col("column_name") == column
    )

    def _lit_sql(v) -> str:
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            raise TypeError(f"bloom keys must be int or str, got {type(v)}")
        return (
            str(v)
            if isinstance(v, int)
            else "'" + v.replace("'", "''") + "'"
        )

    def _key_hits(v):
        tests = [
            F.expr(
                f"(bloom[CAST({pos} DIV 64 AS INT)]"
                f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT)))"
                " <> 0"
            )
            for pos in _bloom_pos_sql(_lit_sql(v), "m_bits")
        ]
        return _reduce(_and, tests)

    cond = _reduce(_or, (_key_hits(v) for v in keys))
    matching = [
        r.path for r in man.filter(cond).select("path").distinct().collect()
    ]
    if not matching:
        any_path = man.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty bloom manifest at {bloom_dir}")
        return spark.read.parquet(any_path[0].path).filter(F.lit(False))
    return spark.read.parquet(*matching).filter(
        F.col(column).isin(list(keys))
    )


#: the demo point-lookup keys — dense 0-based o_orderkey, so all three
#: exist at every fixture SF (orders has >= 1500 rows at sf0.001)
_BLOOM_LOOKUP_KEYS = (101, 733, 1337)


@register(
    "scan_manifest_bloom",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderkey IN {_BLOOM_LOOKUP_KEYS}
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup file skipping through the persisted BLOOM manifest —
    the equality-predicate complement of ``scan_manifest_pruned``: land
    orders HASH-clustered by o_custkey (so every file's o_orderkey
    min/max spans ~the whole key space and stats-based skipping is
    useless), build per-file bloom filters for most files, APPEND the
    late-landing rest (``append_bloom_manifest`` — the ingest path),
    then answer a 3-key IN lookup opening only candidate files. The
    oracle recomputes the lookup from the raw table, so the driver
    hash-checks that bloom skipping loses no rows across the append;
    the candidate-file drop and false-positive bound are pinned in
    tests/test_catalog_scale.py. At 100 TB this is 'fetch these doc ids
    from the corpus' without a 100 TB scan."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "hashlayout_bloom")
    bpath = scratch_path(spark, sf_dir, "bloom_manifest")
    with scratch_cleanup(path, bpath):
        load_table(spark, sf_dir, "orders").repartition(
            16, "o_custkey"
        ).write.mode("overwrite").parquet(path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        build_bloom_manifest(spark, files[:12], bpath, "o_orderkey")
        if files[12:]:
            append_bloom_manifest(spark, files[12:], bpath, "o_orderkey")
        return (
            bloom_pruned_scan(
                spark, bpath, "o_orderkey", list(_BLOOM_LOOKUP_KEYS)
            )
            .select(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


# --------------------------------------------------------------------------
# EQUALITY DELETES (r8): row-level deletes as metadata. plan_retention_
# delete handles the file-ALIGNED case (a whole partition tombstoned);
# this handles the scattered case — erase specific keys whose rows live
# across many files (GDPR user erasure, revoked documents) — without
# rewriting a byte: delete records land in the manifest, reads subtract
# them, history below the delete stays intact, and a later compaction
# rewrite applies them physically (Iceberg v2 equality-delete shape).
# --------------------------------------------------------------------------


def equality_delete(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    values: list,
    snapshot_id: int | None = None,
) -> int:
    """Append EQUALITY-DELETE records to the manifest: one metadata row
    per deleted key (op='delete_eq', the key carried in min_val==
    max_val), stamped at the next snapshot. Cost is |values| rows of
    metadata however many data files the keys' rows touch — the point
    of the shape. ``_visible_stats`` ignores non-'add' ops, so delete
    records never perturb stats pruning; only ``read_with_deletes``
    consumes them. Returns the snapshot id written."""
    import pandas as _pd

    if not values:
        raise ValueError("equality_delete: empty value list")
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, manifest_dir)
    pdf = _pd.DataFrame(
        {
            "path": "",
            "file_name": "",
            "row_group": -1,
            "column_name": column,
            "n_rows": 0,
            "min_val": [float(v) for v in sorted(values)],
            "max_val": [float(v) for v in sorted(values)],
            "snapshot_id": int(snapshot_id),
            "op": "delete_eq",
            "partition_values": None,
        }
    )
    spark.createDataFrame(pdf, _MANIFEST_SCHEMA).write.mode("append").parquet(
        manifest_dir
    )
    return int(snapshot_id)


def _live_delete_records(
    manifest: DataFrame, column: str, as_of: int | None
) -> DataFrame:
    """The equality-delete records STILL IN FORCE at ``as_of``:
    'delete_eq' rows for ``column`` at snapshots <= the pin, minus
    those retired by a later-or-equal 'delete_retire' record (whose
    min_val carries the retired-through snapshot ceiling). Pinned
    reads between a delete and its compaction still subtract; reads at
    or above the compaction see the physically-rewritten files and an
    empty live-delete set."""
    if as_of is not None:
        manifest = manifest.filter(F.col("snapshot_id") <= as_of)
    scoped = manifest.filter(F.col("column_name") == column)
    ceiling = (
        scoped.filter(F.col("op") == "delete_retire")
        .agg(F.max("min_val"))
        .collect()[0][0]
    )
    dels = scoped.filter(F.col("op") == "delete_eq")
    if ceiling is not None:
        dels = dels.filter(F.col("snapshot_id") > int(ceiling))
    return dels


def read_with_deletes(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    as_of: int | None = None,
) -> DataFrame:
    """The manifest-visible table MINUS its live equality deletes: scan
    the files visible at ``as_of`` (full key range through
    ``manifest_pruned_scan``), then anti-join the delete keys recorded
    at or below the pin and not yet retired
    (``_live_delete_records``). The delete set is metadata-scale and
    BROADCASTS — at 100 TB the subtraction costs one map-side hash
    probe per row, no shuffle of data. An as-of below the delete
    snapshot resurrects the rows (history is never rewritten);
    ``compact_equality_deletes`` is the maintenance step that
    physically drops the rows, retires the records, and keeps the
    delete set from growing unboundedly."""
    manifest = spark.read.parquet(manifest_dir)
    dels = (
        _live_delete_records(manifest, column, as_of)
        .select(F.col("min_val").alias("__del_key"))
        .distinct()
    )
    data = manifest_pruned_scan(
        spark, manifest_dir, column, -float("inf"), float("inf"), as_of=as_of
    )
    return data.join(
        F.broadcast(dels),
        data[column].cast("double") == dels["__del_key"],
        "left_anti",
    )


#: the demo erasure set — doc_ids scattered across every file at all
#: fixture SFs (documents has >= 500 rows)
_EQ_DELETE_IDS = (3, 100, 203, 307, 411)


@register(
    "plan_equality_delete",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE doc_id NOT IN {_EQ_DELETE_IDS}
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_equality_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL delete as pure metadata — the scattered-key case
    ``plan_retention_delete``'s file-aligned tombstones cannot express:
    five doc_ids whose rows live in different files are erased by five
    equality-delete records in the manifest; the read subtracts them
    via a broadcast anti-join and ZERO data bytes are rewritten. The
    oracle recomputes the post-delete world from the raw table, so the
    driver hash-checks both that the five ids vanished and that every
    other row survived. as-of reads below the delete still see the
    rows (pinned in tests/test_catalog_scale.py) — the
    reproducible-training-corpus contract extended to row-level
    erasure."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "eqdel_docs")
    mpath = scratch_path(spark, sf_dir, "eqdel_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            8, "doc_id"
        ).write.mode("overwrite").parquet(data_dir)
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("doc_id",))
        equality_delete(spark, mpath, "doc_id", list(_EQ_DELETE_IDS))
        return (
            read_with_deletes(spark, mpath, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_xml_roundtrip",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey,
               CAST(strlen(n_name) AS BIGINT) AS name_len
        FROM nation
    """,
    tags=("source", "sink"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + schema'd XML scan — Spark 4's NATIVE xml data source
    (no external spark-xml package), the interchange format seismic
    metadata actually ships in (StationXML: station/channel inventories
    are XML documents; the reference hardcodes its station catalog in
    JSON instead, ``config.json:2-18``). Write nation as row-tagged
    XML, read it back with the parquet original's explicit schema
    (never schema inference at scale — entity parsing per row is
    expensive enough without a second discovery pass), project. The
    oracle reads the parquet original, proving the angle-bracket round
    trip is lossless including string escaping."""
    prepare(spark)
    sink = _sink_path("nation_xml", sf_dir)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.mode("overwrite").format("xml").option(
        "rootTag", "nations"
    ).option("rowTag", "nation").save(sink)
    back = (
        spark.read.format("xml")
        .schema(nation.schema)
        .option("rowTag", "nation")
        .load(sink)
    )
    return back.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.length("n_name").cast("long").alias("name_len"),
    )


def clone_manifest(
    spark: SparkSession, src_manifest: str, dst_manifest: str
) -> None:
    """ZERO-COPY shallow clone: a new manifest referencing the SAME
    data files — cloning a 100 TB table costs one metadata-table copy
    (KBs), no data bytes move. From that instant the two catalogs
    evolve independently: deletes/appends/compactions committed to one
    are invisible to the other, while both keep reading the shared
    files (vacuum safety therefore requires the union of live
    manifests — noted in ``vacuum_orphans_report``'s contract). This
    is the dev/staging-against-production-data workflow every table
    format ships (Delta SHALLOW CLONE, Iceberg snapshot refs)."""
    df = spark.read.parquet(src_manifest)
    df.coalesce(1).write.mode("overwrite").parquet(dst_manifest)


@register(
    "plan_shallow_clone",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang <> 'zh'
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow-clone ISOLATION end to end: clone the documents table's
    manifest (zero data copied), retire the 'zh' partition IN THE CLONE
    ONLY (metadata tombstones), and read the clone — the oracle
    recomputes the post-delete world, so the driver hash-checks that
    the clone both sees the shared data files and carries its own
    delete. The pytest twin asserts the other direction: the SOURCE
    manifest still sees zh untouched — two catalogs, one set of bytes.
    Seed: R19's copy-verify-delete migration
    (``/root/reference/upload_to_rfs.py``) — the copy leg made free."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "clone_docs")
    src_m = scratch_path(spark, sf_dir, "clone_src_manifest")
    dst_m = scratch_path(spark, sf_dir, "clone_dst_manifest")
    with scratch_cleanup(data_dir, src_m, dst_m):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)
        all_files = sorted(
            _glob.glob(os.path.join(data_dir, "lang=*", "*.parquet"))
        )
        write_stats_manifest(spark, all_files, src_m, ("doc_id",))
        clone_manifest(spark, src_m, dst_m)
        retired = [p for p in all_files if "/lang=zh/" in p]
        assert retired, "fixture must contain the partition being retired"
        remove_from_manifest(spark, dst_m, retired)  # clone only
        visible = manifest_pruned_scan(spark, dst_m, "doc_id", 0, 2**62)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_text_lines",
    oracle="""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_chars,
               lang
        FROM documents
    """,
    tags=("source", "sink"),
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented TEXT sink + scan (the log/plain-corpus interchange
    format — one record per line, schema recovered by parsing): write
    each document as a tab-joined ``doc_id\\tlang\\ttext`` line, read
    the directory back with the ``text`` source, and re-derive the
    typed columns by splitting on the first two tabs. The oracle reads
    the parquet original, proving the line round trip is lossless
    (the fixture corpus is newline/tab-free — a production writer
    escapes or length-prefixes; the parse side's limit-3 split already
    tolerates tabs INSIDE the payload). Line order is not preserved
    across partitioned files — irrelevant here because every row
    carries its own key, which is exactly why log-style formats embed
    one. Seed: R15's line-oriented fetch logs
    (``/root/reference/app.py:243-268``)."""
    prepare(spark)
    sink = _sink_path("documents_txt", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), "lang", "text")
        .alias("value")
    ).write.mode("overwrite").text(sink)
    back = spark.read.text(sink)
    parts = F.split("value", "\t", 3)
    return back.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.length(F.element_at(parts, 3)).cast("long").alias("n_chars"),
        F.element_at(parts, 2).alias("lang"),
    )


def manifest_incremental_scan(
    spark: SparkSession, manifest_dir: str, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """INCREMENTAL read between snapshots — the CDC direction of the
    manifest's time axis (``scan_manifest_asof`` answers "the world AS
    OF N"; this answers "what ARRIVED in (from, to]"): list the files
    whose ``add`` landed in the half-open snapshot interval and read
    only them — the consumption contract an incremental downstream job
    (index append, dedup promotion, aggregate maintenance) runs on,
    Iceberg's incremental-append scan — and exactly like Iceberg's, it
    consumes APPEND snapshots only: a snapshot that carries any
    ``remove`` is a maintenance commit (compaction rewrite), whose
    added file mixes moved rows with rows delivered by earlier
    snapshots — delivering it would double-count the past, so its adds
    are skipped wholesale (the moved rows were or will be consumed
    under their original append snapshots; tests pin this with a
    compaction inside the window). Pure metadata: the path list is
    interval-sized."""
    if to_snapshot < from_snapshot:
        raise ValueError(
            f"incremental scan: to={to_snapshot} < from={from_snapshot}"
        )
    m = spark.read.parquet(manifest_dir)
    window_rows = m.filter(
        (F.col("snapshot_id") > from_snapshot)
        & (F.col("snapshot_id") <= to_snapshot)
    )
    maintenance = (
        window_rows.filter(F.col("op") == "remove")
        .select("snapshot_id")
        .distinct()
    )
    added = (
        window_rows.filter(F.col("op") == "add")
        .join(maintenance, "snapshot_id", "left_anti")
        .select("path")
        .distinct()
    )
    paths = [r.path for r in added.collect()]
    if not paths:
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(*paths)


@register(
    "scan_manifest_incremental",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang IN ('fr', 'zh')
        GROUP BY lang
    """,
    tags=("scan", "manifest", "incremental"),
)
def scan_manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest's CDC read: with the same 3-snapshot staging as
    ``scan_manifest_asof`` (base de/en/es at snapshot 0, fr at 1, zh
    at 2), an incremental scan of (0, 2] must deliver EXACTLY the fr+zh
    arrivals — none of the base corpus, all of both increments. The
    oracle recomputes that delta from the raw table, so the driver
    hash-checks both interval edges. This is the consumption side of
    every incremental artifact in the repo (index appends, corpus
    promotion): downstream maintenance reads arrivals-since-N, never
    the table."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "incr_docs")
    mpath = scratch_path(spark, sf_dir, "incr_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)

        def lang_files(*langs: str) -> list[str]:
            return sorted(
                p
                for lang in langs
                for p in _glob.glob(
                    os.path.join(data_dir, f"lang={lang}", "*.parquet")
                )
            )

        write_stats_manifest(
            spark, lang_files("de", "en", "es"), mpath, ("doc_id",)
        )
        append_stats_manifest(spark, lang_files("fr"), mpath, ("doc_id",))
        append_stats_manifest(spark, lang_files("zh"), mpath, ("doc_id",))
        delta = manifest_incremental_scan(spark, mpath, 0, 2)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            delta.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def rollback_manifest(
    spark: SparkSession, manifest_dir: str, to_snapshot: int
) -> int:
    """ROLL BACK the table's CURRENT state to an earlier snapshot — as
    a NEW commit, never by rewriting history (Iceberg's rollback
    contract): every file visible now but not visible at
    ``to_snapshot`` gets a remove tombstone at the next snapshot id.
    Reads pinned to pre-rollback snapshots still reproduce exactly
    (the registered query's pytest pins both directions), and the
    rolled-back files become vacuum-reclaimable, not deleted. Pure
    metadata; both path sets are |manifest|-scale.

    Restriction, inherited from the manifest's unordered tombstone
    semantics (see ``remove_from_manifest``): a file REMOVED between
    the target and now (a compaction input) cannot be resurrected — a
    rollback across such maintenance raises instead of silently
    restoring a state with missing files."""
    m = spark.read.parquet(manifest_dir)
    target = {
        r.path
        for r in _visible_stats(m, to_snapshot).select("path").distinct().collect()
    }
    current = {
        r.path
        for r in _visible_stats(m, None).select("path").distinct().collect()
    }
    missing = sorted(target - current)
    if missing:
        raise ValueError(
            "rollback would need to resurrect files removed since the "
            f"target snapshot (unsupported): {missing[:3]}..."
        )
    to_hide = sorted(current - target)
    if not to_hide:
        return to_snapshot  # already at (or before) the target state
    return remove_from_manifest(spark, manifest_dir, to_hide)


@register(
    "plan_manifest_rollback",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang <> 'zh'
        GROUP BY lang
    """,
    tags=("plan", "manifest", "maintenance"),
)
def plan_manifest_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lifecycle's undo verb: with the standard 3-snapshot staging
    (base de/en/es at 0, fr at 1, zh at 2), rolling back to snapshot 1
    must make the CURRENT (unpinned) scan see the world as of 1 — fr
    in, zh gone — via one tombstone commit at snapshot 3. The oracle
    recomputes that world from the raw table; tests additionally pin
    that a read pinned as-of 2 still sees zh AFTER the rollback
    (history preserved — the property that keeps pre-rollback training
    runs reproducible)."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "rb_docs")
    mpath = scratch_path(spark, sf_dir, "rb_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)

        def lang_files(*langs: str) -> list[str]:
            return sorted(
                p
                for lang in langs
                for p in _glob.glob(
                    os.path.join(data_dir, f"lang={lang}", "*.parquet")
                )
            )

        write_stats_manifest(
            spark, lang_files("de", "en", "es"), mpath, ("doc_id",)
        )
        v1 = append_stats_manifest(spark, lang_files("fr"), mpath, ("doc_id",))
        append_stats_manifest(spark, lang_files("zh"), mpath, ("doc_id",))
        rollback_manifest(spark, mpath, v1)
        current = manifest_pruned_scan(spark, mpath, "doc_id", 0, 2**62)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            current.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_text_gzip",
    oracle="""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_chars, lang
        FROM documents
    """,
    tags=("source", "compression"),
)
def scan_text_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GZIP-transparent text ingest — how web corpora actually arrive
    (WET/WARC dumps, log shipping: ``.jsonl.gz``/``.txt.gz``): the
    line corpus of ``scan_text_lines`` is written through Spark's
    gzip output codec, and the read side does NOTHING special — the
    text source detects the ``.gz`` extension and inflates per file.
    The oracle proves the compressed round trip is lossless. The
    scale caveat a 100 TB ingest must know rides in the plan itself:
    gzip is NOT splittable, so each .gz file is one task — the
    pytest pins exactly that (input partitions == number of archive
    files, NOT bytes/maxPartitionBytes) — which is why production
    landing zones shard into many medium archives (or use splittable
    zstd-in-parquet once inside the lake, as every other scan here
    does)."""
    prepare(spark)
    sink = _sink_path("documents_txt_gz", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # several archives: the unsplittable-codec parallelism unit is the
    # FILE, so a real landing zone writes many — mirror that shape
    (
        docs.repartition(4)
        .select(
            F.concat_ws(
                "\t", F.col("doc_id").cast("string"), "lang", "text"
            ).alias("value")
        )
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(sink)
    )
    back = spark.read.text(sink)
    parts = F.split("value", "\t", 3)
    return back.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.length(F.element_at(parts, 3)).cast("long").alias("n_chars"),
        F.element_at(parts, 2).alias("lang"),
    )

def merge_through_manifest(
    spark: SparkSession,
    manifest_dir: str,
    delta: DataFrame,
    key: str,
    cols: list[str],
    insert_files: int = 1,
    snapshot_id: int | None = None,
) -> tuple[int, int, int]:
    """MERGE committed THROUGH the manifest — the copy-on-write shape
    (Iceberg CoW, Delta MERGE): rewrite ONLY the data files whose
    footer-stats key range intersects the delta's keys, tombstone them
    and add the rewritten files (plus one insert file for unmatched
    delta keys) at ONE snapshot id. As-of reads below that snapshot see
    the pre-merge table unperturbed; current reads see exactly the
    merged table. Seed: the reference's blind re-upload
    (``/root/reference/app.py:461-488``) — last-writer-wins by S3 key
    with no record of what changed; ``plan_merge_upsert`` made the row
    action observable, and this closes the remaining gap: committing
    the rewrite atomically in table metadata instead of clobbering
    files in place.

    Scale shape: candidacy is decided on the MANIFEST (per-file
    min/max agg + a join against the distinct delta keys — only
    intersecting paths are ever collected, never the full file list);
    matched-vs-insert classification joins the delta against ONLY the
    intersecting files' keys (a non-intersecting file provably
    contains no delta key — that is what the stats mean; stats-less
    files are included conservatively); the rewrite reads and writes
    only intersecting bytes, preserved range-clustered via
    ``repartitionByRange`` over the same key. Cost is
    O(intersecting files + delta), independent of table size — the
    property that makes daily MERGE affordable on a 100 TB table.
    Data files must carry schema (key, *cols). Returns
    (snapshot_id, n_files_intersecting, n_files_rewritten);
    rewritten ≤ intersecting is pytest-pinned
    (tests/test_catalog_scale.py)."""
    import glob as _glob
    import shutil as _shutil

    manifest = _visible_stats(spark.read.parquet(manifest_dir), None)
    # preserve every tracked stats column present in the rewritten
    # schema (key, *cols) — appending key-only stats would hide the
    # rewrites from scans probing the other tracked columns
    tracked = tuple(
        sorted(
            r.column_name
            for r in manifest.select("column_name").distinct().collect()
            if r.column_name in {key, *cols}
        )
    ) or (key,)
    per_file = (
        manifest.filter(F.col("column_name") == key)
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            F.sum(
                F.when(F.col("min_val").isNull(), 1).otherwise(0)
            ).alias("n_statless"),
        )
    )
    d = delta.select(key, *cols).localCheckpoint(eager=True)
    # Delta/Iceberg MERGE raises when multiple source rows match one
    # target row; a duplicate delta key here would silently multiply
    # matched base rows through the left join below (row-count inflation
    # written into the rewritten files) — fail fast instead. One tiny
    # agg over the (checkpointed, delta-sized) frame.
    kc = d.agg(
        F.count(key).alias("n"),
        F.countDistinct(key).alias("nd"),
    ).collect()[0]
    if kc.n != kc.nd:
        raise ValueError(
            f"merge_through_manifest: delta has {kc.n - kc.nd} duplicate "
            f"{key!r} rows — MERGE requires at most one source row per "
            "key (dedup the delta first)"
        )
    dkeys = d.select(F.col(key).cast("double").alias("_k")).distinct()
    # broadcast the PER-FILE STATS (metadata-scale: |files| rows, bounded
    # ~10^5 even at 100 TB), never the delta keys — a bulk backfill's
    # key set is data-scale and must stay distributed
    intersecting = sorted(
        r.path
        for r in dkeys.join(
            F.broadcast(per_file),
            (F.col("n_statless") > 0)
            | ((F.col("_k") >= F.col("fmin")) & (F.col("_k") <= F.col("fmax"))),
        )
        .select("path")
        .distinct()
        .collect()
    )
    snap = (
        int(snapshot_id)
        if snapshot_id is not None
        else _claimed_next_snapshot(spark, manifest_dir)
    )
    new_paths: list[str] = []
    n_rewritten = 0
    if intersecting:
        out_dir = os.path.dirname(intersecting[0])
        touched = spark.read.parquet(*intersecting)
        rewritten = (
            touched.alias("b")
            .join(d.alias("u"), F.col(f"b.{key}") == F.col(f"u.{key}"), "left")
            .select(
                F.col(f"b.{key}").alias(key),
                *[
                    F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
                    for c in cols
                ],
            )
        )
        tmp = os.path.join(out_dir, f".merge_{snap}_stage")
        (
            rewritten.repartitionByRange(len(intersecting), key)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
        ):
            dst = os.path.join(out_dir, f"merged-{snap}-{i:05d}.parquet")
            _shutil.move(part, dst)
            new_paths.append(dst)
        _shutil.rmtree(tmp, ignore_errors=True)
        n_rewritten = len(new_paths)
        inserts = d.join(touched.select(key), key, "left_anti")
    else:
        # no file can contain any delta key: the whole delta inserts
        any_path = manifest.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty stats manifest at {manifest_dir}")
        out_dir = os.path.dirname(any_path[0].path)
        inserts = d
    tmp = os.path.join(out_dir, f".merge_{snap}_ins_stage")
    # insert_files=1 suits the common daily-delta ≪ table case; a bulk
    # backfill passes more and each becomes its own range-clustered,
    # independently-pruned manifest row
    ins = (
        inserts.coalesce(1)
        if insert_files <= 1
        else inserts.repartitionByRange(insert_files, key)
    )
    ins.write.mode("overwrite").parquet(tmp)
    # parquet writes a (schema-only) file even for an empty frame; an
    # empty insert file would add a stats-less row the pruner must
    # conservatively open forever — commit only parts that have rows
    for i, part in enumerate(
        sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
    ):
        if spark.read.parquet(part).limit(1).count() > 0:
            ins_path = os.path.join(
                out_dir, f"merged-{snap}-inserts-{i:05d}.parquet"
            )
            _shutil.move(part, ins_path)
            new_paths.append(ins_path)
    _shutil.rmtree(tmp, ignore_errors=True)
    if not new_paths and not intersecting:
        raise ValueError("merge_through_manifest: empty delta — nothing to do")
    # adds + removes land in ONE append (commit_manifest_rows): a
    # concurrent loser re-planning mid-commit must never see the
    # rewritten files alongside the still-untombstoned originals
    frames = []
    if new_paths:
        frames.append(_stats_add_rows(spark, new_paths, tracked, snap))
    if intersecting:
        frames.append(_tombstone_rows(spark, manifest_dir, intersecting, snap))
    verify_claim(manifest_dir, snap)
    commit_manifest_rows(spark, manifest_dir, frames)
    return snap, len(intersecting), n_rewritten


@register(
    "plan_manifest_merge",
    oracle=f"""
        WITH delta_upd AS (
            SELECT o_orderkey,
                   'R' AS o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]} AND {_RG_PRUNE_RANGE[1]}
        ),
        delta_ins AS (
            SELECT o_orderkey + 100000000 AS o_orderkey,
                   'N' AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 997 = 7
        ),
        delta AS (SELECT * FROM delta_upd UNION ALL SELECT * FROM delta_ins),
        base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ),
        merged AS (
            SELECT COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey,
                   COALESCE(d.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                   COALESCE(d.o_totalprice, b.o_totalprice) AS o_totalprice
            FROM base b FULL OUTER JOIN delta d
              ON b.o_orderkey = d.o_orderkey
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM merged
        GROUP BY o_orderstatus
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_manifest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE through the manifest, end to end: orders
    (projected to key/status/price) lands range-clustered across 16
    files with a stats manifest; the daily delta re-prices urgent
    orders in a narrow key band (UPDATE — only the few files whose
    key range covers the band get rewritten) and lands brand-new keys
    far beyond every file's range (INSERT — one new file, zero
    rewrites). ``merge_through_manifest`` commits rewritten + insert
    files and tombstones the originals at ONE snapshot. The query then
    reads the WHOLE table through the manifest: per-status counts and
    cent-exact sums must equal a relational MERGE of the same delta —
    if a non-intersecting file was rewritten or a tombstone missed,
    rows double or vanish and the driver hash catches it. Time travel
    across the merge snapshot (both directions) and rewritten ≤
    intersecting are pytest-pinned in tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "merge_cow_orders")
    mpath = scratch_path(spark, sf_dir, "merge_cow_manifest")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(data_dir, mpath):
        full = load_table(spark, sf_dir, "orders")
        orders = full.select("o_orderkey", "o_orderstatus", "o_totalprice")
        orders.repartitionByRange(16, "o_orderkey").write.mode(
            "overwrite"
        ).parquet(data_dir)
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("o_orderkey",))
        delta = (
            full.filter(
                (F.col("o_orderkey").between(lo, hi))
                & (F.col("o_orderpriority") == "1-URGENT")
            )
            .select(
                "o_orderkey",
                F.lit("R").alias("o_orderstatus"),
                (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            )
            .unionByName(
                orders.filter(F.col("o_orderkey") % 997 == 7).select(
                    (F.col("o_orderkey") + F.lit(100000000)).alias(
                        "o_orderkey"
                    ),
                    F.lit("N").alias("o_orderstatus"),
                    "o_totalprice",
                )
            )
        )
        merge_through_manifest(
            spark, mpath, delta, "o_orderkey", ["o_orderstatus", "o_totalprice"]
        )
        return (
            manifest_pruned_scan(spark, mpath, "o_orderkey", 0, 2**62)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


def compact_equality_deletes(
    spark: SparkSession, manifest_dir: str, column: str
) -> tuple[int, int, int, int]:
    """MATERIALIZE the live equality deletes — the maintenance step
    ``read_with_deletes`` names as what keeps the delete set from
    growing unboundedly (Iceberg's rewrite_data_files +
    rewrite_position_delete_files collapsed into one verb): find the
    data files whose stats range can contain any live delete key (the
    same manifest-side candidacy as ``merge_through_manifest`` — only
    candidate paths are collected), rewrite them WITHOUT the deleted
    rows, and commit add(rewritten) + remove(candidates) + ONE
    'delete_retire' record (min_val = the retired-through snapshot
    ceiling) at a single snapshot. After the commit, current reads
    subtract nothing (the rows are physically gone and the records
    retired); pinned reads between a delete and the compaction still
    subtract via the records; pinned reads below the delete still see
    the rows. Cost is O(candidate files + delete records), independent
    of table size. Returns (snapshot_id, n_candidates, n_rewritten,
    n_deletes_retired)."""
    import glob as _glob
    import shutil as _shutil

    manifest = spark.read.parquet(manifest_dir)
    live = _live_delete_records(manifest, column, None).localCheckpoint(
        eager=True
    )
    n_live = live.count()
    if n_live == 0:
        raise ValueError(
            f"compact_equality_deletes: no live delete records for "
            f"{column} in {manifest_dir}"
        )
    ceiling = live.agg(F.max("snapshot_id")).collect()[0][0]
    dkeys = live.select(F.col("min_val").alias("_k")).distinct()

    visible = _visible_stats(manifest, None)
    # rewritten files must keep the TABLE's full tracked-stats column
    # set, not just the delete column — appending (column,) alone would
    # leave the rewrites invisible to scans probing any other tracked
    # column (manifest_pruned_scan lists a file only via its stats rows)
    tracked = tuple(
        sorted(
            r.column_name
            for r in visible.select("column_name").distinct().collect()
        )
    )
    per_file = (
        visible.filter(F.col("column_name") == column)
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            F.sum(
                F.when(F.col("min_val").isNull(), 1).otherwise(0)
            ).alias("n_statless"),
        )
    )
    # same broadcast orientation as merge_through_manifest: stats side
    # (metadata-scale) broadcasts, the key set stays distributed
    candidates = sorted(
        r.path
        for r in dkeys.join(
            F.broadcast(per_file),
            (F.col("n_statless") > 0)
            | ((F.col("_k") >= F.col("fmin")) & (F.col("_k") <= F.col("fmax"))),
        )
        .select("path")
        .distinct()
        .collect()
    )
    snap = _claimed_next_snapshot(spark, manifest_dir)
    new_paths: list[str] = []
    if candidates:
        out_dir = os.path.dirname(candidates[0])
        touched = spark.read.parquet(*candidates)
        kept = touched.join(
            F.broadcast(dkeys),
            touched[column].cast("double") == dkeys["_k"],
            "left_anti",
        )
        tmp = os.path.join(out_dir, f".delcompact_{snap}_stage")
        kept.repartitionByRange(len(candidates), column).write.mode(
            "overwrite"
        ).parquet(tmp)
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
        ):
            if spark.read.parquet(part).limit(1).count() == 0:
                continue  # a fully-deleted range: no file, no stats row
            dst = os.path.join(
                out_dir, f"delcompact-{snap}-{i:05d}.parquet"
            )
            _shutil.move(part, dst)
            new_paths.append(dst)
        _shutil.rmtree(tmp, ignore_errors=True)
    # add(rewritten) + remove(candidates) + the retire marker commit as
    # ONE append: the retire record in particular must never become
    # visible before the rewrites (reads would stop subtracting while
    # the deleted rows are still on disk)
    frames = []
    if new_paths:
        frames.append(_stats_add_rows(spark, new_paths, tracked, snap))
    if candidates:
        frames.append(_tombstone_rows(spark, manifest_dir, candidates, snap))
    # retire the records THROUGH the ceiling at the same snapshot: a
    # pinned read in (ceiling, snap) still subtracts; at >= snap the
    # live set is empty and reads stop paying for history
    schema = spark.read.parquet(manifest_dir).schema
    fixed = {
        "path": "",
        "file_name": "",
        "column_name": column,
        "min_val": float(int(ceiling)),
        "max_val": float(int(ceiling)),
        "snapshot_id": int(snap),
        "op": "delete_retire",
    }
    row = tuple(fixed.get(f.name) for f in schema)
    frames.append(spark.createDataFrame([row], schema))
    verify_claim(manifest_dir, snap)
    commit_manifest_rows(spark, manifest_dir, frames)
    return snap, len(candidates), len(new_paths), int(n_live)


@register(
    "plan_delete_compaction",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE doc_id NOT IN {_EQ_DELETE_IDS}
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_delete_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete COMPACTION end to end — ``plan_equality_delete``
    is the logical half (records + read-time subtraction); this is the
    physical half that pays off the debt: same scattered-key erasure,
    then ``compact_equality_deletes`` rewrites only the candidate files
    without the deleted rows, tombstones the originals, and retires the
    delete records at one snapshot. The query reads the CURRENT table
    through the plain stats-pruned scan — NO read-time subtraction —
    and must still equal the NOT-IN oracle: if the rewrite missed a
    file the deleted ids reappear, if it dropped extra rows the sums
    shrink; the driver hash catches both. The four time-travel windows
    (below the delete, between delete and compaction, at the
    compaction, after it) and the emptied live-delete set are
    pytest-pinned in tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "delcompact_docs")
    mpath = scratch_path(spark, sf_dir, "delcompact_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            8, "doc_id"
        ).write.mode("overwrite").parquet(data_dir)
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("doc_id",))
        equality_delete(spark, mpath, "doc_id", list(_EQ_DELETE_IDS))
        compact_equality_deletes(spark, mpath, "doc_id")
        return (
            manifest_pruned_scan(spark, mpath, "doc_id", 0, 2**62)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def expire_manifest_history(
    spark: SparkSession, manifest_dir: str, expire_below: int
) -> tuple[int, int]:
    """EXPIRE manifest history below a snapshot floor — Iceberg's
    expire_snapshots / Delta's log retention, the verb that stops the
    manifest growing forever under continuous commits: rows that no
    read at-or-above the floor can ever need are dropped and the
    shrunken manifest is swapped in atomically. Kept: every row at
    snapshot >= floor; 'add' rows of files still visible at the floor
    (no tombstone below it); live equality-delete records; retire
    markers (KB-scale, and their ceilings scope any kept records);
    schema_add declarations (the table's committed schema outlives any
    history expiry).
    Dropped: add+remove pairs both below the floor (files whose whole
    life predates it) and delete records already retired below it. A
    persisted 'expire' marker records the floor; an as-of read BELOW
    it now RAISES (``manifest_pruned_scan``) instead of silently
    reconstructing partial history — the Delta "version not found"
    contract rather than a wrong answer. Time travel at or above the
    floor is bit-identical to pre-expire (pytest-pinned). Cost is one
    read+rewrite of the MANIFEST (metadata-scale), never of data.
    Returns (rows_before, rows_after)."""
    import shutil as _shutil

    e = int(expire_below)
    man = spark.read.parquet(manifest_dir)
    # one agg answers both driver-side questions — separate actions
    # each cost a full (tiny) job under load
    stats = man.agg(
        F.max("snapshot_id").alias("cur_max"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    cur_max, rows_before = stats.cur_max, stats.n_rows
    if cur_max is None or e > cur_max:
        raise ValueError(
            f"expire_below={e} exceeds max snapshot {cur_max} — refusing "
            "to expire the current state"
        )
    old = man.filter(F.col("snapshot_id") < e)
    removed_below = (
        old.filter(F.col("op") == "remove").select("path").distinct()
    )
    keep_old_adds = old.filter(F.col("op") == "add").join(
        removed_below, "path", "left_anti"
    )
    # retire ceilings are PER COLUMN, mirroring _live_delete_records'
    # scoping: a retire marker for column A must never expire column
    # B's still-live delete records (that would silently resurrect
    # B's deleted rows on every post-expire read)
    ceilings = (
        old.filter(F.col("op") == "delete_retire")
        .groupBy("column_name")
        .agg(F.max("min_val").alias("__ceiling"))
    )
    live_old_deletes = (
        old.filter(F.col("op") == "delete_eq")
        .join(F.broadcast(ceilings), "column_name", "left")
        .filter(
            F.col("__ceiling").isNull()
            | (F.col("snapshot_id") > F.col("__ceiling"))
        )
        .drop("__ceiling")
    )
    keep = (
        man.filter(F.col("snapshot_id") >= e)
        .unionByName(keep_old_adds)
        .unionByName(live_old_deletes)
        # schema_add rows are the table's DECLARED SCHEMA — a committed
        # ADD COLUMN must survive any expiry or post-expire reads lose
        # the NULL-backfill (and a re-declaration stops raising)
        .unionByName(
            old.filter(
                F.col("op").isin("delete_retire", "expire", "schema_add")
            )
        )
    )
    schema = man.schema
    marker_fixed = {
        "path": "",
        "file_name": "",
        "column_name": "__expire__",
        "min_val": float(e),
        "max_val": float(e),
        "snapshot_id": int(e),
        "op": "expire",
    }
    marker = spark.createDataFrame(
        [tuple(marker_fixed.get(f.name) for f in schema)], schema
    )
    tmp = manifest_dir + ".expiring"
    _shutil.rmtree(tmp, ignore_errors=True)
    # the marker lands as its own appended file, NOT unioned into the
    # rewrite plan: a LocalRelation branch under the coalesced union
    # measured 4x the whole write (10.5 s vs 2.4 + 0.9 at sf0.1)
    keep.coalesce(1).write.parquet(tmp)
    marker.write.mode("append").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    aside = manifest_dir + ".expired_old"
    _shutil.rmtree(aside, ignore_errors=True)
    _shutil.move(manifest_dir, aside)
    _shutil.move(tmp, manifest_dir)
    # commit tokens SURVIVE the expire swap: an in-flight writer that
    # claimed a snapshot above the committed tip must keep its lease
    # (losing it would let a second writer re-claim the same id — the
    # at-or-below-tip guard only covers committed ids). Tokens at or
    # below the tip, and stale-takeover asides, are pruned here so the
    # token tree does not grow forever.
    old_commits = os.path.join(aside, "_commits")
    if os.path.isdir(old_commits):
        new_commits = os.path.join(manifest_dir, "_commits")
        os.makedirs(new_commits, exist_ok=True)
        for name in os.listdir(old_commits):
            try:
                live = int(name) > int(cur_max)
            except ValueError:
                live = False  # 'N.stale-<uuid>' asides: prune
            if live:
                _shutil.move(
                    os.path.join(old_commits, name),
                    os.path.join(new_commits, name),
                )
    _shutil.rmtree(aside, ignore_errors=True)
    return rows_before, rows_after


def _history_floor(manifest: DataFrame) -> int | None:
    """The expire floor recorded in the manifest (None if history has
    never been expired)."""
    v = (
        manifest.filter(F.col("op") == "expire")
        .agg(F.max("min_val"))
        .collect()[0][0]
    )
    return None if v is None else int(v)


@register(
    "plan_expire_snapshots",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY lang
    """,
    tags=("plan", "layout", "maintenance"),
)
def plan_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-history EXPIRY end to end: documents land fragmented
    with a manifest, the 'en' then 'de' partitions' fragments are
    compacted (two commits), then history below the SECOND commit is
    EXPIRED — the en fragments' whole life (add at snapshot 0,
    tombstone at 1) predates the floor and vanishes from the manifest;
    the de fragments' adds survive because their tombstones sit AT the
    floor. The CURRENT whole-table read through the manifest must
    still equal the raw table exactly (if expiry dropped a
    still-visible file's stats row, a lang vanishes; if it resurrected
    a tombstoned fragment, a lang double-counts — the driver hash
    catches both). Row-count shrinkage, at-floor read equality, and
    the raise-below-floor contract are pytest-pinned in
    tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "expire_docs")
    mpath = scratch_path(spark, sf_dir, "expire_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(4).write.partitionBy(
            "lang"
        ).mode("overwrite").parquet(data_dir)
        all_files = sorted(
            _glob.glob(os.path.join(data_dir, "lang=*", "*.parquet"))
        )
        write_stats_manifest(spark, all_files, mpath, ("doc_id",))
        en_files = [p for p in all_files if "/lang=en/" in p]
        commit_data_compaction(spark, mpath, en_files, ("doc_id",))
        de_files = [p for p in all_files if "/lang=de/" in p]
        _, snap2 = commit_data_compaction(spark, mpath, de_files, ("doc_id",))
        # floor = the second commit: the en fragments' whole life (add at
        # 0, tombstone at 1) predates it and is dropped; the de fragments'
        # adds survive (their tombstones sit AT the floor)
        expire_manifest_history(spark, mpath, snap2)
        visible = manifest_pruned_scan(spark, mpath, "doc_id", 0, 2**62)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def manifest_count_range(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    lo: float,
    hi: float,
    as_of: int | None = None,
) -> tuple[int, int, int]:
    """COUNT(key BETWEEN lo AND hi) answered mostly from METADATA —
    the Iceberg/parquet metadata-only count: row groups whose stats
    range sits WHOLLY inside [lo, hi] contribute their footer row
    counts without touching a data page; only files owning a
    PARTIALLY-overlapping row group are opened (the parquet reader
    then re-prunes non-overlapping row groups inside them from the
    same footer stats). On a 100 TB range-clustered table a count
    query reads two boundary files instead of the table. Stats-less
    row groups are conservatively counted by scan. Returns
    (n_total, n_from_metadata, n_files_scanned)."""
    manifest = _visible_stats(spark.read.parquet(manifest_dir), as_of).filter(
        F.col("column_name") == column
    )
    rg = manifest.select(
        "path",
        "row_group",
        "n_rows",
        "min_val",
        "max_val",
        F.when(
            F.col("min_val").isNull(), F.lit("statless")
        )
        .when(
            (F.col("min_val") >= lo) & (F.col("max_val") <= hi),
            F.lit("inside"),
        )
        .when(
            (F.col("max_val") >= lo) & (F.col("min_val") <= hi),
            F.lit("partial"),
        )
        .otherwise(F.lit("outside"))
        .alias("cls"),
    )
    agg = rg.groupBy().pivot(
        "cls", ["inside", "partial", "statless", "outside"]
    ).sum("n_rows").collect()[0]
    n_meta = int(agg["inside"] or 0)
    scan_paths = sorted(
        r.path
        for r in rg.filter(F.col("cls").isin("partial", "statless"))
        .select("path")
        .distinct()
        .collect()
    )
    n_scanned = 0
    if scan_paths:
        # exclude the wholly-inside row groups of scanned files: count
        # only rows in the range but NOT in an inside-rowgroup... a row
        # group is the unit, so instead count the file's in-range rows
        # and subtract its inside-rowgroup metadata counts (already in
        # n_meta) — equivalent and expressible without rowgroup access
        per_file_inside = {
            r.path: r.m
            for r in rg.filter(
                (F.col("cls") == "inside") & F.col("path").isin(scan_paths)
            )
            .groupBy("path")
            .agg(F.sum("n_rows").alias("m"))
            .collect()
        }
        in_range = (
            spark.read.parquet(*scan_paths)
            .filter(F.col(column).between(lo, hi))
            .groupBy(_decode_input_file().alias("path"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # input_file_name() returns a percent-encoded URI; a data dir
        # containing spaces/%-chars would miss the manifest path map and
        # double-count inside-rowgroups — decode, and refuse to return a
        # silently-wrong count if any scanned path still fails to resolve
        known = set(scan_paths)
        for r in in_range:
            if r.path not in known:
                raise ValueError(
                    f"manifest_count_range: scanned file {r.path!r} did "
                    "not resolve to a manifest path — count would be wrong"
                )
            n_scanned += int(r.n) - int(per_file_inside.get(r.path, 0))
    return n_meta + n_scanned, n_meta, len(scan_paths)


@register(
    "scan_manifest_count_only",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]}
                                  AND {_RG_PRUNE_RANGE[1]}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
        FROM orders
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_count_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only counting through the manifest: land orders
    range-clustered, then answer both COUNT(*) (every row group wholly
    inside an unbounded range — zero data pages) and a band count
    (interior row groups from metadata, the two boundary files scanned
    with the residual predicate). The oracle recomputes both counts
    from the raw table; metadata-dominance (n_from_metadata > 0,
    files-scanned < files-total) is pytest-pinned in
    tests/test_catalog_scale.py. This is why a governed 100 TB table
    answers its row count without an exabyte of I/O."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "countonly_orders")
    mpath = scratch_path(spark, sf_dir, "countonly_manifest")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        rangekey_write(spark, sf_dir, path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("o_orderkey",))
        total, _, _ = manifest_count_range(
            spark, mpath, "o_orderkey", float("-inf"), float("inf")
        )
        band, _, _ = manifest_count_range(spark, mpath, "o_orderkey", lo, hi)
        return spark.createDataFrame(
            [(int(total), int(band))], "n_orders long, n_in_band long"
        )


def optimize_table(
    spark: SparkSession,
    manifest_dir: str,
    target_bytes: int,
    partition_by: tuple[str, ...] = (),
) -> tuple[int, int, int]:
    """OPTIMIZE — the composed small-file maintenance verb (Delta
    OPTIMIZE / Iceberg rewrite_data_files): bin-pack the table's
    VISIBLE files to the target size with the same streaming first-fit
    rule as ``plan_compaction_bins`` (exclusive running sum over name
    order — stable across reruns, a bin overflows by at most one
    file), then commit every multi-file bin through
    ``commit_data_compaction`` — add(compacted) + remove(fragments) at
    one snapshot per bin, so readers pinned below an OPTIMIZE still
    see the fragments and current readers never see both.

    Partition identity is preserved: files are binned WITHIN their
    directory (the Hive partition dir — a cross-partition bin would
    merge rows whose partition value lives only in the path and write
    the result into ONE partition's dir, silently corrupting every
    partition-filtered scan), and the compacted files' stats rows
    re-record the partition values when ``partition_by`` names them.
    The compacted stats carry the manifest's FULL tracked column set,
    derived like ``merge_through_manifest``'s — a key-only append
    would hide compacted files from scans probing other columns.
    Sizes come from driver-side stat of the visible path list
    (metadata-scale). Returns (n_bins_compacted, n_files_before,
    n_files_after)."""
    import itertools as _it

    visible = sorted(
        r.path
        for r in _visible_stats(spark.read.parquet(manifest_dir), None)
        .select("path")
        .distinct()
        .collect()
    )
    n_before = len(visible)
    bins: list[list[str]] = []
    for _dirname, group_iter in _it.groupby(visible, key=os.path.dirname):
        acc = 0
        first_in_dir = True
        for path in group_iter:
            size = os.path.getsize(path)
            if first_in_dir or acc >= target_bytes:
                bins.append([])
                acc = 0
                first_in_dir = False
            bins[-1].append(path)
            acc += size
    compacted = 0
    for group in bins:
        if len(group) > 1:
            commit_data_compaction(
                spark,
                manifest_dir,
                group,
                partition_by=partition_by,
            )
            compacted += 1
    n_after = n_before - sum(len(g) - 1 for g in bins if len(g) > 1)
    return compacted, n_before, n_after


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(CASE WHEN source = 'REPLACED' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_replaced
        FROM (
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE lang <> 'en'
            UNION ALL
            SELECT doc_id, lang, 'REPLACED' AS source, n_chars + 1
            FROM documents WHERE lang = 'en'
        )
        GROUP BY lang
    """,
    tags=("sink", "layout"),
)
def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition overwrite — the daily partition-replace idiom
    (``INSERT OVERWRITE ... PARTITION`` with dynamic resolution): the
    full table lands Hive-partitioned by lang, then a corrected batch
    containing ONLY en rows overwrites in
    ``partitionOverwriteMode=dynamic`` — Spark replaces exactly the
    partitions PRESENT IN THE BATCH and leaves every other partition's
    files untouched (static mode would wipe the whole table first: the
    classic data-loss foot-gun this mode exists to fix). The read-back
    must show non-en partitions byte-identical and the en partition
    fully replaced (marked source + shifted n_chars) — which is exactly
    what the oracle reconstructs. The conf is set per-write via
    ``option("partitionOverwriteMode", "dynamic")``, not session-wide.
    Seed: the reference re-uploads one day's prefix wholesale
    (``/root/reference/app.py:449-488``) — dynamic overwrite is that
    verb done transactionally per partition."""
    prepare(spark)
    sink = _sink_path("sink_dyn_overwrite", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    (
        docs.repartition(2)
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(sink)
    )
    corrected = docs.filter(F.col("lang") == "en").select(
        "doc_id",
        "lang",
        F.lit("REPLACED").alias("source"),
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    (
        corrected.repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(sink)
    )
    back = spark.read.parquet(sink)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(
            F.when(F.col("source") == "REPLACED", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_replaced"),
    )
