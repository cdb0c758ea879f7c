"""Scalar function surface (SURVEY.md §2B fn_*).

Seeds: SEED-id/URL string construction (``/root/reference/
app.py:174-211``), filename field re-extraction by split/substr
(``app.py:328-330``, ``app.py:451-456``), date window derivation
(``app.py:560-565``), buffer clamp via max/min (``app.py:373-380``),
endpoint map lookup (``config.json:16-18`` via ``app.py:239-244``),
JSON status parsing (``app.py:40-76``), error routing conditionals
(``app.py:306-313``).

All JVM-side built-ins — no Python UDFs — so the whole projection stays
inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "fn_string",
    oracle="""
        SELECT
            s_suppkey,
            CONCAT(s_name, '.', CAST(s_nationkey AS VARCHAR)) AS seed_id,
            UPPER(s_name) AS uname,
            SUBSTRING(s_name, 1, 8) AS prefix8,
            string_split(s_name, '#')[1] AS name_head,
            string_split(s_name, '#')[-1] AS name_tail,
            CAST(LENGTH(s_name) AS BIGINT) AS name_len,
            REPLACE(s_name, 'Supplier', 'SUP') AS renamed,
            LPAD(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded_key,
            regexp_extract(s_name, '([0-9]+)', 1) AS digits
        FROM supplier
    """,
    tags=("fn",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel: concat / case / substring / split / replace / pad /
    regexp_extract (seeds R7, R9, R16 — the reference builds
    ``NET.STA.LOC.CHAN`` ids then re-parses them with split('.'))."""
    sup = load_table(spark, sf_dir, "supplier")
    parts = F.split(F.col("s_name"), "#")
    return sup.select(
        "s_suppkey",
        F.concat_ws(".", F.col("s_name"), F.col("s_nationkey").cast("string")).alias(
            "seed_id"
        ),
        F.upper("s_name").alias("uname"),
        F.substring("s_name", 1, 8).alias("prefix8"),
        F.element_at(parts, 1).alias("name_head"),
        F.element_at(parts, -1).alias("name_tail"),
        F.length("s_name").cast("long").alias("name_len"),
        F.regexp_replace("s_name", "Supplier", "SUP").alias("renamed"),
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("s_name", r"([0-9]+)", 1).alias("digits"),
    )


@register(
    "fn_date",
    oracle="""
        SELECT
            o_orderkey,
            CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS order_day,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
            strftime(o_orderdate, '%Y%m%d') AS day_key,
            CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
            CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
            o_orderdate + INTERVAL 90 DAY AS due_ts,
            CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                AS days_since_epoch_start
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
    tags=("fn",),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kernel (seeds R3/R4/R6/R9): truncation, formatting
    (the reference's ``YYYYMMDD`` S3 prefixes, app.py:454-456),
    extraction, interval arithmetic, day diffs."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1996-01-01"))
    )
    return orders.select(
        "o_orderkey",
        F.date_trunc("day", "o_orderdate").cast("timestamp_ntz").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("day_key"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_ts"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "fn_math",
    oracle="""
        SELECT
            l_orderkey, l_linenumber,
            ROUND(l_extendedprice, 1) AS price_r1,
            ABS(l_discount - 0.05) AS disc_dev,
            GREATEST(l_quantity, 25.0) AS qty_floor25,
            LEAST(l_quantity, 25.0) AS qty_cap25,
            CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
            CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod7,
            ROUND(POWER(l_discount, 2.0), 6) AS disc_sq,
            ROUND(SQRT(l_extendedprice), 4) AS price_sqrt
        FROM lineitem
        WHERE l_linenumber = 1
    """,
    tags=("fn",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel (seed R5: greatest/least buffer clamp at
    app.py:375-376)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_floor25"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_cap25"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_bucket"),
        (F.col("l_quantity").cast("long") % 7).cast("long").alias("qty_mod7"),
        F.round(F.pow("l_discount", F.lit(2.0)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
    )


@register(
    "fn_array",
    oracle="""
        SELECT
            doc_id,
            CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
            array_to_string(string_split(text, ' ')[1:5], ' ') AS head5_csv,
            CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN)
                AS mentions_spark,
            list_sort(string_split(text, ' '))[1] AS first_token_alpha
        FROM documents
    """,
    tags=("fn",),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel (seed R4/R16): split/size/slice/contains/sort.

    The slice is re-joined to a string on output — the driver's value
    hasher cannot hash list cells, so the registered surface is
    scalar-only (array ops stay in-plan)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.concat_ws(" ", F.slice(toks, 1, 5)).alias("head5_csv"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.element_at(F.sort_array(toks), 1).alias("first_token_alpha"),
    )


@register(
    "fn_map",
    oracle="""
        SELECT
            n_nationkey, n_name,
            CASE n_regionkey
                WHEN 0 THEN 'africa.endpoint:8080'
                WHEN 1 THEN 'america.endpoint:8080'
                WHEN 2 THEN 'asia.endpoint:8080'
                WHEN 3 THEN 'europe.endpoint:8080'
                WHEN 4 THEN 'mideast.endpoint:8080'
            END AS endpoint,
            CASE WHEN n_regionkey IN (0, 1, 2, 3, 4) THEN TRUE ELSE FALSE END
                AS has_endpoint
        FROM nation
    """,
    tags=("fn",),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-literal lookup (seed R8: ``zerotier_ips[station]`` endpoint
    map, config.json:16-18). The map is a broadcast-style literal; the
    oracle expresses the same lookup as CASE."""
    nation = load_table(spark, sf_dir, "nation")
    pairs: list = []
    for k, v in [
        (0, "africa.endpoint:8080"),
        (1, "america.endpoint:8080"),
        (2, "asia.endpoint:8080"),
        (3, "europe.endpoint:8080"),
        (4, "mideast.endpoint:8080"),
    ]:
        pairs += [F.lit(k), F.lit(v)]
    endpoint_map = F.create_map(*pairs)
    return nation.select(
        "n_nationkey",
        "n_name",
        F.element_at(endpoint_map, F.col("n_regionkey")).alias("endpoint"),
        F.element_at(endpoint_map, F.col("n_regionkey")).isNotNull().alias(
            "has_endpoint"
        ),
    )


@register(
    "fn_json",
    oracle="""
        SELECT
            event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
            CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                 THEN 'high' ELSE 'low' END AS k_band
        FROM events
        WHERE event_type = 'view'
    """,
    tags=("fn",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (seed R30: zerotier-cli JSON status parse,
    app.py:40-76)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "fn_conditional",
    oracle="""
        SELECT
            c_custkey,
            CASE
                WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium'
            END AS tier,
            COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_alias,
            CASE WHEN c_acctbal <> 0.0
                 THEN ROUND(1000.0 / c_acctbal, 6) END AS inv_bal
        FROM customer
    """,
    tags=("fn",),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional kernel (seed R15 error routing): CASE/when,
    coalesce+nullif, null-on-bad-input division (try_* semantics)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_alias"
        ),
        F.when(
            F.col("c_acctbal") != 0.0, F.round(1000.0 / F.col("c_acctbal"), 6)
        ).alias("inv_bal"),
    )


@register(
    "fn_bitwise",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor,
               l_orderkey & 255 AS key_band,
               l_orderkey << 2 AS key_shl,
               CAST(bit_count(l_orderkey) AS INTEGER) AS key_bits
        FROM lineitem
        WHERE l_orderkey % 32 = 0
    """,
    tags=("fn",),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise kernel: xor/and/shift/popcount on 64-bit keys — the
    primitive layer under the engine's own simhash banding and salted
    keys (llm/simhash.py uses exactly these ops; here they're exposed
    as a queryable surface). All JVM-side codegen, no UDF."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 32 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey ^ CAST(l_linenumber AS BIGINT)").alias("key_xor"),
        F.expr("l_orderkey & CAST(255 AS BIGINT)").alias("key_band"),
        F.expr("shiftleft(l_orderkey, 2)").alias("key_shl"),
        F.bit_count("l_orderkey").alias("key_bits"),
    )


@register(
    "fn_hash",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               md5(CONCAT(lang, ':', source)) AS bucket_key
        FROM documents
    """,
    tags=("fn", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash kernel: md5/sha256 hex digests (the substrate
    under exact dedup llm/dedup.py and the engine-portable simhash
    llm/simhash.py — here exposed directly). Both engines emit lowercase
    hex over UTF-8 bytes, so digests are comparable verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.md5(F.concat_ws(":", "lang", "source").cast("binary")).alias("bucket_key"),
    )


@register(
    "fn_higher_order",
    oracle="""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               array_to_string(
                   list_transform(list_filter(toks, x -> len(x) > 4),
                                  x -> upper(x)), ' ') AS long_upper_csv,
               CAST(len(list_filter(toks, x -> len(x) > 4)) AS INTEGER) AS n_long,
               CAST(list_reduce(list_transform(toks, x -> len(x)), (a, x) -> a + x)
                   AS BIGINT) AS char_sum
        FROM tok
    """,
    tags=("fn", "higher_order"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas: transform/filter/aggregate composed
    on a pre-split token array (split ONCE — re-splitting inside a
    lambda is O(n²) per row; see llm/text.py).

    These run interpreted (~6M ops/row-element/s), fine for metadata
    arrays; bulk numeric kernels (dot products, bit folds) belong in
    Arrow+numpy ``mapInPandas`` instead (llm/vector.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.filter(toks, lambda x: F.length(x) > 4), lambda x: F.upper(x)
            ),
        ).alias("long_upper_csv"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("char_sum"),
    )


@register(
    "fn_url_extract",
    oracle="""
        WITH urls AS (
            SELECT s_suppkey,
                   'http://10.144.0.' || CAST(s_suppkey % 250 AS VARCHAR)
                       || ':8080/data?channel=' || s_name
                       || '&from=1704067200&to=1704070800' AS url
            FROM supplier
        )
        SELECT s_suppkey, url,
               regexp_extract(url, 'http://([^:/]+)', 1) AS host,
               CAST(regexp_extract(url, ':(\\d+)/', 1) AS INTEGER) AS port,
               regexp_extract(url, '[?&]channel=([^&]*)', 1) AS channel,
               CAST(regexp_extract(url, '[?&]from=(\\d+)', 1) AS BIGINT) AS from_epoch
        FROM urls
    """,
    tags=("fn", "string"),
)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL build + parse round trip (seed R7: ``form_request``
    app.py:174-211 builds exactly this shape; R16 recovers fields by
    string surgery). Built with concat, recovered with
    ``regexp_extract`` — identical function name and group semantics in
    both engines, all JVM-side codegen."""
    supp = load_table(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("http://10.144.0."),
        (F.col("s_suppkey") % 250).cast("string"),
        F.lit(":8080/data?channel="),
        F.col("s_name"),
        F.lit("&from=1704067200&to=1704070800"),
    )
    urls = supp.select("s_suppkey", url.alias("url"))
    return urls.select(
        "s_suppkey",
        "url",
        F.regexp_extract("url", r"http://([^:/]+)", 1).alias("host"),
        F.regexp_extract("url", r":(\d+)/", 1).cast("int").alias("port"),
        F.regexp_extract("url", r"[?&]channel=([^&]*)", 1).alias("channel"),
        F.regexp_extract("url", r"[?&]from=(\d+)", 1).cast("bigint").alias(
            "from_epoch"
        ),
    )


@register(
    "fn_try_cast",
    oracle="""
        WITH raw AS (
            SELECT p_partkey,
                   CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR)
                        ELSE p_brand END AS maybe_num,
                   CASE WHEN p_partkey % 2 = 0
                        THEN '2024-01-' || lpad(CAST(p_partkey % 28 + 1 AS VARCHAR), 2, '0')
                        ELSE p_type END AS maybe_date
            FROM part
        )
        SELECT p_partkey,
               TRY_CAST(maybe_num AS INTEGER) AS parsed_num,
               TRY_CAST(maybe_date AS DATE) AS parsed_date,
               CAST(TRY_CAST(maybe_num AS INTEGER) IS NOT NULL AS BOOLEAN) AS num_ok
        FROM raw
    """,
    tags=("fn", "cast"),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe parsing (seed R15: the reference routes fetch errors
    to a dead-letter channel instead of failing the run; ``try_cast``
    is the same null-on-error contract for scalar coercion). Malformed
    strings — brand names where numbers should be, type names where
    dates should be — parse to NULL, never an exception, so one bad
    row can't kill a 100 TB job. ANSI mode stays ON for real errors;
    try_* marks the columns where tolerance is intended."""
    part = load_table(spark, sf_dir, "part")
    raw = part.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 3 == 0, F.col("p_size").cast("string")
        ).otherwise(F.col("p_brand")).alias("maybe_num"),
        F.when(
            F.col("p_partkey") % 2 == 0,
            F.concat(
                F.lit("2024-01-"),
                F.lpad(((F.col("p_partkey") % 28) + 1).cast("string"), 2, "0"),
            ),
        ).otherwise(F.col("p_type")).alias("maybe_date"),
    )
    return raw.select(
        "p_partkey",
        F.col("maybe_num").try_cast("int").alias("parsed_num"),
        F.col("maybe_date").try_cast("date").alias("parsed_date"),
        F.col("maybe_num").try_cast("int").isNotNull().alias("num_ok"),
    )


@register(
    "fn_struct",
    oracle="""
        WITH packed AS (
            SELECT o_orderkey,
                   {'status': o_orderstatus,
                    'priority': o_orderpriority,
                    'total': o_totalprice} AS order_info
            FROM orders
        )
        SELECT o_orderkey,
               order_info.status AS info_status,
               order_info.total AS info_total,
               CAST(order_info.priority LIKE '1%' AS BOOLEAN) AS is_urgent
        FROM packed
    """,
    tags=("fn", "struct"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct kernel: pack columns into a named struct, access fields,
    compute on them (the typed form of the reference's positional
    request tuples, app.py:236/573-575 — fields by NAME, never by
    split-index). Output is flattened back to scalars so the
    cross-engine value hash compares primitive cells."""
    orders = load_table(spark, sf_dir, "orders")
    packed = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("total"),
        ).alias("order_info"),
    )
    return packed.select(
        "o_orderkey",
        F.col("order_info.status").alias("info_status"),
        F.col("order_info.total").alias("info_total"),
        F.col("order_info.priority").startswith("1").alias("is_urgent"),
    )


@register(
    "fn_math_advanced",
    oracle="""
        SELECT o_orderkey,
               sqrt(o_totalprice) AS price_sqrt,
               ROUND(ln(o_totalprice), 6) AS price_ln,
               ROUND(log10(o_totalprice), 6) AS price_log10,
               ROUND(power(o_totalprice, 0.25), 6) AS price_4th_root
        FROM orders
        WHERE o_totalprice > 0.0
    """,
    tags=("fn", "math"),
)
def fn_math_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental math kernel. sqrt is IEEE-754 correctly rounded —
    bit-identical across engines, left raw. ln/log10/power are libm
    functions whose last ULP may differ between the JVM and C
    implementations, so they round at 6dp (results are irrational, so
    no decimal-halfway hazard)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0.0)
    return orders.select(
        "o_orderkey",
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 6).alias("price_log10"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_4th_root"),
    )


@register(
    "fn_datetime_extract",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
               CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
               CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS d,
               CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS doy,
               CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_dow,
               CAST(EXTRACT(week FROM o_orderdate) AS INTEGER) AS iso_week,
               CAST(EXTRACT(epoch FROM o_orderdate) AS BIGINT) AS epoch_s
        FROM orders
        WHERE o_orderkey < 500
    """,
    tags=("fn", "date"),
)
def fn_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime field extraction across the convention minefield:
    day-of-week numbering differs per engine (Spark ``dayofweek`` is
    1=Sunday; DuckDB ``dow`` is 0=Sunday, ``isodow`` 1=Monday), so the
    engine normalizes to ISO-8601 (1=Monday..7=Sunday) — the only
    convention with an unambiguous spec — via ``(dayofweek+5)%7+1``.
    ``weekofyear`` is ISO in both engines. All JVM built-ins, one
    map-side pass, predicate pushed to the scan."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofyear("o_orderdate").alias("doy"),
        ((F.dayofweek("o_orderdate") + 5) % 7 + 1).alias("iso_dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
    )


@register(
    "fn_variant",
    oracle="""
        -- v_schema is DERIVED per row from json_type rather than pinned
        -- to a constant: if a fixture row's props.k ever stops being an
        -- integer, the oracle moves with it (BIGINT/STRING/BOOLEAN map
        -- to Spark's schema_of_variant names; anything else yields a
        -- sentinel that mismatches loudly instead of silently agreeing)
        SELECT
            event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
            CASE
                WHEN json_type(props, '$.k') IS NULL THEN 'OBJECT<>'
                WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                    THEN 'OBJECT<k: BIGINT>'
                WHEN json_type(props, '$.k') = 'VARCHAR'
                    THEN 'OBJECT<k: STRING>'
                WHEN json_type(props, '$.k') = 'BOOLEAN'
                    THEN 'OBJECT<k: BOOLEAN>'
                ELSE 'OBJECT<k: UNMAPPED_' || json_type(props, '$.k') || '>'
            END AS v_schema,
            CAST(json_extract_string(props, '$.missing') AS BIGINT)
                AS missing_field
        FROM events
        WHERE event_type = 'purchase'
    """,
    tags=("fn",),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    decodes the props JSON string ONCE into the binary variant
    encoding, then typed ``variant_get`` extractions and
    ``schema_of_variant`` introspection run against that — the
    engine-native replacement for re-parsing a JSON string per
    extraction (``fn_json``'s ``get_json_object`` re-tokenizes the
    text for every path; at 100 TB with many extracted fields the
    variant decode amortizes to one parse per row). Missing paths
    return NULL (``try``-semantics), pinned by the third column."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.schema_of_variant(v).alias("v_schema"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_field"),
    )


@register(
    "fn_collation",
    oracle="""
        WITH u AS (SELECT n_nationkey, upper(n_name) AS uname FROM nation),
             l AS (SELECT n_nationkey, lower(n_name) AS lname FROM nation)
        SELECT u.n_nationkey, u.uname, l.lname,
               CAST(1 AS BOOLEAN) AS ci_equal
        FROM u JOIN l
          ON u.n_nationkey = l.n_nationkey
         AND lower(u.uname) = lower(l.lname)
    """,
    tags=("fn", "string"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware comparison (Spark 4 collated strings): two
    copies of the nation dimension whose names differ only in case
    join successfully when the key is collated UTF8_LCASE — equality,
    grouping, and sort order all follow the collation instead of raw
    bytes, the engine-native answer to the upper()/lower() wrappers
    ad-hoc pipelines scatter around (which defeat pushdown and
    dictionary reuse; a collated column keeps both). The oracle
    expresses the same join with explicit lower() normalization, so
    the driver hash-checks that the collation's equality relation is
    exactly case-insensitivity; the ci_equal column re-asserts it
    row-wise via collated comparison. Seed: R8's channel/station code
    matching (``/root/reference/app.py:328-368``) — real feeds mix
    case conventions."""
    nation = load_table(spark, sf_dir, "nation")
    u = nation.select(
        "n_nationkey", F.upper("n_name").alias("uname")
    )
    lo = nation.select(
        F.col("n_nationkey").alias("l_key"), F.lower("n_name").alias("lname")
    )
    joined = u.join(
        lo,
        (F.col("n_nationkey") == F.col("l_key"))
        & (
            F.expr("collate(uname, 'UTF8_LCASE')")
            == F.expr("collate(lname, 'UTF8_LCASE')")
        ),
    )
    return joined.select(
        "n_nationkey",
        "uname",
        "lname",
        (
            F.expr("collate(uname, 'UTF8_LCASE')")
            == F.expr("collate(lname, 'UTF8_LCASE')")
        ).alias("ci_equal"),
    )
