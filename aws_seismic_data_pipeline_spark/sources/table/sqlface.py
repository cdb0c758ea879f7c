"""SQL face for the governed table (round-13 verdict item 6): current,
``VERSION AS OF`` and ``TIMESTAMP AS OF`` reads plus DESCRIBE HISTORY,
all reachable through ``spark.sql`` text instead of the Python facade.

Spark has no syntax hook for custom ``AS OF`` clauses on temp views, so
the face follows the pattern every lakehouse exposes to SQL-only
clients (Delta's ``table@v2`` path aliases, BigQuery's ``FOR
SYSTEM_TIME AS OF`` resolved at plan time): the version pin is resolved
to a snapshot FIRST, the pinned visible world registers as a view, and
the user's SQL — with ``:named`` parameter binding, the
``sql_parameterized`` machinery (``operators/relational.py``) — runs
against it. The view wraps the SAME manifest-pruned, delete-subtracted
scan the facade returns: stats pruning, partition pruning, and delete
subtraction all survive the SQL route because the view IS that plan,
not a copy of its output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table, prepare
from aws_seismic_data_pipeline_spark.registry import register


def governed_sql(
    spark: SparkSession,
    table,
    text: str,
    args: dict | None = None,
    name: str = "governed",
    versions: dict[str, int] | None = None,
    timestamps: dict[str, float] | None = None,
) -> DataFrame:
    """Run SQL ``text`` against a :class:`..facade.GovernedTable`:

    - ``<name>`` — the CURRENT visible world (scan minus live deletes)
    - ``<name>_history`` — DESCRIBE HISTORY (one row per snapshot)
    - one extra view per ``versions`` entry (``{suffix: snapshot}`` →
      ``<name>_<suffix>`` pinned VERSION AS OF that snapshot) and per
      ``timestamps`` entry (epoch seconds, resolved through
      ``snapshot_for_timestamp`` — TIMESTAMP AS OF semantics)
    - ``args`` bind as ``:named`` parameters (injection-safe, bound
      before optimization so they still push down)

    Each view is the facade's own lazy plan — registering costs no
    scan; only what the SQL touches executes."""
    table.scan_with_deletes().createOrReplaceTempView(name)
    table.history().createOrReplaceTempView(f"{name}_history")
    for suffix, snap in (versions or {}).items():
        table.scan_with_deletes(as_of=int(snap)).createOrReplaceTempView(
            f"{name}_{suffix}"
        )
    for suffix, ts in (timestamps or {}).items():
        table.scan_with_deletes(
            as_of=table.snapshot_at(float(ts))
        ).createOrReplaceTempView(f"{name}_{suffix}")
    return spark.sql(text, args=args or {})


@register(
    "sql_governed_time_travel",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang, n_chars FROM documents
        ),
        appended AS (
            SELECT doc_id + 700000 AS doc_id, lang, n_chars
            FROM base WHERE doc_id % 13 = 0
        )
        SELECT 'v0' AS world, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM base GROUP BY lang
        UNION ALL
        SELECT 'ts1', lang,
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_chars) AS BIGINT)
        FROM (SELECT * FROM base UNION ALL SELECT * FROM appended)
        GROUP BY lang
        UNION ALL
        SELECT 'current', lang,
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_chars) AS BIGINT)
        FROM (
            SELECT * FROM base WHERE doc_id % 11 <> 0
            UNION ALL SELECT * FROM appended
        )
        GROUP BY lang
        UNION ALL
        SELECT 'history', 'snapshots',
               CAST(3 AS BIGINT), CAST(3 AS BIGINT)
    """,
    tags=("sql", "plan", "maintenance"),
)
def sql_governed_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governed table's full time axis through ONE piece of SQL
    TEXT: documents land governed (snapshot 0), an append lands
    (snapshot 1), an equality delete erases doc_id%11 (snapshot 2);
    the SQL then reads VERSION AS OF 0 (``t_v0``), TIMESTAMP AS OF the
    append's committed wall clock (``t_ts1`` — resolved through the
    commit_ts markers, the ``plan_time_travel_timestamp`` machinery),
    the CURRENT world (``t``), and DESCRIBE HISTORY (``t_history``),
    with a :named parameter bound through the ``sql_parameterized``
    machinery. The oracle
    recomputes all four worlds raw, so the driver hash pins that the
    SQL route returns byte-identical results to the facade path —
    pre-append at v0, pre-delete at ts1, post-delete current, 3
    history rows. Closes the last query-surface gap: time travel,
    history, and deletes were Python-facade-only."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )
    from aws_seismic_data_pipeline_spark.sources.table.facade import (
        GovernedTable,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "sqlface_data")
    mpath = scratch_path(spark, sf_dir, "sqlface_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        t = GovernedTable.create(
            spark, docs, data_dir, mpath, "doc_id", n_files=4
        )
        extra = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(700000)
        )
        stage = os.path.join(data_dir, ".append_stage")
        extra.coalesce(1).write.mode("overwrite").parquet(stage)
        part = sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))[0]
        new_path = os.path.join(data_dir, "appended-00000.parquet")
        os.replace(part, new_path)
        snap1 = t.append([new_path])
        del_keys = [
            r.doc_id
            for r in docs.filter(F.col("doc_id") % 11 == 0)
            .select("doc_id")
            .collect()
        ]
        t.delete_keys(del_keys)
        # the append commit's wall clock, off the history view — the
        # timestamp a SQL client would pass to TIMESTAMP AS OF
        ts1 = (
            t.history()
            .filter(F.col("snapshot_id") == snap1)
            .select("commit_ts")
            .collect()[0][0]
        )
        return governed_sql(
            spark,
            t,
            """
            SELECT 'v0' AS world, lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM t_v0 GROUP BY lang
            HAVING COUNT(*) >= :min_docs
            UNION ALL
            SELECT 'ts1', lang, COUNT(*),
                   CAST(SUM(n_chars) AS BIGINT)
            FROM t_ts1 GROUP BY lang
            UNION ALL
            SELECT 'current', lang, COUNT(*),
                   CAST(SUM(n_chars) AS BIGINT)
            FROM t GROUP BY lang
            UNION ALL
            SELECT 'history', 'snapshots', COUNT(*),
                   CAST(SUM(snapshot_id) AS BIGINT)
            FROM t_history
            """,
            args={"min_docs": 1},
            name="t",
            versions={"v0": 0},
            timestamps={"ts1": float(ts1)},
        ).localCheckpoint(eager=True)
