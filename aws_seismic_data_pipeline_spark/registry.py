"""Query registry: one named entry per implemented operator.

Driver contract (``__spark_entry__.py``): ``queries()`` maps name →
``(spark, sf_dir) -> DataFrame`` and ``oracle_sql()`` maps the same name
→ ANSI SQL DuckDB runs on the same parquet tables. Operators whose
semantics are not SQL-expressible (stateful streaming, LSH with library
hashes) register with ``oracle=None`` and get a rows-only check.

Every computed column must be aliased identically in both the Spark plan
and the oracle SQL — the driver's value-hash sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: add a builder (and its oracle SQL) to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries; return the registry."""
    from aws_seismic_data_pipeline_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        joins,
        relational,
        reshape,
        setops,
        window_ops,
    )
    from aws_seismic_data_pipeline_spark.functions import scalar, udfs  # noqa: F401
    from aws_seismic_data_pipeline_spark.plans import ingest, migrate  # noqa: F401
    from aws_seismic_data_pipeline_spark.streaming import batch_windows, jobs  # noqa: F401
    from aws_seismic_data_pipeline_spark.llm import (  # noqa: F401
        dedup,
        similarity,
        simhash,
        text,
    )
    from aws_seismic_data_pipeline_spark.multimodal import media  # noqa: F401
    from aws_seismic_data_pipeline_spark.sources import (  # noqa: F401
        datasource,
        http_fetch,
        readers,
    )

    return REGISTRY
