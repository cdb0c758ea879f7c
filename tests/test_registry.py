"""Registry contract tests: rotation order and driver-safe output schemas.

The driver verifies queries in registration order with a bounded per-round
budget, and its pandas-based value hasher cannot handle complex-typed cells
(CORRECTNESS_r01: ``TypeError: unhashable type: 'list'``). These tests pin
both contracts: (a) load_all() front-loads unverified queries, (b) no
registered query's output schema contains ArrayType/MapType/StructType.
"""

from __future__ import annotations

import pytest

from aws_seismic_data_pipeline_spark.registry import (
    QuerySpec,
    _rotated,
    load_all,
)


def _spec(name: str) -> QuerySpec:
    return QuerySpec(name=name, builder=lambda spark, sf: None)


def test_rotation_orders_red_then_unchecked_then_green(monkeypatch):
    import aws_seismic_data_pipeline_spark.registry as reg

    history = {
        "green_a": (1, 1),
        "red_b": (2, 0),
        "green_c": (2, 2),
    }
    monkeypatch.setattr(reg, "_check_history", lambda: history)
    registry = {n: _spec(n) for n in ["green_a", "new_x", "red_b", "green_c", "new_y"]}
    ordered = list(_rotated(registry))
    # red first, then never-checked (original order), then green by green-count
    assert ordered == ["red_b", "new_x", "new_y", "green_a", "green_c"]


def test_rotation_is_stable_without_history(monkeypatch):
    import aws_seismic_data_pipeline_spark.registry as reg

    monkeypatch.setattr(reg, "_check_history", lambda: {})
    registry = {n: _spec(n) for n in ["q3", "q1", "q2"]}
    assert list(_rotated(registry)) == ["q3", "q1", "q2"]


def test_load_all_preserves_full_surface():
    registry = load_all()
    assert len(registry) >= 153
    # rotation must not drop or duplicate names
    assert len(set(registry)) == len(registry)


@pytest.mark.usefixtures("spark")
def test_no_registered_query_outputs_complex_types(spark):
    """The driver's hasher dies on list/dict cells; every registered query
    must emit only scalar columns. Builders are instantiated (not executed)
    at sf0.001 so this checks the analyzed schema, not data."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in load_all().items():
        df = spec.builder(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"complex-typed output columns: {offenders}"
