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


def test_rotation_orders_unchecked_then_red_then_green(monkeypatch):
    import aws_seismic_data_pipeline_spark.registry as reg

    history = {
        "green_a": (1, 1, 3, False),
        "red_b": (2, 0, 3, False),
        "green_c": (2, 2, 3, False),
    }
    monkeypatch.setattr(reg, "_check_history", lambda: history)
    registry = {n: _spec(n) for n in ["green_a", "new_x", "red_b", "green_c", "new_y"]}
    ordered = list(_rotated(registry))
    # never-checked strictly first (driver budget is bounded; a query with
    # zero rows in any round is the only wholly-unproven kind), then
    # persistently-red, then green by green-count
    assert ordered == ["new_x", "new_y", "red_b", "green_a", "green_c"]


def test_rotation_requeues_stale_rows_only(monkeypatch):
    """A rows-only query whose last execution is ≥2 rounds old rotates
    back ahead of green oracle-checked queries (ADVICE r3: a crash
    regression in a rows-only query must not hide forever), but still
    behind never-checked and red queries."""
    import aws_seismic_data_pipeline_spark.registry as reg

    history = {
        "rowsonly_stale": (1, 1, 1, True),   # last ran round 1
        "rowsonly_fresh": (1, 1, 3, True),   # ran latest round
        "green_a": (1, 1, 1, False),         # oracle-green, old — stays low
        "red_b": (1, 0, 3, False),
    }
    monkeypatch.setattr(reg, "_check_history", lambda: history)
    registry = {
        n: _spec(n)
        for n in ["green_a", "rowsonly_stale", "red_b", "rowsonly_fresh", "new_x"]
    }
    ordered = list(_rotated(registry))
    assert ordered == ["new_x", "red_b", "rowsonly_stale", "green_a", "rowsonly_fresh"]


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


def test_every_rows_only_query_declares_no_oracle():
    """A query without an oracle gets only the weakest driver check, so
    the omission must be a documented decision (tag), never an
    accident. Conversely every tagged query must actually lack one."""
    for name, spec in load_all().items():
        if spec.oracle is None:
            assert "no-oracle" in spec.tags, f"{name} lacks oracle AND tag"
        else:
            assert "no-oracle" not in spec.tags, f"{name} has both"


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
