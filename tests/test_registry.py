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


def test_rotation_promotes_newly_oracled_rows_only(monkeypatch):
    """r4 verdict item 2: the 5 streaming queries gained oracles AFTER
    their last driver row (rows-only, latest round) — under the old
    rules they sat in group 3 behind every green and never got their
    oracle hash-checked. A rows-only-latest query whose registry spec
    NOW carries an oracle must rotate like a red query (ahead of
    greens and stale rows-only), since its oracle is wholly unproven."""
    import aws_seismic_data_pipeline_spark.registry as reg

    history = {
        "oracled_rowsonly": (2, 2, 3, True),  # fresh rows-only rows...
        "green_a": (1, 1, 1, False),
        "rowsonly_stale": (1, 1, 1, True),
    }
    monkeypatch.setattr(reg, "_check_history", lambda: history)
    registry = {
        "green_a": _spec("green_a"),
        # ...but the spec now registers SQL: its hash check never ran
        "oracled_rowsonly": QuerySpec(
            name="oracled_rowsonly", builder=lambda s, d: None, oracle="SELECT 1"
        ),
        "rowsonly_stale": _spec("rowsonly_stale"),
    }
    assert list(_rotated(registry)) == [
        "oracled_rowsonly",
        "rowsonly_stale",
        "green_a",
    ]


def test_rotation_rechecks_oldest_greens_first(monkeypatch):
    """r4 verdict item 3: within the green group, staleness wins — a
    query last proven in round 1 re-queues before one proven in round 3
    regardless of registration order, so old greens can't age forever."""
    import aws_seismic_data_pipeline_spark.registry as reg

    history = {
        "green_r3": (3, 3, 3, False),
        "green_r1": (1, 1, 1, False),
        "green_r2": (2, 2, 2, False),
    }
    monkeypatch.setattr(reg, "_check_history", lambda: history)
    registry = {n: _spec(n) for n in ["green_r3", "green_r1", "green_r2"]}
    assert list(_rotated(registry)) == ["green_r1", "green_r2", "green_r3"]
