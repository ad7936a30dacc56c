"""Every registered query hash-matches its DuckDB oracle (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from flights_data_pipeline_spark.queries import REGISTRY

from .oracle_utils import compare_query

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
WEAK_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    q = REGISTRY[name]
    compare_query(spark, sf_dir, q.fn, q.oracle_text(), name=name)


if WEAK_QUERIES:

    @pytest.mark.parametrize("name", WEAK_QUERIES)
    def test_runs_and_stable_schema(spark, sf_dir, name):
        """Non-SQL-expressible ops: runs, returns rows, schema stable.

        Rows-only surfaces still cross the driver's canonicalizer, so
        the driver-safe surface lint applies to them too
        (test_surface_safety).
        """
        from .oracle_utils import assert_driver_safe_surface

        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        assert df.columns, name
        assert_driver_safe_surface(df, name)
        df.collect()

else:

    def test_registry_fully_oracle_gated():
        """Since round 9 every registered query carries a DuckDB oracle
        (the sketch queries via envelope oracles) — pin that state so a
        future no-oracle query is a conscious choice, not drift."""
        assert WEAK_QUERIES == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
