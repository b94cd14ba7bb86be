"""Differential tests: every registered oracle-checked query must match
its DuckDB oracle exactly at sf0.001 (fast) — mirrors the driver's
sf0.01 gate.
"""

from __future__ import annotations

import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL
from .oracle_harness import compare_query

all_queries()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, name, SF_SMALL)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    assert df.count() >= 0  # must at least execute
