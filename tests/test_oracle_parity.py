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
ORACLE_QUERIES = sorted(REGISTRY)


def test_no_rows_only_entries():
    """The driver records oracle=None as err:no_oracle (no rows-only
    fallback exists) — every registry entry MUST carry an oracle;
    probabilistic ops encode their acceptance invariant in-plan."""
    missing = sorted(n for n, q in REGISTRY.items() if q.oracle is None)
    assert not missing, f"entries without oracle (permanently red): {missing}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, name, SF_SMALL)
