"""Round-7 concurrency pins.

1. The datasource-registration stampede: dataSource.register is wrap +
   overwrite-put; the old per-entry try/except-pass swallowed real
   registration failures under thread contention. The locked helper
   must survive a registration stampede with every thread's subsequent
   use succeeding.
2. The three datasource entries stay green when run concurrently.
   Root cause of the soak's DATA_SOURCE_NOT_FOUND at .save(): Spark
   4.1 resolves PYTHON data sources through the JVM thread-local
   active session (DataSource.lookupDataSource), which a fresh
   py4j-backed thread lacks — deterministic on a fresh thread, only
   intermittent under the soak because py4j pools JVM threads.
   Engine fix: sources/pyds.ensure_active_session pins the session
   per thread inside load/save_python_datasource.
"""

from __future__ import annotations

import threading

import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"


class TestDatasourceRegistrationStampede:
    def test_concurrent_register_then_use(self, spark):
        from parking_violations_data_pipeline_spark.sources.pyds import (
            LedgerDataSource,
            RatesDataSource,
            register_python_datasource,
        )

        errors: list[str] = []
        barrier = threading.Barrier(8)

        def worker(i: int):
            try:
                barrier.wait(timeout=30)
                # stampede: all threads race both registrations
                register_python_datasource(spark, LedgerDataSource)
                register_python_datasource(spark, RatesDataSource)
                # then every thread must be able to USE the source
                df = (
                    spark.read.format("synthetic_rates")
                    .option("n_days", "3")
                    .load()
                )
                assert df.count() > 0
            except Exception as e:  # noqa: BLE001
                errors.append(f"t{i}: {type(e).__name__}: {e}")

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors

    def test_entries_concurrent(self, spark):
        all_queries()
        names = [
            "a_python_datasource",
            "a_python_datasource_write",
            "a_python_datasource_stream",
        ]
        results: dict[str, int] = {}
        errors: list[str] = []

        def run_one(name: str):
            try:
                results[name] = len(REGISTRY[name].fn(spark, SF).collect())
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: {type(e).__name__}: {e}")

        threads = [threading.Thread(target=run_one, args=(n,)) for n in names]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert all(v > 0 for v in results.values()), results
