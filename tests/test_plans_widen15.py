"""Pins for the widen15 batch (Python DataSource, UDTF analyze)."""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import all_queries

from .conftest import SF_MED

all_queries()


def test_python_datasource_plans_monthly_partitions(spark):
    # the custom source's partitions() drives real scan parallelism:
    # 365 days / monthly chunks -> 12 read tasks, not a single funnel
    from parking_violations_data_pipeline_spark.sources.pyds import RatesDataSource

    try:
        spark.dataSource.register(RatesDataSource)
    except Exception:
        pass
    df = spark.read.format("synthetic_rates").option("n_days", "365").load()
    assert df.rdd.getNumPartitions() == 12
    assert df.count() == 365 * 5


def test_python_datasource_filter_prunes_rows(spark):
    from parking_violations_data_pipeline_spark.sources.pyds import RatesDataSource

    try:
        spark.dataSource.register(RatesDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("synthetic_rates")
        .option("n_days", "30")
        .load()
        .filter("ccy = 'USD'")
    )
    assert df.count() == 30


def test_udtf_analyze_dynamic_width(spark):
    # the analyze() hook must synthesize c0..c{k-1} from the constant
    # width argument at plan time
    from parking_violations_data_pipeline_spark.registry import REGISTRY

    row = REGISTRY["k_udtf_analyze"].fn(spark, SF_MED).head()
    assert row["n_rows"] > 0
    # sf0.01 part names are 2 words -> c2 is all-NULL there (oracle
    # agrees); d0 proves the shredding populated real columns
    assert row["d0"] > 0
    out = spark.sql("SELECT * FROM LATERAL split_cols('a b c d', 4)")
    assert out.columns == ["c0", "c1", "c2", "c3"]
    assert out.head() == ("a", "b", "c", "d")
