"""Import every query module so the registry is fully populated."""

from parking_violations_data_pipeline_spark.queries import (  # noqa: F401
    analytics,
    advanced,
    baseline,
    corpus,
    etl,
    growth,
    layout,
    mining,
    pandas_api,
    relational,
    scalars,
    sketches,
    pipeline_ops,
    sql_api,
    streaming,
    text,
    tpch_extra,
    tpch_rest,
    vectors,
    windows,
)
