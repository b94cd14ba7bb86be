"""Round-8: s_stream_table_sink idempotency pins (flushed by the
engine-stability run-pair harness under the shuf1 conf).

The flake class: DROP TABLE IF EXISTS only reaps locations the
CURRENT session's catalog knows about. A spark-warehouse/<tbl>
directory left by an earlier SESSION of the same process (or a
crashed process whose pid was later recycled — the table name is
pid-suffixed) survives the DROP, and writeStream.toTable then fails
LOCATION_ALREADY_EXISTS. The entry now removes the physical location
explicitly before starting the stream.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"


def test_same_session_double_run(spark):
    all_queries()
    fn = REGISTRY["s_stream_table_sink"].fn
    a = sorted(map(tuple, fn(spark, SF).collect()))
    b = sorted(map(tuple, fn(spark, SF).collect()))
    assert a == b and len(a) > 0


def test_stale_warehouse_location_survived(spark):
    """Simulate the recycled-pid / dead-session case: the physical
    table directory exists but the catalog has no entry."""
    all_queries()
    tbl = f"stream_tbl_sink_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(wh, tbl)
    os.makedirs(os.path.join(stale, "junk_subdir"), exist_ok=True)
    with open(os.path.join(stale, "orphan.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    rows = REGISTRY["s_stream_table_sink"].fn(spark, SF).collect()
    assert len(rows) > 0
