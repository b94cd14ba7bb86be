"""Local mirror of the driver's differential check: run a registered
query's Spark side and its DuckDB oracle on the same parquet dir, then
compare row count, column-name set, and order-insensitively the values
(columns sorted by name, rows sorted, exact match after the query's own
rounding). Stricter than the driver can be assumed to be — if this
passes, the driver's value-hash should too.
"""

from __future__ import annotations

import math

import duckdb

from parking_violations_data_pipeline_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # collapse -0.0 and fp noise below the queries' own rounding
        return ("f", round(v + 0.0, 9))
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm_cell(x) for x in v))
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [cols[i] for i in order]
    nrows = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return ncols, nrows


def compare_query(spark, name: str, sf_dir: str) -> None:
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

    all_queries()  # populate
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    assert q.oracle is not None, f"{name}: no oracle (rows-only query)"
    con = duck_connect(sf_dir)
    try:
        res = con.execute(q.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {sorted(scols)} != {sorted(ocols)}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    _, ns = _normalize(scols, srows)
    _, no = _normalize(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(ns, no)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)}/{len(ns)} rows differ; first: "
        f"spark={ns[mism[0]]} oracle={no[mism[0]]}"
    )
