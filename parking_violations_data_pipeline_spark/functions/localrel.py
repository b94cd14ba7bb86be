"""Small driver-side local relations without the Python-RDD tax
(round-11 optimization, guide §4 "the Python boundary" applied to
plan-time data).

`spark.createDataFrame(list, schema)` always goes through a pickled
Python RDD: the rows are spread over `defaultParallelism` partitions
and EVERY action re-reads them through Python workers. Measured on
local[32] (3-row frame, warm, noop sink): **0.77 s per action** for
the plain frame, **6.3 s** after a `coalesce(1)` (the single task
then pays 32 sequential Python-partition reads), and a `crossJoin`
of two such frames compiles to a 32x32 = 1024-task CartesianProduct
(38 s for a 9-row truth table — the round-11 registry's worst
Spark-only entry). The same rows shipped as a pyarrow Table execute
JVM-only: **~0.2 s per action**, no Python workers, and a single
cheap JVM task after coalesce(1).

`local_df` is the drop-in replacement for bounded driver-side rows
(codebooks, graph edges, truth tables, audit rows — everything the
collect-guard allowlist already bounds). Arrow conversion is exact
(int64 round-trips bit-perfectly — no pandas float coercion), NULLs
map to NULLs, and any row shape Arrow cannot express falls back to
the classic createDataFrame path unchanged.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(
    spark: SparkSession,
    rows: Sequence,
    schema: T.StructType | str,
    single_partition: bool = True,
) -> DataFrame:
    """Build a DataFrame from a SMALL driver-side row list.

    Semantics match `spark.createDataFrame(rows, schema)`; execution
    does not (no Python workers per action, one partition by default
    so iterative joins/cartesians over the frame stay one-task).
    Callers must only pass schema-bounded row counts (the same
    contract the collect-guard allowlist enforces on the collect that
    usually produces `rows`).
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if not isinstance(schema, T.StructType):
        raise TypeError(f"local_df needs a struct schema, got {schema}")
    rows = list(rows)
    if rows:
        try:
            df = spark.createDataFrame(_arrow_table(rows, schema), schema)
        except Exception:
            # any shape Arrow can't express (nested Rows, exotic
            # objects): keep the classic path — correctness first
            df = spark.createDataFrame(rows, schema)
    else:
        df = spark.createDataFrame([], schema)
    return df.coalesce(1) if single_partition and rows else df


def _arrow_table(rows: list, schema: T.StructType):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    cols: Iterable = zip(*rows)
    arrays = [
        pa.array(list(col), type=arrow_schema.field(j).type)
        for j, col in enumerate(cols)
    ]
    return pa.table(dict(zip([f.name for f in schema.fields], arrays)))


def lit_matrix(mat) -> "Column":  # noqa: F821 - imported lazily below
    """Nested array<..array<double>> literal as ONE parsed SQL
    expression (round-11, guide §1.2 per-task→plan-build cost): the
    k-means/PQ literal codebook matrices built as
    `F.array(*[F.array(*[F.lit(x) ...])])` pay one py4j round trip per
    scalar — ~0.75 s of pure driver-side Column construction for an
    8×16×8 codebook, re-paid in EVERY Lloyd pass. Formatting the same
    values into a SQL `array(array(...))` string and parsing it once is
    ~3 ms for the same tree (measured, this box) and yields an
    identical literal (value-equality verified incl. NaN/±Inf/NULL).

    Scalars must be float-coercible or None; NaN/±Infinity/NULL are
    emitted as explicit CASTs (bare `nanD` would not parse); finite
    values use repr(), which round-trips float64 exactly.
    """
    from pyspark.sql import functions as F

    def fmt(x) -> str:
        if isinstance(x, (list, tuple)):
            if not x:
                # bare `array()` types as array<string>; an empty leaf
                # mixed with sibling double rows would then fail to
                # resolve (round-11 ADVICE — unreachable from current
                # call sites, but this is a general-purpose helper)
                return "CAST(array() AS ARRAY<DOUBLE>)"
            return "array(" + ",".join(fmt(v) for v in x) + ")"
        if x is None:
            return "CAST(NULL AS DOUBLE)"
        x = float(x)
        if x != x:
            return "CAST('NaN' AS DOUBLE)"
        if x == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if x == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(x) + "D"

    return F.expr(fmt(mat))
