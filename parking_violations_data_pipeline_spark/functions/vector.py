"""Vector math as JVM-side higher-order array expressions (SURVEY.md §2 J7).

All functions take ArrayType columns and return Column expressions that
stay inside whole-stage codegen — no Python boundary. Inputs are cast
to array<double> first: the fixtures store float32 embeddings, and
double-precision accumulation is what the DuckDB oracle computes when
given DOUBLE[], so both sides agree to ~1 ulp.

The Arrow/pandas fast path for bulk similarity lives in
operators/similarity.py (numpy matmul over mapInPandas batches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] via zip_with + aggregate (JVM-side, codegen'd)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm."""
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda s, x: s + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity. A zero-norm vector has no direction — the
    similarity is mathematically undefined, so it comes back NULL
    (try_divide) rather than aborting the job under ANSI mode. Oracles
    that call DuckDB's list_cosine_similarity (which returns its own
    -1.0 convention on a zero vector) must CASE-guard the zero-norm
    row to NULL to express the same semantics."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
