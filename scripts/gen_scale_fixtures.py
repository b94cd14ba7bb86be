"""Generate scaling fixtures for the round-12 parallel-speedup artifact
(VERDICT r11 'Next round' item 2).

The shipped sf* fixtures are each ONE parquet file with ONE row group;
a row group is Spark's minimum split unit, so every scan stage is a
single task no matter the core count — the r11 scaling block measured
8 cores >= 32 cores for every headliner because of exactly this. This
script rewrites a fixture dir with (a) many row groups and (b) an
optional integer replication factor with key-shifted foreign keys, so
scan AND shuffle stages have real parallelism to expose.

Key shifting preserves referential integrity (join selectivity, group
cardinality shapes) by shifting every key column of replica i by
i * stride(table key), where stride is the source max+1 of the
defining table's key. Dims (region, nation) are copied as-is — they
are constant-cardinality at every scale by schema.

Row groups alone are NOT enough on these fixtures: a single file under
spark.sql.files.maxPartitionBytes (128 MB) is still ONE scan task no
matter how many row groups it holds (Spark packs whole-file byte ranges
into splits; row groups only bound where a split can land inside a
LARGE file). Real 100-TB tables are directories of many files, so the
rewrite emits each table as a `table.parquet/` DIRECTORY of part files
(`files` per table), which is what actually gives the scan N tasks.

Usage:
    python scripts/gen_scale_fixtures.py SRC_DIR OUT_DIR [factor] [rows_per_group] [files]

Pure pyarrow — no Spark session, so it can run alongside other work.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns shifted by that table's OWN key stride
SHIFT = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events_event", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY = ("region", "nation")
# stride source: (table, column) the stride is computed from
STRIDE_COL = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events_event": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def main() -> int:
    src = Path(sys.argv[1])
    out = Path(sys.argv[2])
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    rpg = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000
    n_files = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    out.mkdir(parents=True, exist_ok=True)

    tables = {t: pq.read_table(src / f"{t}.parquet") for t in list(SHIFT) + list(COPY)}
    strides = {
        k: int(pc.max(tables[t][c]).as_py()) + 1 for k, (t, c) in STRIDE_COL.items()
    }

    for t in COPY:
        pq.write_table(tables[t], out / f"{t}.parquet")
        print(f"{t}: copied ({tables[t].num_rows} rows)")

    for t, shifts in SHIFT.items():
        base = tables[t]
        parts = [base]
        for i in range(1, factor):
            rep = base
            for col, skey in shifts.items():
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep[col], i * strides[skey])
                rep = rep.set_column(idx, rep.schema.field(idx), shifted.cast(rep.schema.field(idx).type))
            parts.append(rep)
        full = pa.concat_tables(parts)
        n = full.num_rows
        # target n_files, but keep every file >= 10k rows so tiny
        # tables don't shatter into per-file-overhead noise
        k = max(1, min(n_files, n // 10_000))
        d = out / f"{t}.parquet"
        d.mkdir(parents=True, exist_ok=True)
        for old in d.glob("part-*.parquet"):
            old.unlink()
        per = -(-n // k)
        groups = 0
        for i in range(k):
            sl = full.slice(i * per, per)
            if sl.num_rows == 0:
                break
            pq.write_table(sl, d / f"part-{i:05d}.parquet", row_group_size=rpg)
            groups += pq.ParquetFile(d / f"part-{i:05d}.parquet").metadata.num_row_groups
        print(f"{t}: {n} rows, {k} files, {groups} row groups")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
