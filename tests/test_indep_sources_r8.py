"""Round-8: independent derivation of the a_* source/sink family
(VERDICT item 6). Each test writes an artifact THROUGH THE ENGINE'S
write path (same options as the registered entry), then re-parses the
bytes with stdlib/pyarrow ONLY — no Spark on the read side — and
checks three-way agreement: engine write -> independent reparse ->
DuckDB recomputation from the parquet source. A systematic
encode/decode bug that cancels out inside a Spark write+read roundtrip
cannot cancel here.

(The avro_py container format has its own spec-based independent
decoder in tests/test_avro_r8.py; the physical CSV/JSONL reparses from
r7 live in tests/test_indep_etl_r7.py.)
"""

from __future__ import annotations

import csv
import glob
import hashlib
import io
import json
import os
import xml.etree.ElementTree as ET

import duckdb
import pytest
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.01"
ORDERS = f"{SF}/orders.parquet"


@pytest.fixture(scope="module")
def scratch(tmp_path_factory):
    return str(tmp_path_factory.mktemp("indep_sources"))


def duck(sql: str):
    return duckdb.sql(sql).fetchall()


def test_orc_independent_reparse(spark, scratch):
    """a_orc_roundtrip's artifact, reparsed with pyarrow.orc: the ORC
    bytes Spark wrote must carry exactly the rows DuckDB derives from
    the parquet source — proven without Spark's ORC reader."""
    import pyarrow.orc as po

    path = os.path.join(scratch, "orc")
    o = load_table(spark, SF, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    o.write.mode("overwrite").orc(path)

    n_rows, cents = 0, 0
    for fn in glob.glob(os.path.join(path, "*.orc")):
        t = po.ORCFile(fn).read()
        n_rows += t.num_rows
        col = t.column("cents").to_pylist()
        cents += sum(v for v in col if v is not None)
    [(exp_n, exp_cents)] = duck(
        f"""SELECT count(*), sum(CAST(round(o_totalprice*100,0) AS BIGINT))
            FROM '{ORDERS}'"""
    )
    assert n_rows == exp_n
    assert cents == exp_cents


def test_parquet_codec_footers_and_values(spark, scratch):
    """a_parquet_codecs' artifact: pyarrow must see the requested codec
    in every column chunk AND read back values identical to DuckDB's
    view of the source."""
    import pyarrow.parquet as pq

    [(exp_n, exp_cents)] = duck(
        f"""SELECT count(*), sum(CAST(round(o_totalprice*100,0) AS BIGINT))
            FROM '{ORDERS}'"""
    )
    for codec in ("snappy", "zstd", "gzip"):
        path = os.path.join(scratch, f"pq_{codec}")
        o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        o.write.mode("overwrite").option("compression", codec).parquet(path)
        n_rows, cents, seen = 0, 0, set()
        for fn in glob.glob(os.path.join(path, "*.parquet")):
            f = pq.ParquetFile(fn)
            meta = f.metadata
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    seen.add(meta.row_group(rg).column(ci).compression.lower())
            t = f.read()
            n_rows += t.num_rows
            cents += sum(
                int(round(v * 100))
                for v in t.column("o_totalprice").to_pylist()
                if v is not None
            )
        assert seen <= {codec}, (codec, seen)
        assert n_rows == exp_n
        assert cents == exp_cents


def test_xml_independent_reparse(spark, scratch):
    """a_xml_roundtrip's artifact, reparsed with xml.etree: element
    structure (rowTag=order), field values, and the aggregate must all
    match DuckDB's derivation — Spark's XML reader never runs."""
    path = os.path.join(scratch, "xml")
    o = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    o.write.format("xml").option("rowTag", "order").mode("overwrite").save(path)

    rows = {}
    for fn in glob.glob(os.path.join(path, "*.xml")):
        root = ET.parse(fn).getroot()
        for order in root:
            assert order.tag == "order"
            key = int(order.find("o_orderkey").text)
            rows[key] = (
                order.find("o_orderpriority").text,
                float(order.find("o_totalprice").text),
            )
    exp = dict(
        (k, (p, t))
        for k, p, t in duck(
            f"""SELECT o_orderkey, o_orderpriority, o_totalprice
                FROM '{ORDERS}' WHERE o_orderkey < 2000"""
        )
    )
    assert set(rows) == set(exp)
    for k, (pri, tot) in rows.items():
        assert pri == exp[k][0]
        assert abs(tot - exp[k][1]) < 1e-9, (k, tot, exp[k][1])


def test_time_travel_manifests_via_pyarrow(spark, scratch):
    """a_time_travel_versions' mechanism, replayed with pyarrow: read
    each version MANIFEST with json, load exactly its listed files
    with pyarrow, and match DuckDB's predicate-derived snapshot — the
    isolation claim (v2 files invisible to v1) verified outside
    Spark."""
    import pyarrow.parquet as pq

    root = os.path.join(scratch, "tt")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    v1_dir = os.path.join(root, "data", "batch_v1")
    o.filter(F.col("o_orderkey") % 3 == 0).write.mode("overwrite").parquet(v1_dir)
    v1_files = sorted(glob.glob(os.path.join(v1_dir, "*.parquet")))
    os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
    json.dump(
        {"version": 1, "files": v1_files},
        open(os.path.join(root, "_manifests", "v1.json"), "w"),
    )
    v2_dir = os.path.join(root, "data", "batch_v2")
    o.filter(F.col("o_orderkey") % 3 == 1).write.mode("overwrite").parquet(v2_dir)
    json.dump(
        {"version": 2, "files": v1_files + sorted(glob.glob(os.path.join(v2_dir, "*.parquet")))},
        open(os.path.join(root, "_manifests", "v2.json"), "w"),
    )

    for v, pred in (("v1", "o_orderkey % 3 = 0"), ("v2", "o_orderkey % 3 <= 1")):
        man = json.load(open(os.path.join(root, "_manifests", f"{v}.json")))
        n, cents = 0, 0
        for fn in man["files"]:
            t = pq.read_table(fn)
            n += t.num_rows
            cents += sum(
                int(round(x * 100))
                for x in t.column("o_totalprice").to_pylist()
                if x is not None
            )
        [(en, ec)] = duck(
            f"""SELECT count(*), sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                FROM '{ORDERS}' WHERE {pred}"""
        )
        assert (n, cents) == (en, ec), v


def test_ledger_manifest_stdlib_reparse(spark, scratch):
    """a_python_datasource_write's artifact: the JSONL shards and
    _MANIFEST are plain files — stdlib json must reproduce the commit
    fold AND DuckDB's totals from the source."""
    from parking_violations_data_pipeline_spark.sources.pyds import (
        LedgerDataSource,
        register_python_datasource,
        save_python_datasource,
    )

    register_python_datasource(spark, LedgerDataSource)
    path = os.path.join(scratch, "ledger")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    save_python_datasource(o, "integer_ledger", mode="append", path=path)

    man = json.load(open(os.path.join(path, "_MANIFEST.json")))
    n, cents = 0, 0
    for fn in glob.glob(os.path.join(path, "part-*.jsonl")):
        for line in open(fn):
            rec = json.loads(line)
            n += 1
            if rec["cents"] is not None:
                cents += int(rec["cents"])
    [(en, ec)] = duck(
        f"""SELECT count(*), sum(CAST(round(o_totalprice*100,0) AS BIGINT))
            FROM '{ORDERS}'"""
    )
    assert (man["n_rows"], man["cents"]) == (n, cents)
    assert (n, cents) == (en, ec)


def test_csv_quoting_stdlib_reparse(spark, scratch):
    """a_csv_quoting_roundtrip's artifact parsed with the stdlib csv
    module (RFC 4180 reference implementation): every corner value —
    embedded delimiter, doubled quotes, embedded newline, trailing
    space — must come back byte-identical."""
    values = [
        (1, "plain value"),
        (2, "has,comma"),
        (3, 'has "quotes" inside'),
        (4, "line one\nline two"),
        (5, "trailing space "),
    ]
    src = spark.createDataFrame(values, "id long, content string")
    path = os.path.join(scratch, "csvq")
    (
        src.coalesce(1)
        .write.mode("overwrite")
        .option("quoteAll", "true")
        # Spark's default escape is backslash: embedded quotes would be
        # written \" — readable by Spark, NOT RFC 4180, and the stdlib
        # reader below (rightly) misparses it. escape='"' doubles them.
        .option("escape", '"')
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path, header=True)
    )
    [fn] = glob.glob(os.path.join(path, "*.csv"))
    with open(fn, newline="") as fh:
        got = {
            int(row["id"]): row["content"] for row in csv.DictReader(fh)
        }
    assert got == dict(values)


def test_binaryfile_reader_against_stdlib(spark, scratch):
    """The binaryFile SOURCE direction: files written with plain
    open() must surface through spark.read.format('binaryFile') with
    exactly the stdlib-computed (length, sha256) per path."""
    blob_dir = os.path.join(scratch, "blobs")
    os.makedirs(blob_dir, exist_ok=True)
    expected = {}
    for i in range(5):
        payload = bytes((i * 37 + j) % 256 for j in range(100 + i * 13))
        p = os.path.join(blob_dir, f"b{i}.bin")
        open(p, "wb").write(payload)
        expected[f"b{i}.bin"] = (len(payload), hashlib.sha256(payload).hexdigest())

    rows = (
        spark.read.format("binaryFile")
        .load(blob_dir)
        .select("path", "length", "content")
        .collect()
    )
    got = {
        os.path.basename(r["path"]): (
            r["length"],
            hashlib.sha256(bytes(r["content"])).hexdigest(),
        )
        for r in rows
    }
    assert got == expected
