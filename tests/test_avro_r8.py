"""Round-8: pure-Python Avro (sources/avro_py.py) — unit coverage for
the binary codec plus an INDEPENDENT container decoder that shares no
code with the engine's reader (separate varint loop, separate union
handling), so a systematic encode/decode bug that cancels out in the
engine's own roundtrip still gets caught here.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pytest

from parking_violations_data_pipeline_spark.sources import avro_py as A

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": ["null", "long"]},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": "bytes"},
    ],
}
ROWS = [
    (0, "x", 1.5, None, True, b"\x00\xff"),
    (-1, None, -2.25, 2**63 - 1, False, b""),
    (123456789012345, "", 0.0, -(2**63), True, b"abc"),
    (7, "café ☃", float("inf"), 0, False, bytes(range(256))),
]


# ---------------------------------------------------------------------------
# independent decoder — written against the Avro 1.11 spec text, not
# against avro_py's implementation (different varint accumulation,
# reads the whole file into memory, decodes unions by explicit index)
# ---------------------------------------------------------------------------


def _ind_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    for i in range(10):
        b = buf[pos + i]
        result |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            unsigned = result
            return (unsigned >> 1) ^ -(unsigned & 1), pos + i + 1
    raise AssertionError("varint too long")


def _ind_decode_prim(t: str, buf: memoryview, pos: int):
    if t in ("long", "int"):
        return _ind_varint(buf, pos)
    if t in ("string", "bytes"):
        n, pos = _ind_varint(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    raise AssertionError(t)


def independent_read(path: str) -> list[tuple]:
    data = memoryview(open(path, "rb").read())
    assert bytes(data[:4]) == b"Obj\x01"
    pos = 4
    meta = {}
    while True:
        n, pos = _ind_varint(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _ind_varint(data, pos)
            n = -n
        for _ in range(n):
            klen, pos = _ind_varint(data, pos)
            k = bytes(data[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = _ind_varint(data, pos)
            meta[k] = bytes(data[pos : pos + vlen])
            pos += vlen
    sync = bytes(data[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    rows = []
    while pos < len(data):
        n_rows, pos = _ind_varint(data, pos)
        n_bytes, pos = _ind_varint(data, pos)
        blob = bytes(data[pos : pos + n_bytes])
        pos += n_bytes
        if codec == "deflate":
            blob = zlib.decompress(blob, -15)
        assert bytes(data[pos : pos + 16]) == sync, "sync mismatch"
        pos += 16
        bm, bp = memoryview(blob), 0
        for _ in range(n_rows):
            vals = []
            for f in schema["fields"]:
                t = f["type"]
                if isinstance(t, list):
                    idx, bp = _ind_varint(bm, bp)
                    branch = t[idx]
                    if branch == "null":
                        vals.append(None)
                        continue
                    t = branch
                v, bp = _ind_decode_prim(t, bm, bp)
                vals.append(v)
            rows.append(tuple(vals))
        assert bp == len(blob), "block not fully consumed"
    return rows


# ---------------------------------------------------------------------------
# codec unit tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "v", [0, -1, 1, 63, 64, -64, -65, 300, -300, 2**62, 2**63 - 1, -(2**63)]
)
def test_zigzag_roundtrip(v):
    assert A.zigzag_decode(io.BytesIO(A.zigzag_encode(v))) == v


def test_zigzag_known_vectors():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    assert A.zigzag_encode(0) == b"\x00"
    assert A.zigzag_encode(-1) == b"\x01"
    assert A.zigzag_encode(1) == b"\x02"
    assert A.zigzag_encode(-2) == b"\x03"
    assert A.zigzag_encode(-64) == b"\x7f"
    assert A.zigzag_encode(64) == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    n = A.write_container(p, SCHEMA, ROWS, codec)
    assert n == len(ROWS)
    assert list(A.read_container(p)) == ROWS


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_independent_decoder_agrees(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    A.write_container(p, SCHEMA, ROWS, codec)
    assert independent_read(p) == ROWS


def test_multi_block_streaming(tmp_path):
    # >1 block: force tiny blocks so the block loop + sync checks run
    old = A._BLOCK_ROWS
    A._BLOCK_ROWS = 3
    try:
        p = str(tmp_path / "t.avro")
        rows = [(i, f"s{i}", i / 8, None if i % 5 == 0 else i, i % 2 == 0, b"%d" % i) for i in range(100)]
        A.write_container(p, SCHEMA, rows, "deflate")
        assert list(A.read_container(p)) == rows
        assert independent_read(p) == rows
    finally:
        A._BLOCK_ROWS = old


def test_refusals(tmp_path):
    p = str(tmp_path / "t.avro")
    A.write_container(p, SCHEMA, ROWS, "deflate")
    raw = open(p, "rb").read()

    bad_magic = str(tmp_path / "m.avro")
    open(bad_magic, "wb").write(b"PAR1" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        list(A.read_container(bad_magic))

    truncated = str(tmp_path / "tr.avro")
    open(truncated, "wb").write(raw[:-20])
    with pytest.raises(ValueError, match="truncated"):
        list(A.read_container(truncated))

    corrupt_sync = str(tmp_path / "cs.avro")
    open(corrupt_sync, "wb").write(raw[:-16] + b"\x00" * 16)
    with pytest.raises(ValueError, match="sync"):
        list(A.read_container(corrupt_sync))

    with pytest.raises(ValueError, match="codec"):
        A.write_container(str(tmp_path / "x.avro"), SCHEMA, ROWS, "snappy")

    with pytest.raises(ValueError, match="NULL in non-nullable"):
        A.write_container(
            str(tmp_path / "n.avro"),
            {"type": "record", "name": "t",
             "fields": [{"name": "a", "type": "long"}]},
            [(None,)],
        )


def test_schema_mapping_refusals():
    with pytest.raises(ValueError, match="unsupported Avro type"):
        A.avro_schema_to_ddl(
            {"type": "record", "name": "t",
             "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}]}
        )
    with pytest.raises(ValueError, match="2-branch"):
        A.avro_schema_to_ddl(
            {"type": "record", "name": "t",
             "fields": [{"name": "a", "type": ["null", "long", "string"]}]}
        )
    with pytest.raises(ValueError, match="record"):
        A.avro_schema_to_ddl({"type": "long"})


def test_spark_datasource_roundtrip(spark, tmp_path):
    from parking_violations_data_pipeline_spark.sources.avro_py import (
        AvroDataSource,
    )
    from parking_violations_data_pipeline_spark.sources.pyds import (
        register_python_datasource,
        save_python_datasource,
    )

    register_python_datasource(spark, AvroDataSource)
    df = spark.range(1000).selectExpr(
        "id",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('n', id) END AS name",
        "CAST(id AS DOUBLE) / 7 AS x",
        "id % 2 = 0 AS flag",
    )
    path = str(tmp_path / "avro_out")
    save_python_datasource(df, "avro_py", mode="append", path=path)
    man = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert man["n_rows"] == 1000

    back = spark.read.format("avro_py").option("path", path).load()
    assert back.schema.simpleString() == (
        "struct<id:bigint,name:string,x:double,flag:boolean>"
    )
    a = sorted(df.collect())
    b = sorted(back.collect())
    assert a == b

    # independent decode of the Spark-written shards
    shards = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    ]
    ind = sorted(r for s in shards for r in independent_read(s))
    assert ind == [tuple(r) for r in a]
