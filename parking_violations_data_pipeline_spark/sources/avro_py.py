"""Pure-Python Avro Object Container File support behind the Spark 4
Python DataSource API (format name ``avro_py``).

Why this exists: the container ships no spark-avro jar, so the JVM
``to_avro``/``from_avro`` path raises AVRO_NOT_LOADED (SURVEY §16).
The format itself, however, is fully public (Apache Avro spec 1.11,
"Object Container Files" + "Binary encoding") and needs nothing beyond
stdlib ``struct`` + ``zlib`` — so the gap is closable with a datasource
whose every byte is produced and consumed in Python workers, planned
and parallelized by Spark exactly like a file source (one input
partition per ``.avro`` shard on read; one shard per write task).

Scope (deliberately the subset the engine's tables need, refusing
loudly outside it):
  - primitives: null, boolean, int, long, float, double, bytes, string
  - records of primitives, and 2-branch ``["null", T]`` unions
    (nullable columns)
  - codecs: ``null`` and ``deflate`` (raw RFC-1951 via zlib wbits=-15)
Anything else — nested records, arrays, maps, enums, fixed, other
codecs — raises ValueError with the offending construct named. A
training-data engine at 100 TB prefers a loud refusal over a silent
mis-decode of a format corner it never tested.

Scale shape: the writer streams rows straight from the task iterator
into 64 KiB-row blocks (never materializing the partition), and the
reader streams blocks; memory is O(block), not O(file). Parallelism is
the file count, exactly as for parquet — a 100 TB avro dataset read
through this source plans one Python task per shard.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes valid)
_BLOCK_ROWS = 65536

# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag longs, length-prefixed bytes)
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    if z < 0 or z > 0xFFFFFFFFFFFFFFFF:
        raise ValueError(f"avro_py: long out of 64-bit range: {n}")
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: "io.BufferedIOBase") -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("avro_py: truncated varint (EOF mid-value)")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("avro_py: varint longer than 64 bits (malformed)")
    return (acc >> 1) ^ -(acc & 1)


def _read_exact(buf: "io.BufferedIOBase", n: int, what: str) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise ValueError(
            f"avro_py: truncated {what} (wanted {n} bytes, got {len(data)})"
        )
    return data


# ---------------------------------------------------------------------------
# schema mapping: Spark StructType <-> Avro record schema (JSON)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "integer": "int",
    "int": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {
    "long": "bigint",
    "int": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "bytes": "binary",
}


def struct_to_avro_schema(schema) -> dict:
    """Spark StructType -> Avro record schema dict (nullable -> union)."""
    fields = []
    for f in schema.fields:
        tn = f.dataType.typeName()
        if tn not in _SPARK_TO_AVRO:
            raise ValueError(
                f"avro_py: unsupported Spark type {tn!r} for field {f.name!r}"
                " (primitives only — nested types are out of scope)"
            )
        at = _SPARK_TO_AVRO[tn]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": "spark_row", "fields": fields}


def avro_schema_to_ddl(schema: dict) -> str:
    """Avro record schema -> Spark DDL string, refusing non-subset."""
    if schema.get("type") != "record":
        raise ValueError(
            f"avro_py: top-level schema must be a record, got {schema.get('type')!r}"
        )
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(
                    f"avro_py: only 2-branch null unions supported, got {t!r}"
                )
            t = t[0] if t[1] == "null" else t[1]
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(f"avro_py: unsupported Avro type {t!r}")
        cols.append(f"`{f['name']}` {_AVRO_TO_SPARK[t]}")
    return ", ".join(cols)


def _field_plan(schema: dict) -> list[tuple[str, str, bool]]:
    """[(name, primitive_type, nullable)] in record field order."""
    plan = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            prim = t[0] if t[1] == "null" else t[1]
            plan.append((f["name"], prim, True))
        else:
            plan.append((f["name"], t, False))
    return plan


# ---------------------------------------------------------------------------
# row codec
# ---------------------------------------------------------------------------


def _encode_value(prim: str, v, out: bytearray) -> None:
    if prim == "long" or prim == "int":
        out += zigzag_encode(int(v))
    elif prim == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b))
        out += b
    elif prim == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b))
        out += b
    elif prim == "double":
        out += struct.pack("<d", float(v))
    elif prim == "float":
        out += struct.pack("<f", float(v))
    elif prim == "boolean":
        out.append(1 if v else 0)
    else:
        raise ValueError(f"avro_py: unsupported primitive {prim!r}")


def encode_rows(plan: list[tuple[str, str, bool]], rows) -> bytes:
    out = bytearray()
    for row in rows:
        for (name, prim, nullable), v in zip(plan, row):
            if nullable:
                if v is None:
                    out += zigzag_encode(0)  # union branch 0 = null
                    continue
                out += zigzag_encode(1)  # union branch 1 = value
            elif v is None:
                raise ValueError(
                    f"avro_py: NULL in non-nullable field {name!r}"
                )
            _encode_value(prim, v, out)
    return bytes(out)


def _decode_value(prim: str, buf: "io.BufferedIOBase"):
    if prim == "long" or prim == "int":
        return zigzag_decode(buf)
    if prim == "string":
        n = zigzag_decode(buf)
        if n < 0:
            raise ValueError("avro_py: negative string length (malformed)")
        return _read_exact(buf, n, "string body").decode("utf-8")
    if prim == "bytes":
        n = zigzag_decode(buf)
        if n < 0:
            raise ValueError("avro_py: negative bytes length (malformed)")
        return _read_exact(buf, n, "bytes body")
    if prim == "double":
        return struct.unpack("<d", _read_exact(buf, 8, "double"))[0]
    if prim == "float":
        return struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
    if prim == "boolean":
        return _read_exact(buf, 1, "boolean")[0] != 0
    raise ValueError(f"avro_py: unsupported primitive {prim!r}")


def decode_rows(plan, data: bytes, n_rows: int) -> list[tuple]:
    buf = io.BytesIO(data)
    rows = []
    for _ in range(n_rows):
        vals = []
        for name, prim, nullable in plan:
            if nullable:
                branch = zigzag_decode(buf)
                if branch == 0:
                    vals.append(None)
                    continue
                if branch != 1:
                    raise ValueError(
                        f"avro_py: union branch {branch} for field {name!r}"
                        " (only [null, T] supported)"
                    )
            vals.append(_decode_value(prim, buf))
        rows.append(tuple(vals))
    if buf.read(1):
        raise ValueError(
            "avro_py: trailing bytes after declared row count (block"
            " count/size disagree — refusing a silent partial decode)"
        )
    return rows


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_container(
    path: str, schema: dict, rows, codec: str = "deflate"
) -> int:
    """Stream `rows` (tuples in field order) into one OCF; returns rows
    written. Blocks of _BLOCK_ROWS keep memory O(block) at any file
    size."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_py: unsupported codec {codec!r}")
    plan = _field_plan(schema)
    n_total = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        fh.write(zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            kb = k.encode()
            fh.write(zigzag_encode(len(kb)) + kb)
            fh.write(zigzag_encode(len(v)) + v)
        fh.write(zigzag_encode(0))  # map terminator
        fh.write(SYNC)

        block: list[tuple] = []

        def flush() -> None:
            nonlocal n_total
            if not block:
                return
            raw = encode_rows(plan, block)
            if codec == "deflate":
                c = zlib.compressobj(9, zlib.DEFLATED, -15)
                raw = c.compress(raw) + c.flush()
            fh.write(zigzag_encode(len(block)))
            fh.write(zigzag_encode(len(raw)))
            fh.write(raw)
            fh.write(SYNC)
            n_total += len(block)
            block.clear()

        for row in rows:
            block.append(tuple(row))
            if len(block) >= _BLOCK_ROWS:
                flush()
        flush()
    return n_total


def read_header(fh) -> tuple[dict, str, bytes]:
    """Parse magic + metadata map; returns (schema, codec, sync)."""
    if _read_exact(fh, 4, "magic") != MAGIC:
        raise ValueError("avro_py: not an Avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = zigzag_decode(fh)
        if n == 0:
            break
        if n < 0:
            # negative block count => byte size follows (spec); skip it
            _ = zigzag_decode(fh)
            n = -n
        for _ in range(n):
            klen = zigzag_decode(fh)
            k = _read_exact(fh, klen, "meta key").decode()
            vlen = zigzag_decode(fh)
            meta[k] = _read_exact(fh, vlen, "meta value")
    sync = _read_exact(fh, 16, "sync marker")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_py: unsupported codec {codec!r}")
    return schema, codec, sync


def read_container(path: str):
    """Yield row tuples from one OCF, streaming block by block."""
    with open(path, "rb") as fh:
        schema, codec, sync = read_header(fh)
        plan = _field_plan(schema)
        while True:
            first = fh.read(1)
            if not first:
                return  # clean EOF at a block boundary
            # continue the varint from the already-consumed EOF-probe
            # byte (no seek: the source may one day be non-seekable)
            b, shift, acc = first[0], 0, 0
            while True:
                acc |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 63:
                    raise ValueError(
                        "avro_py: varint longer than 64 bits (malformed)"
                    )
                b = _read_exact(fh, 1, "block count varint")[0]
            n_rows = (acc >> 1) ^ -(acc & 1)
            n_bytes = zigzag_decode(fh)
            if n_rows < 0 or n_bytes < 0:
                raise ValueError("avro_py: negative block header (malformed)")
            data = _read_exact(fh, n_bytes, "block data")
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            got_sync = _read_exact(fh, 16, "block sync")
            if got_sync != sync:
                raise ValueError(
                    "avro_py: sync marker mismatch after block (corrupt or"
                    " misaligned file)"
                )
            yield from decode_rows(plan, data, n_rows)


# ---------------------------------------------------------------------------
# Spark Python DataSource
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_avro(path: str) -> list[str]:
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith((".", "_"))
    )
    if not files:
        raise ValueError(f"avro_py: no .avro files under {path!r}")
    return files


class AvroReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        # one task per shard — the same parallelism contract as a file
        # source; at 100 TB the shard count is the read parallelism
        return [AvroFilePartition(p) for p in _list_avro(self.path)]

    def read(self, partition: AvroFilePartition):
        yield from read_container(partition.path)


class AvroCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class AvroWriter(DataSourceWriter):
    """One OCF shard per task, two-phase commit via _MANIFEST (the
    shard only counts once the driver-side commit records it)."""

    def __init__(self, options, schema):
        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        self.avro_schema = struct_to_avro_schema(schema)

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        n = write_container(shard, self.avro_schema, iterator, self.codec)
        return AvroCommit(shard, n)

    def commit(self, messages):
        # zero-task write (empty source with zero planned partitions):
        # Avro is self-describing, so a dataset with no shards has no
        # schema — land one empty container so a later read can still
        # infer (the same reason parquet writes a footer-only file)
        if not messages:
            os.makedirs(self.path, exist_ok=True)
            empty = os.path.join(self.path, "part-00000-empty.avro")
            write_container(empty, self.avro_schema, [], self.codec)
            messages = [AvroCommit(empty, 0)]
        manifest = {
            "shards": sorted(os.path.basename(m.path) for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            fh.write(json.dumps(manifest))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class AvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        # read path: the schema is IN the file (Avro is self-describing)
        # — parse the first shard's header on the driver, exactly like
        # parquet footer-based inference
        with open(_list_avro(self.options["path"])[0], "rb") as fh:
            schema, _codec, _sync = read_header(fh)
        return avro_schema_to_ddl(schema)

    def reader(self, schema) -> AvroReader:
        return AvroReader(self.options)

    def writer(self, schema, overwrite: bool) -> AvroWriter:
        return AvroWriter(self.options, schema)
