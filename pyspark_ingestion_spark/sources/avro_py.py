"""Pure-Python Avro object-container fallback datasource.

Parity target: the reference reads/writes Avro through the external
spark-avro package (reference spark.py:5-7,63-75). The pip pyspark
distribution omits the spark-avro JVM datasource jar and this
environment has no network to fetch it, so the format is implemented
here directly against the public Avro 1.11 container spec
(binary encoding: zigzag-varint longs, length-prefixed strings/bytes,
IEEE little-endian floats; container: Obj\\x01 magic, metadata map with
avro.schema/avro.codec, sync-marker-delimited blocks).

Role split, stated plainly:
- On a real cluster you add the spark-avro jar and the JVM datasource
  handles Avro at full scale; ``writers.write_partitioned`` /
  ``readers.read_file`` try it FIRST.
- When the jar is absent they fall back to this module, which is
  distributed (mapInPandas over Arrow batches, executor-side file IO)
  but Python-speed — the honest slow path, good for the local harness
  and small side-channel feeds, not for 100 TB fact tables.

Divergence from the JVM datasource (documented, deliberate): partition
columns are kept INSIDE the data files (the JVM writer drops them and
re-derives strings from directory names), so a round-trip preserves
their exact types.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_SYNC = b"\xf0\x9f\x8d\x83spark-graft!"  # any 16 bytes; fixed → deterministic files
assert len(_SYNC) == 16


# ---------------------------------------------------------------- schemas

_PRIMITIVE_TO_AVRO = {
    T.BooleanType: "boolean",
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _field_to_avro(dt: T.DataType) -> object:
    for cls, name in _PRIMITIVE_TO_AVRO.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        items = _field_to_avro(dt.elementType)
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    raise TypeError(f"avro fallback does not support Spark type {dt}")


def spark_schema_to_avro(schema: T.StructType, name: str = "topLevelRecord") -> dict:
    fields = []
    for f in schema.fields:
        ft = _field_to_avro(f.dataType)
        if f.nullable:
            fields.append({"name": f.name, "type": ["null", ft], "default": None})
        else:
            fields.append({"name": f.name, "type": ft})
    return {"type": "record", "name": name, "fields": fields}


def _avro_to_spark_type(ft: object) -> tuple[T.DataType, bool]:
    """(spark type, nullable) for one avro field type."""
    if isinstance(ft, list):  # union — only ["null", X] is produced/accepted
        non_null = [x for x in ft if x != "null"]
        if len(non_null) != 1:
            raise TypeError(f"unsupported avro union {ft}")
        inner, _ = _avro_to_spark_type(non_null[0])
        return inner, True
    if isinstance(ft, dict):
        lt = ft.get("logicalType")
        if lt == "date":
            return T.DateType(), False
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType(), False
        if lt in ("local-timestamp-micros", "local-timestamp-millis"):
            return T.TimestampNTZType(), False
        if ft.get("type") == "array":
            elem, elem_null = _avro_to_spark_type(ft["items"])
            return T.ArrayType(elem, containsNull=elem_null), False
        return _avro_to_spark_type(ft["type"])
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    if ft in prim:
        return prim[ft], False
    raise TypeError(f"avro fallback does not support avro type {ft!r}")


def avro_schema_to_spark(avro: dict) -> T.StructType:
    if avro.get("type") != "record":
        raise TypeError("top-level avro schema must be a record")
    fields = []
    for f in avro["fields"]:
        dt, nullable = _avro_to_spark_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------- binary codec

def _encode_long(buf: bytearray, n: int) -> None:
    """Zigzag + varint, the avro long encoding (64-bit two's complement)."""
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break


def _decode_long(view: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = view[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_bytes(buf: bytearray, b: bytes) -> None:
    _encode_long(buf, len(b))
    buf += b


def _encode_value(buf: bytearray, ft: object, v: object) -> None:
    """Encode one value against an avro field type (as produced above)."""
    if isinstance(ft, list):  # ["null", X]
        if v is None:
            _encode_long(buf, 0)
            return
        _encode_long(buf, 1)
        _encode_value(buf, ft[1], v)
        return
    if isinstance(ft, dict):
        lt = ft.get("logicalType")
        if lt == "date":
            _encode_long(buf, v)  # days since epoch (already converted)
            return
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            _encode_long(buf, v)  # µs since epoch (already converted)
            return
        if ft.get("type") == "array":
            if len(v):
                _encode_long(buf, len(v))
                for item in v:
                    _encode_value(buf, ft["items"], item)
            _encode_long(buf, 0)
            return
        _encode_value(buf, ft["type"], v)
        return
    if ft in ("int", "long"):
        _encode_long(buf, int(v))
    elif ft == "string":
        _encode_bytes(buf, str(v).encode("utf-8"))
    elif ft == "bytes":
        _encode_bytes(buf, bytes(v))
    elif ft == "double":
        buf += struct.pack("<d", float(v))
    elif ft == "float":
        buf += struct.pack("<f", float(v))
    elif ft == "boolean":
        buf.append(1 if v else 0)
    else:  # pragma: no cover - guarded by schema mapping
        raise TypeError(f"cannot encode avro type {ft!r}")


def _decode_value(view: memoryview, pos: int, ft: object) -> tuple[object, int]:
    if isinstance(ft, list):
        idx, pos = _decode_long(view, pos)
        if ft[idx] == "null":
            return None, pos
        return _decode_value(view, pos, ft[idx])
    if isinstance(ft, dict):
        lt = ft.get("logicalType")
        if lt in ("date", "timestamp-micros", "timestamp-millis",
                  "local-timestamp-micros", "local-timestamp-millis"):
            n, pos = _decode_long(view, pos)
            return _from_logical(n, lt), pos
        if ft.get("type") == "array":
            out = []
            while True:
                count, pos = _decode_long(view, pos)
                if count == 0:
                    break
                if count < 0:  # block with byte size prefix
                    count = -count
                    _, pos = _decode_long(view, pos)
                for _ in range(count):
                    v, pos = _decode_value(view, pos, ft["items"])
                    out.append(v)
            return out, pos
        return _decode_value(view, pos, ft["type"])
    if ft in ("int", "long"):
        return _decode_long(view, pos)
    if ft == "string":
        n, pos = _decode_long(view, pos)
        return str(view[pos : pos + n], "utf-8"), pos + n
    if ft == "bytes":
        n, pos = _decode_long(view, pos)
        return bytes(view[pos : pos + n]), pos + n
    if ft == "double":
        return struct.unpack_from("<d", view, pos)[0], pos + 8
    if ft == "float":
        return struct.unpack_from("<f", view, pos)[0], pos + 4
    if ft == "boolean":
        return view[pos] == 1, pos + 1
    raise TypeError(f"cannot decode avro type {ft!r}")


def _from_logical(n: int, lt: str):
    import datetime as dt

    if lt == "date":
        return dt.date(1970, 1, 1) + dt.timedelta(days=n)
    mult = 1_000 if lt.endswith("millis") else 1_000_000
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=n / mult)


# ---------------------------------------------------------------- container

def write_container(fh, avro_schema: dict, encoded_rows: list[bytes], codec: str = "deflate") -> None:
    """Write one Avro object-container file from pre-encoded row payloads."""
    header = bytearray()
    header += MAGIC
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    _encode_long(header, len(meta))
    for k, v in meta.items():
        _encode_bytes(header, k.encode())
        _encode_bytes(header, v)
    _encode_long(header, 0)
    header += _SYNC
    fh.write(bytes(header))
    if encoded_rows:
        payload = b"".join(encoded_rows)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # RFC1951 raw deflate per spec
        block = bytearray()
        _encode_long(block, len(encoded_rows))
        _encode_long(block, len(payload))
        block += payload
        block += _SYNC
        fh.write(bytes(block))


def _read_header(view: memoryview) -> tuple[dict, str, bytes, int]:
    """Parse just the container header → (schema, codec, sync, offset).

    The header is magic + metadata map + 16-byte sync — a few KB at
    most; callers that only need the schema must not pay for decoding
    the data blocks (``read_avro`` peeks ONE header to type the whole
    distributed scan)."""
    if bytes(view[:4]) != MAGIC:
        raise ValueError("not an avro object container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _decode_long(view, pos)
        if count == 0:
            break
        if count < 0:
            count = -count
            _, pos = _decode_long(view, pos)
        for _ in range(count):
            klen, pos = _decode_long(view, pos)
            k = str(view[pos : pos + klen], "utf-8")
            pos += klen
            vlen, pos = _decode_long(view, pos)
            meta[k] = bytes(view[pos : pos + vlen])
            pos += vlen
    sync = bytes(view[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def read_schema(data: bytes) -> dict:
    """Avro schema from a container PREFIX — no block decoding. ``data``
    need only cover the header (read the first ~64 KB of the file)."""
    schema, _codec, _sync, _pos = _read_header(memoryview(data))
    return schema


def read_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one container file → (avro schema, decoded row tuples)."""
    view = memoryview(data)
    schema, codec, sync, pos = _read_header(view)
    field_types = [f["type"] for f in schema["fields"]]
    rows: list[tuple] = []
    total = len(data)
    while pos < total:
        count, pos = _decode_long(view, pos)
        size, pos = _decode_long(view, pos)
        payload = view[pos : pos + size]
        pos += size
        if bytes(view[pos : pos + 16]) != sync:
            raise ValueError("avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = memoryview(zlib.decompress(bytes(payload), wbits=-15))
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        p = 0
        for _ in range(count):
            vals = []
            for ft in field_types:
                v, p = _decode_value(payload, p, ft)
                vals.append(v)
            rows.append(tuple(vals))
    return schema, rows


# ---------------------------------------------------------------- pandas bridge

def _encode_pandas_rows(pdf, schema: T.StructType, avro_schema: dict) -> list[bytes]:
    """Encode a pandas batch (Arrow-typed, as mapInPandas delivers) row by row."""
    import pandas as pd

    field_types = [f["type"] for f in avro_schema["fields"]]
    sfields = schema.fields
    cols = []
    for f in sfields:
        s = pdf[f.name]
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            s = s.map(lambda v: None if pd.isna(v) else int(pd.Timestamp(v).value // 1000))
        elif isinstance(f.dataType, T.DateType):
            epoch = pd.Timestamp("1970-01-01").date()
            s = s.map(lambda v: None if pd.isna(v) else (v - epoch).days)
        elif isinstance(f.dataType, T.ArrayType):
            s = s.map(lambda v: None if v is None else list(v))
        else:
            s = s.map(lambda v: None if pd.isna(v) else v)
        cols.append(list(s))
    out = []
    for vals in zip(*cols):
        buf = bytearray()
        for ft, v in zip(field_types, vals):
            _encode_value(buf, ft, v)
        out.append(bytes(buf))
    return out


def write_avro(
    df: DataFrame,
    path: str,
    partition_columns: list[str] | None = None,
    mode: str = "errorifexists",
    codec: str = "deflate",
    rows_per_file_hint: int | None = None,
) -> None:
    """Distributed Avro write: one container file per task (per partition value).

    ``repartition(*partition_columns)`` upstream aligns tasks with the
    directory layout exactly like the parquet path; each Arrow batch is
    grouped by partition value executor-side and appended to Hive-style
    ``col=value`` subdirectories. Local-filesystem paths only (the JVM
    datasource, when present, handles remote URIs).
    """
    import shutil

    # normalize + validate the mode UP FRONT — the JVM path accepts the
    # same aliases, and a typo'd mode must fail before any data lands,
    # not on the second run when the path happens to exist
    aliases = {"error": "errorifexists", "default": "errorifexists"}
    mode = aliases.get(mode, mode)
    valid = {"errorifexists", "overwrite", "append", "ignore", "overwrite_partitions"}
    if mode not in valid:
        raise ValueError(f"unsupported mode {mode!r}; one of {sorted(valid)}")
    if mode == "overwrite_partitions" and not partition_columns:
        raise ValueError("overwrite_partitions mode requires partition_columns")

    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError("pure-python avro fallback writes local paths only")
    path = path.removeprefix("file://")
    if os.path.exists(path):
        if mode == "errorifexists":
            raise FileExistsError(path)
        if mode == "ignore":
            return
        if mode == "overwrite":
            shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    if mode == "overwrite_partitions":
        # a crashed previous run may have left a committed-but-unfinished
        # overwrite (manifest present) or uncommitted staged files (no
        # manifest): roll the former FORWARD, sweep the latter, so this
        # run starts from a clean committed state (ADVICE r6)
        if os.path.exists(os.path.join(path, _OVERWRITE_MANIFEST)):
            _finish_partition_overwrite(path)
        else:
            for dirpath, _d, filenames in os.walk(path):
                for f in filenames:
                    if f.endswith(".avro.staged"):
                        os.remove(os.path.join(dirpath, f))

    schema = df.schema
    avro_schema = spark_schema_to_avro(schema)
    pcols = list(partition_columns or [])
    data_fields = [f for f in schema.fields]  # partition cols stay in-file (see module doc)
    # dynamic overwrite stages under a suffix readers never match
    # (read_avro filters *.avro) so a crash mid-write leaves old data
    # fully intact and the staged files invisible
    file_suffix = ".avro.staged" if mode == "overwrite_partitions" else ".avro"

    def _write_batches(batches):
        import pandas as pd

        from pyspark import TaskContext
        from pyspark_ingestion_spark.sources.writers import partition_path_segment

        tid = TaskContext.get().partitionId() if TaskContext.get() else 0
        relpaths: list[str] = []
        for pdf in batches:
            if not len(pdf):
                continue
            if pcols:
                groups = pdf.groupby(pcols, dropna=False, sort=False)
            else:
                groups = [((), pdf)]
            for key, g in groups:
                if pcols:
                    key = key if isinstance(key, tuple) else (key,)
                    # Hive percent-escaping via the shared helper — a raw
                    # str(v) layout would diverge from JVM-written lakes
                    # on ':' '/' '#' '%' values, so a dynamic overwrite
                    # over one would miss the old directory and leave old
                    # and new rows side by side (the bug class
                    # cdc._partition_path_segment fixed)
                    rel = os.path.join(
                        *[partition_path_segment(c, None if pd.isna(v) else v)
                          for c, v in zip(pcols, key)]
                    )
                else:
                    rel = ""
                sub = os.path.join(path, rel) if rel else path
                os.makedirs(sub, exist_ok=True)
                fname = f"part-{tid:05d}-{uuid.uuid4().hex}{file_suffix}"
                encoded = _encode_pandas_rows(g.reset_index(drop=True), schema, avro_schema)
                with open(os.path.join(sub, fname), "wb") as fh:
                    write_container(fh, avro_schema, encoded, codec=codec)
                relpaths.append(os.path.join(rel, fname) if rel else fname)
        yield pd.DataFrame({"relpath": pd.Series(relpaths, dtype="object")})

    out = df
    if pcols:
        out = out.repartition(*pcols)
    # the tiny manifest (one written file path per task×partition-value)
    # is the job's only driver-side result
    written = [
        r["relpath"]
        for r in out.mapInPandas(_write_batches, schema="relpath string").collect()
    ]

    if mode == "overwrite_partitions":
        # DYNAMIC overwrite semantics: replace exactly the partitions
        # rewritten, leave every other partition untouched. Touched
        # partitions come from the manifest of files ACTUALLY written —
        # collecting df.select(pcols).distinct() up front and deleting
        # before the write would recompute df (a non-deterministic df
        # could delete partitions never rewritten), and a whole-path
        # rmtree would destroy untouched partitions. New files carry
        # uuid names so stale files are exactly the pre-existing ones
        # in the touched directories.
        #
        # Durability is the compaction protocol's (ADVICE r6): the
        # distributed write landed STAGED (.avro.staged, invisible to
        # readers), so the commit point is the manifest's tmp→rename
        # below. Crash before it: old data intact, staged files swept
        # by the next run. Crash after it: the next run (or a direct
        # _finish_partition_overwrite) rolls FORWARD — renames staged
        # to live, deletes exactly the stale files in the touched dirs.
        man = os.path.join(path, _OVERWRITE_MANIFEST)
        tmp = man + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"staged": sorted(written)}, fh)
        os.replace(tmp, man)  # commit marker
        _finish_partition_overwrite(path)


#: commit marker of an in-flight overwrite_partitions write — underscore
#: prefix so Spark file indexes skip it; no .avro suffix so read_avro does
_OVERWRITE_MANIFEST = "_overwrite_manifest.json"


def _finish_partition_overwrite(path: str) -> None:
    """Roll a committed dynamic-overwrite forward to completion: rename
    every staged file to its live ``.avro`` name, then delete the stale
    pre-existing ``.avro`` files in the touched directories, then drop
    the manifest. Every step is idempotent (rename skipped when already
    done, deletes keyed off the manifest's name set), so a crash at any
    point is finished by re-running."""
    man = os.path.join(path, _OVERWRITE_MANIFEST)
    with open(man) as fh:
        staged = json.load(fh)["staged"]
    final_names = {os.path.basename(p).removesuffix(".staged") for p in staged}
    touched_dirs = {os.path.dirname(p) for p in staged}
    for rel in staged:
        src = os.path.join(path, rel)
        if os.path.exists(src):
            os.replace(src, os.path.join(path, rel.removesuffix(".staged")))
    for rel in touched_dirs:
        sub = os.path.join(path, rel) if rel else path
        for f in os.listdir(sub):
            if f.endswith(".avro") and f not in final_names:
                os.remove(os.path.join(sub, f))
    os.remove(man)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: binaryFile scan + executor-side decode.

    Schema comes from the first file's header (driver-side peek of one
    small file); every executor then decodes whole containers out of the
    ``binaryFile`` content column inside mapInPandas.
    """
    files = []
    root = path.removeprefix("file://")
    for dirpath, _dirnames, filenames in os.walk(root):
        files += [os.path.join(dirpath, f) for f in filenames if f.endswith(".avro")]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    # header-only peek: the schema lives in the first few KB; decoding
    # the whole first container on the driver would load an entire
    # partition's rows for nothing (one file per partition value is the
    # normal layout here)
    with open(sorted(files)[0], "rb") as fh:
        head = fh.read(64 * 1024)
    avro_schema = read_schema(head)
    spark_schema = avro_schema_to_spark(avro_schema)

    def _decode(batches):
        import pandas as pd

        names = [f.name for f in spark_schema.fields]
        for pdf in batches:
            frames = []
            for blob in pdf["content"]:
                _, rows = read_container(bytes(blob))
                frames.append(pd.DataFrame(rows, columns=names))
            yield pd.concat(frames) if frames else pd.DataFrame(columns=names)

    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return binf.mapInPandas(_decode, schema=spark_schema)
