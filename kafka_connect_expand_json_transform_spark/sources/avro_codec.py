"""Pure-stdlib Avro Object Container File codec — [EXT] the jar-free read
AND write path behind ``sources/avro.py``'s capability gate.

The reference ecosystem speaks Avro on the wire (Kafka Connect converters
sit exactly where ExpandJson runs — readme.md:16); Spark's own Avro support
is an EXTERNAL jar absent from this container.  Rather than leave the
format untestable, this module implements the public Apache Avro 1.11
specification ("Binary encoding" + "Object Container Files" sections)
directly on the stdlib: zig-zag varints, IEEE little-endian floats, length-
prefixed bytes/strings, records/unions/arrays/maps/enums/fixed, and the
``null``/``deflate`` (raw zlib) codecs.  Logical types round-trip the way
spark-avro maps them: ``decimal`` (bytes, unscaled big-endian two's
complement), ``date`` (int days), ``timestamp-micros`` (long).

Scale notes: this codec is the PER-TASK inner loop of the ``avro_py``
DataSource (one task per container file; a finer split on sync markers is
possible but per-file parallelism is the standard first answer — at 100 TB
the fleet of files, not the file, carries the parallelism).  Encoding and
decoding are streaming — blocks are materialized one at a time, never the
whole file.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
import zlib
from decimal import Decimal

MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# --- binary encoding (Avro spec: zig-zag varint ints, LE IEEE floats) -------


def _zigzag_encode(n: int) -> int:
    return (n << 1) if n >= 0 else ((-n << 1) - 1)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(buf: bytearray, n: int) -> None:
    u = _zigzag_encode(n)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


class Decoder:
    def __init__(self, data: bytes | memoryview):
        self.data = memoryview(data)
        self.pos = 0

    def read_long(self) -> int:
        u = shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return _zigzag_decode(u)
            shift += 7

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = bytes(self.data[self.pos : self.pos + n])
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        out = bytes(self.data[self.pos : self.pos + n])
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


# --- schema-driven encode / decode ------------------------------------------


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode_value(buf: bytearray, schema, value, named: dict) -> None:
    """Encode one value per the (parsed-JSON) schema.  ``named`` resolves
    record/enum/fixed name references (spec: a name is a valid schema)."""
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    t = _schema_type(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, value, named):
                write_long(buf, i)
                encode_value(buf, branch, value, named)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if value else 0)
    elif t == "int" or t == "long":
        if isinstance(schema, dict) and schema.get("logicalType") == "date":
            value = (value - _dt.date(1970, 1, 1)).days
        elif isinstance(schema, dict) and schema.get("logicalType") == "timestamp-micros":
            value = _ts_to_micros(value)
        write_long(buf, int(value))
    elif t == "float":
        buf += struct.pack("<f", float(value))
    elif t == "double":
        buf += struct.pack("<d", float(value))
    elif t == "bytes":
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            value = _decimal_to_bytes(value, schema["scale"])
        write_long(buf, len(value))
        buf += value
    elif t == "string":
        raw = value.encode("utf-8")
        write_long(buf, len(raw))
        buf += raw
    elif t == "record":
        for f in schema["fields"]:
            encode_value(buf, f["type"], value[f["name"]], named)
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                encode_value(buf, schema["items"], it, named)
        write_long(buf, 0)
    elif t == "map":
        entries = list(value.items())
        if entries:
            write_long(buf, len(entries))
            for k, v in entries:
                raw = k.encode("utf-8")
                write_long(buf, len(raw))
                buf += raw
                encode_value(buf, schema["values"], v, named)
        write_long(buf, 0)
    elif t == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif t == "fixed":
        buf += value
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(branch, value, named) -> bool:
    if isinstance(branch, str) and branch in named:
        branch = named[branch]
    t = _schema_type(branch)
    if t == "null":
        return value is None
    return value is not None


def decode_value(dec: Decoder, schema, named: dict):
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    t = _schema_type(schema)
    if t == "union":
        return decode_value(dec, schema[dec.read_long()], named)
    if t == "null":
        return None
    if t == "boolean":
        return dec.read_fixed(1) == b"\x01"
    if t in ("int", "long"):
        n = dec.read_long()
        if isinstance(schema, dict):
            lt = schema.get("logicalType")
            if lt == "date":
                return _dt.date(1970, 1, 1) + _dt.timedelta(days=n)
            if lt == "timestamp-micros":
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=n)
            if lt == "timestamp-millis":
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=n)
        return n
    if t == "float":
        return struct.unpack("<f", dec.read_fixed(4))[0]
    if t == "double":
        return struct.unpack("<d", dec.read_fixed(8))[0]
    if t == "bytes":
        raw = dec.read_bytes()
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            return _bytes_to_decimal(raw, schema["scale"])
        return raw
    if t == "string":
        return dec.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: decode_value(dec, f["type"], named) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:  # block-size variant: size precedes the items
                dec.read_long()
                n = -n
            for _ in range(n):
                out.append(decode_value(dec, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:
                dec.read_long()
                n = -n
            for _ in range(n):
                k = dec.read_bytes().decode("utf-8")
                out[k] = decode_value(dec, schema["values"], named)
    if t == "enum":
        return schema["symbols"][dec.read_long()]
    if t == "fixed":
        return dec.read_fixed(schema["size"])
    raise ValueError(f"unsupported Avro type {t!r}")


def collect_named(schema, named: dict) -> None:
    """Index record/enum/fixed definitions by (full)name for reference use."""
    if isinstance(schema, list):
        for b in schema:
            collect_named(b, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed") and "name" in schema:
        ns = schema.get("namespace")
        named[schema["name"]] = schema
        if ns:
            named[f"{ns}.{schema['name']}"] = schema
    if t == "record":
        for f in schema.get("fields", ()):
            collect_named(f["type"], named)
    elif t == "array":
        collect_named(schema.get("items"), named)
    elif t == "map":
        collect_named(schema.get("values"), named)


# --- logical type helpers ----------------------------------------------------


def _decimal_to_bytes(value, scale: int) -> bytes:
    unscaled = int(Decimal(value).scaleb(scale).to_integral_value())
    length = max(1, (unscaled.bit_length() + 8) // 8)  # +1 sign bit headroom
    return unscaled.to_bytes(length, "big", signed=True)


def _bytes_to_decimal(raw: bytes, scale: int) -> Decimal:
    return Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(-scale)


def _ts_to_micros(value) -> int:
    if isinstance(value, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
        return int((value - epoch) / _dt.timedelta(microseconds=1))
    return int(value)


# --- Object Container Files ---------------------------------------------------


def write_container(
    sink: str | io.BufferedIOBase,
    schema: dict,
    rows,
    codec: str = "deflate",
    sync: bytes | None = None,
    block_rows: int = 4096,
) -> int:
    """Write an Avro Object Container File; returns the row count.  ``sync``
    defaults to a deterministic marker derived from the schema so identical
    inputs produce identical bytes (the repo-wide reproducibility posture —
    randomness never enters a data path)."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r} (null|deflate)")
    schema_json = json.dumps(schema, separators=(",", ":"))
    if sync is None:
        sync = hashlib.md5(schema_json.encode()).digest()
    named: dict = {}
    collect_named(schema, named)

    header = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    write_long(header, len(meta))
    for k, v in sorted(meta.items()):
        raw = k.encode()
        write_long(header, len(raw))
        header += raw
        write_long(header, len(v))
        header += v
    write_long(header, 0)
    header += sync

    own = isinstance(sink, str)
    f = open(sink, "wb") if own else sink
    total = 0
    try:
        f.write(bytes(header))
        block = bytearray()
        n_in_block = 0

        def flush():
            nonlocal block, n_in_block, total
            if not n_in_block:
                return
            data = bytes(block)
            if codec == "deflate":
                data = zlib.compress(data)[2:-4]  # raw deflate per the spec
            head = bytearray()
            write_long(head, n_in_block)
            write_long(head, len(data))
            f.write(bytes(head))
            f.write(data)
            f.write(sync)
            total += n_in_block
            block = bytearray()
            n_in_block = 0

        for row in rows:
            encode_value(block, schema, row, named)
            n_in_block += 1
            if n_in_block >= block_rows:
                flush()
        flush()
    finally:
        if own:
            f.close()
    return total


def read_header(f) -> tuple[dict, str, bytes]:
    """Read the container header; returns (schema, codec, sync_marker)."""
    if f.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    # metadata is usually tiny but the embedded schema can be arbitrarily
    # large — decode from a buffer grown on demand (IndexError = ran off the
    # end of the current probe, not a corrupt file)
    buf = f.read(1 << 16)
    while True:
        dec = Decoder(buf)
        meta = {}
        try:
            while True:
                n = dec.read_long()
                if n == 0:
                    break
                if n < 0:
                    dec.read_long()
                    n = -n
                for _ in range(n):
                    k = dec.read_bytes().decode()
                    meta[k] = dec.read_bytes()
            sync = dec.read_fixed(16)
            if len(sync) == 16:
                break
        except IndexError:
            pass
        more = f.read(len(buf))
        if not more:
            raise ValueError("truncated Avro header")
        buf += more
    f.seek(dec.pos - len(buf), io.SEEK_CUR)  # rewind unread tail
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    return schema, codec, sync


def iter_blocks(f, schema, codec: str, sync: bytes, named: dict, stop_before=None):
    """Yield decoded rows from consecutive blocks at the file's current
    position.  ``stop_before``: stop when a block STARTS at or past this
    offset (the Avro split rule — the caller owns the +16 sync-overlap
    arithmetic)."""
    while True:
        block_start = f.tell()
        if stop_before is not None and block_start >= stop_before:
            return
        first = f.read(1)
        if not first:
            return
        # re-join the first byte with the varint stream
        head = bytearray(first)
        while head[-1] & 0x80:
            head += f.read(1)
        n_rows = Decoder(bytes(head)).read_long()
        size_head = bytearray(f.read(1))
        while size_head[-1] & 0x80:
            size_head += f.read(1)
        n_bytes = Decoder(bytes(size_head)).read_long()
        data = f.read(n_bytes)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        marker = f.read(16)
        if marker != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        dec = Decoder(data)
        for _ in range(n_rows):
            yield decode_value(dec, schema, named)


def seek_to_sync(f, sync: bytes, start: int) -> int | None:
    """Position ``f`` just after the first sync marker found at offset >=
    ``start``; returns that block-start offset or None if no marker follows.
    A marker STRADDLING ``start`` is deliberately not matched — the split
    arithmetic (claim blocks starting < end + 16) assigns its block to the
    previous split, so contiguous splits neither lose nor duplicate rows."""
    f.seek(start)
    overlap = len(sync) - 1
    chunk_size = 1 << 20
    base = start
    prev_tail = b""
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            return None
        buf = prev_tail + chunk
        hit = buf.find(sync)
        if hit != -1:
            block_start = base - len(prev_tail) + hit + len(sync)
            f.seek(block_start)
            return block_start
        prev_tail = buf[-overlap:]
        base += len(chunk)


def read_container(source: str | io.BufferedIOBase):
    """Yield decoded rows (dicts for records) from a container file —
    block-streaming, never the whole file in memory."""
    own = isinstance(source, str)
    f = open(source, "rb") if own else source
    try:
        schema, codec, sync = read_header(f)
        named: dict = {}
        collect_named(schema, named)
        yield from iter_blocks(f, schema, codec, sync, named)
    finally:
        if own:
            f.close()


def read_container_split(path: str, start: int, end: int):
    """Yield rows of the split [start, end) of a container file, per the
    Avro split contract: position at the first block boundary at or after
    ``start`` (the header for split 0, else the next sync marker) and claim
    every block that starts before ``end + 16`` — contiguous splits
    covering [0, filesize) together read every row exactly once."""
    with open(path, "rb") as f:
        schema, codec, sync = read_header(f)
        named: dict = {}
        collect_named(schema, named)
        header_end = f.tell()
        if start > header_end:
            if seek_to_sync(f, sync, start) is None:
                return
        yield from iter_blocks(f, schema, codec, sync, named, stop_before=end + 16)
